"""The fused Pallas dense RBF feature map (projection + poly sincos +
block [cos|sin] layout in one kernel) must reproduce the XLA dense path
to fp32 roundoff, including through the kernel object's pure_feature_fn
when the mode is forced to "pallas" (interpret mode on CPU).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xgpr_tpu.ops.pallas.sorf_pallas import (rbf_feature_map_pallas,
                                             pallas_feature_shapes_ok,
                                             pad_operands)
from xgpr_tpu.ops.sorf import rbf_feature_map_dense
from xgpr_tpu import config as xcfg


@pytest.mark.parametrize("intercept", [False, True])
@pytest.mark.parametrize("n,d,padded,f", [
    (128, 84, 128, 256),    # multi-block (256 = 2 x 128)
    (100, 84, 128, 128),    # rows not a tile multiple
    (64, 200, 256, 256),    # d > 128, padded 256
    (32, 84, 128, 64),      # F < padded (single narrow block)
])
def test_fused_feature_map_matches_dense(intercept, n, d, padded, f):
    rng = np.random.default_rng(hash((n, d, f)) % 2 ** 31)
    x = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    proj = (rng.standard_normal((d, f)) * 0.3).astype(np.float32)
    dp = ((d + 127) // 128) * 128
    assert pallas_feature_shapes_ok(n, dp, f, padded, jnp.float32)
    xp, pp = pad_operands(jnp.asarray(x), jnp.asarray(proj))
    got = rbf_feature_map_pallas(xp, pp, intercept, padded,
                                 interpret=True)
    want = rbf_feature_map_dense(jnp.asarray(x), jnp.asarray(proj),
                                 intercept, padded)
    assert got.shape == want.shape
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 3e-6


def test_kernel_pure_fn_forced_pallas_matches_xla():
    """Kernel-level: RBF pure_feature_fn with feature-map mode forced to
    pallas equals the XLA path (both fp32)."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    rng = np.random.default_rng(11)
    n, d = 96, 84
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n, d), 256, 123)
    kernel.set_hyperparams(np.log(np.array([0.1, 0.4])))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype.kind == "f" else a,
        kernel.feature_params())
    try:
        xcfg.set_feature_map_mode("xla")
        z_xla = np.asarray(kernel.pure_feature_fn()(params, x, None))
        xcfg.set_feature_map_mode("pallas")
        z_pl = np.asarray(kernel.pure_feature_fn()(params, x, None))
    finally:
        xcfg.set_feature_map_mode("auto")
    assert np.abs(z_xla - z_pl).max() < 3e-6
