"""Config-mode switches must rebuild cached predict programs, and the
fused feature map's runtime argument guard must keep accuracy at extreme
sigma (the failure modes found in review).
"""
import sys
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset, config as xcfg
from utils.synthetic import tabular_data


def test_mode_switch_rebuilds_predict_programs():
    (trx, tr_y), _ = tabular_data(n_train=400)
    data = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=256, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(np.array([-1.79, -3.95]), data)
    model.fit(data, mode="exact")
    try:
        xcfg.set_feature_map_mode("xla")
        f_xla = model._scanned_predict_fn()
        p_xla = model._predict_step_fn()
        xcfg.set_feature_map_mode("pallas")
        f_pl = model._scanned_predict_fn()
        p_pl = model._predict_step_fn()
    finally:
        xcfg.set_feature_map_mode("auto")
    assert f_xla is not f_pl
    assert p_xla is not p_pl


def test_sincos_mode_switch_rebuilds_programs():
    """set_sincos_mode must invalidate the pure-fn caches (config epoch)
    so old compiled programs aren't silently reused."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((100, 16), 64, 123)
    kernel.set_hyperparams(np.array([-1.0, -1.0]))
    f1 = kernel.pure_feature_fn()
    try:
        xcfg.set_sincos_mode("exact")
        f2 = kernel.pure_feature_fn()
    finally:
        xcfg.set_sincos_mode("auto")
    f3 = kernel.pure_feature_fn()
    assert f1 is not f2
    assert f2 is not f3


def test_conv_fused_parts_arg_guard():
    """The conv fused parts path must also guard extreme sigma at
    runtime: forced-pallas equals forced-xla features."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    rng = np.random.default_rng(2)
    n, l, d, w = 16, 20, 8, 3
    x32 = jnp.asarray(rng.standard_normal((n, l, d)).astype(np.float32))
    slen = jnp.asarray(rng.integers(w, l + 1, n), jnp.int32)
    kernel = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n, l, d), 256, 123, kernel_spec_parms={"conv_width": w})
    kernel.set_hyperparams(np.array([0.0, 7.0]))  # extreme sigma
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype.kind == "f" else a,
        kernel.feature_params())
    try:
        xcfg.set_conv_mode("pallas")
        c_pl, s_pl = kernel.pure_feature_parts_fn()(params, x32, slen)
        xcfg.set_conv_mode("xla")
        c_x, s_x = kernel.pure_feature_parts_fn()(params, x32, slen)
    finally:
        xcfg.set_conv_mode("auto")
    assert np.abs(np.asarray(c_pl) - np.asarray(c_x)).max() < 1e-5
    assert np.abs(np.asarray(s_pl) - np.asarray(s_x)).max() < 1e-5


def test_fused_feature_map_arg_guard():
    """With the fused path forced, a sigma large enough to push the
    projection outside the polynomial's validity range must fall back to
    the exact evaluation at runtime -- features stay accurate."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    rng = np.random.default_rng(0)
    n, d = 64, 84
    x32 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n, d), 256, 123)
    # sigma = e^7: args ~ 1e4-1e5, beyond the Cody-Waite range.
    kernel.set_hyperparams(np.array([0.0, 7.0]))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype.kind == "f" else a,
        kernel.feature_params())
    try:
        xcfg.set_feature_map_mode("pallas")
        z_pl = np.asarray(kernel.pure_feature_fn()(params, x32, None))
        xcfg.set_feature_map_mode("xla")
        z_xla = np.asarray(kernel.pure_feature_fn()(params, x32, None))
    finally:
        xcfg.set_feature_map_mode("auto")
    # Both paths must agree: the guard routed the fused path to the same
    # exact evaluation the XLA path's sincos guard selects.
    assert np.abs(z_pl - z_xla).max() < 1e-5


def test_poly_range_hint_traces_single_branch():
    """poly_range_ok must pass benign standardised data and reject
    extreme sigma; the hinted pure fn (single-branch trace) must produce
    the same features as the guarded one for in-range inputs."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    rng = np.random.default_rng(1)
    n, d = 64, 84
    x32 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n, d), 256, 123)
    kernel.set_hyperparams(np.array([0.0, -1.0]))
    params = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype.kind == "f" else a,
        kernel.feature_params())
    try:
        xcfg.set_feature_map_mode("pallas")
        assert kernel.poly_range_ok(np.asarray(x32))
        z_guard = np.asarray(kernel.pure_feature_fn()(params, x32, None))
        hinted = kernel.pure_feature_fn(assume_in_range=True)
        assert hinted is not kernel.pure_feature_fn()
        z_hint = np.asarray(hinted(params, x32, None))
        # Extreme sigma must fail the host-side range check.
        kernel.set_hyperparams(np.array([0.0, 7.0]))
        assert not kernel.poly_range_ok(np.asarray(x32))
    finally:
        xcfg.set_feature_map_mode("auto")
    np.testing.assert_allclose(z_hint, z_guard, rtol=1e-6, atol=1e-6)


def test_predict_uses_hinted_program_for_benign_input():
    (trx, tr_y), (tex, _) = tabular_data(n_train=400)
    data = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=256, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(np.array([-1.79, -1.0]), data)
    model.fit(data, mode="exact", suppress_var=True)
    try:
        xcfg.set_feature_map_mode("pallas")
        p_hint = model.predict(tex)
        xcfg.set_feature_map_mode("xla")
        p_xla = model.predict(tex)
    finally:
        xcfg.set_feature_map_mode("auto")
    np.testing.assert_allclose(p_hint, p_xla, rtol=1e-4, atol=1e-5)
