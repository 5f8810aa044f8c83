"""The fused Pallas chunk matvec must reproduce the XLA parts path
(parts_fn + mask + Z^T(Zv) contraction) exactly up to fp32 roundoff.

Runs in interpret mode on CPU; the kernel math (projection, poly sincos,
intercept column, row mask, both contractions) is identical to what runs
compiled on the TPU.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from xgpr_tpu.ops.pallas.ztzv_pallas import (ztzv_parts_pallas,
                                             ztzv_shapes_ok)
from xgpr_tpu.ops.sorf import rbf_feature_parts_dense


def _oracle(x, m, proj, sigma, vc, vs, intercept):
    c, s = rbf_feature_parts_dense(jnp.asarray((x * sigma), jnp.float32),
                                   jnp.asarray(proj), intercept)
    c = np.asarray(c, np.float64) * m[:, None]
    s = np.asarray(s, np.float64) * m[:, None]
    zv = c @ vc + s @ vs
    return c.T @ zv, s.T @ zv


@pytest.mark.parametrize("intercept", [False, True])
@pytest.mark.parametrize("n,d,f,k", [
    (128, 84, 256, 5), (64, 128, 128, 1), (96, 10, 384, 8),
    # Odd shapes that previously fell back: rows not a tile multiple
    # (the default chunk_size 2000 % 32 != 0), ragged frequency counts
    # (num_rffs not a multiple of 256), and both at once -- the oracle
    # sweep's non-power-2 territory (test_sorf_ops.py:31-34).
    (2000, 84, 256, 2), (128, 84, 200, 3), (231, 56, 500, 2),
    (10, 50, 32, 1),
])
def test_ztzv_pallas_matches_parts_path(intercept, n, d, f, k):
    rng = np.random.default_rng(hash((n, d, f, k)) % 2 ** 31)
    x = rng.standard_normal((n, d)).astype(np.float32)
    m = (rng.random(n) > 0.25).astype(np.float32)
    proj = (rng.standard_normal((d, f)) * 0.3).astype(np.float32)
    sigma = np.float32(0.7)
    vc = rng.standard_normal((f, k)).astype(np.float32)
    vs = rng.standard_normal((f, k)).astype(np.float32)

    assert ztzv_shapes_ok(n, d, f, jnp.float32)
    oc, os_ = ztzv_parts_pallas(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(proj), sigma,
        jnp.asarray(vc), jnp.asarray(vs), intercept, f, interpret=True)
    oc_ref, os_ref = _oracle(x, m, proj, sigma, vc, vs, intercept)
    tol = 3e-5 * max(1.0, np.abs(oc_ref).max())
    assert np.abs(np.asarray(oc) - oc_ref).max() < tol
    assert np.abs(np.asarray(os_) - os_ref).max() < tol


def test_ztzv_shape_gates():
    # fp64 or VMEM-busting shapes are rejected so the solver falls back
    # to the XLA path; ragged freq counts and arbitrary row counts are
    # handled by internal padding and accepted.
    assert not ztzv_shapes_ok(128, 84, 256, jnp.float64)
    assert not ztzv_shapes_ok(128, 84, 1 << 17, jnp.float32)  # VMEM
    assert ztzv_shapes_ok(128, 84, 200, jnp.float32)
    assert ztzv_shapes_ok(129, 84, 256, jnp.float32)
    assert ztzv_shapes_ok(2000, 84, 4096, jnp.float32)  # default chunk


def test_fallback_is_observable():
    """A hot-path fallback must warn once (and only once)."""
    import warnings
    from xgpr_tpu.utils import fallback

    fallback.reset()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fallback.note_fallback("ztzv matvec", "dtype=float64")
        fallback.note_fallback("ztzv matvec", "dtype=float64")
    msgs = [w for w in rec if issubclass(w.category, RuntimeWarning)]
    assert len(msgs) == 1
    assert "XLA path" in str(msgs[0].message)


def test_ztzv_pallas_fast_sincos_mode():
    """set_sincos_mode("fast") retraces the kernel onto the full-period
    polynomial; the result must stay within the fast pair's 4.1e-5
    elementwise error propagated through the contractions."""
    from xgpr_tpu import config
    rng = np.random.default_rng(11)
    n, d, f, k = 128, 84, 256, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    m = (rng.random(n) > 0.25).astype(np.float32)
    proj = (rng.standard_normal((d, f)) * 0.3).astype(np.float32)
    vc = rng.standard_normal((f, k)).astype(np.float32)
    vs = rng.standard_normal((f, k)).astype(np.float32)
    config.set_sincos_mode("fast")
    try:
        oc, os_ = ztzv_parts_pallas(
            jnp.asarray(x), jnp.asarray(m), jnp.asarray(proj),
            np.float32(0.7), jnp.asarray(vc), jnp.asarray(vs), True, f,
            interpret=True)
    finally:
        config.set_sincos_mode("auto")
    oc_ref, os_ref = _oracle(x, m, proj, np.float32(0.7), vc, vs, True)
    # elementwise 4.1e-5 on each of ~n feature values -> scaled gate
    tol = 4.1e-5 * n * max(1.0, np.abs(vc).max() + np.abs(vs).max())
    assert np.abs(np.asarray(oc) - oc_ref).max() < tol
    assert np.abs(np.asarray(os_) - os_ref).max() < tol


def test_ztzv_pallas_split_rows_matches_oracle(monkeypatch):
    """The split-row-tile variant (independent MXU/VPU half-chains for
    the VLIW scheduler) must be numerically identical to the oracle up
    to fp32 roundoff."""
    from xgpr_tpu.ops.pallas import ztzv_pallas as zp
    monkeypatch.setattr(zp, "_SPLIT", "rows")
    rng = np.random.default_rng(13)
    n, d, f, k = 256, 84, 256, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    m = (rng.random(n) > 0.25).astype(np.float32)
    proj = (rng.standard_normal((d, f)) * 0.3).astype(np.float32)
    vc = rng.standard_normal((f, k)).astype(np.float32)
    vs = rng.standard_normal((f, k)).astype(np.float32)
    oc, os_ = zp.ztzv_parts_pallas(
        jnp.asarray(x), jnp.asarray(m), jnp.asarray(proj),
        np.float32(0.7), jnp.asarray(vc), jnp.asarray(vs), True, f,
        interpret=True)
    oc_ref, os_ref = _oracle(x, m, proj, np.float32(0.7), vc, vs, True)
    tol = 3e-5 * max(1.0, np.abs(oc_ref).max())
    assert np.abs(np.asarray(oc) - oc_ref).max() < tol
    assert np.abs(np.asarray(os_) - os_ref).max() < tol


def test_ztzv_pallas_split_freqs_matches_oracle(monkeypatch):
    """The split-frequency variant must also be numerically identical to
    the oracle up to fp32 roundoff (incl. the intercept column landing
    only in the first half)."""
    from xgpr_tpu.ops.pallas import ztzv_pallas as zp
    monkeypatch.setattr(zp, "_SPLIT", "freqs")
    rng = np.random.default_rng(14)
    n, d, f, k = 128, 84, 256, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    m = (rng.random(n) > 0.25).astype(np.float32)
    proj = (rng.standard_normal((d, f)) * 0.3).astype(np.float32)
    vc = rng.standard_normal((f, k)).astype(np.float32)
    vs = rng.standard_normal((f, k)).astype(np.float32)
    for intercept in (True, False):
        oc, os_ = zp.ztzv_parts_pallas(
            jnp.asarray(x), jnp.asarray(m), jnp.asarray(proj),
            np.float32(0.7), jnp.asarray(vc), jnp.asarray(vs),
            intercept, f, interpret=True)
        oc_ref, os_ref = _oracle(x, m, proj, np.float32(0.7), vc, vs,
                                 intercept)
        tol = 3e-5 * max(1.0, np.abs(oc_ref).max())
        assert np.abs(np.asarray(oc) - oc_ref).max() < tol
        assert np.abs(np.asarray(os_) - os_ref).max() < tol
