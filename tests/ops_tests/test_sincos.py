"""Oracle test for the fast polynomial sincos (ops/sincos.py).

The feature-map contract is the reference's own fp32 tolerance
(rtol/atol 1e-3, tests/fht_operations_tests/test_rbf_rfgen.py:104); the
polynomial must stay ~4 orders of magnitude inside it over the argument
range feature maps actually produce.
"""
import numpy as np
import jax.numpy as jnp

from xgpr_tpu.ops.sincos import sincos, _poly_sincos
from xgpr_tpu import config


def test_poly_sincos_accuracy_fp32():
    rng = np.random.default_rng(0)
    # Feature-map args: sigma-scaled projections, O(1)..O(100); also probe
    # near quadrant boundaries and larger magnitudes.
    x = np.concatenate([
        rng.uniform(-3.0, 3.0, 20000),
        rng.uniform(-120.0, 120.0, 20000),
        rng.uniform(-2000.0, 2000.0, 10000),
        np.pi / 2 * np.arange(-64, 64) + rng.normal(0, 1e-4, 128),
        np.array([0.0, np.pi, -np.pi, np.pi / 2, -np.pi / 2]),
    ]).astype(np.float32)
    cosv, sinv = _poly_sincos(jnp.asarray(x))
    x64 = x.astype(np.float64)
    assert np.max(np.abs(np.asarray(cosv) - np.cos(x64))) < 5e-7
    assert np.max(np.abs(np.asarray(sinv) - np.sin(x64))) < 5e-7


def test_sincos_dispatch():
    x32 = jnp.asarray(np.linspace(-5, 5, 1024), dtype=jnp.float32)
    x64 = jnp.asarray(np.linspace(-5, 5, 1024), dtype=jnp.float64)
    # auto: fp64 goes through the exact builtin, bit-for-bit.
    c64, s64 = sincos(x64)
    assert np.array_equal(np.asarray(c64), np.asarray(jnp.cos(x64)))
    assert np.array_equal(np.asarray(s64), np.asarray(jnp.sin(x64)))
    # auto: fp32 takes the full-period polynomial (modulo fusion-level
    # ULP noise from the guard's lax.cond branch compilation).
    from xgpr_tpu.ops.sincos import _hi_sincos
    c32, s32 = sincos(x32)
    cp, sp = _hi_sincos(x32)
    assert np.allclose(np.asarray(c32), np.asarray(cp), atol=1e-6)
    assert np.allclose(np.asarray(s32), np.asarray(sp), atol=1e-6)
    # exact mode forces the builtin even in fp32.
    config.set_sincos_mode("exact")
    try:
        ce, se = sincos(x32)
        assert np.array_equal(np.asarray(ce), np.asarray(jnp.cos(x32)))
    finally:
        config.set_sincos_mode("auto")


def test_sincos_auto_guard_large_args():
    """auto mode must not silently degrade beyond the Cody-Waite range: a
    single huge argument (large sigma x un-standardised data) switches the
    call to the exact builtin."""
    x = np.linspace(-5, 5, 512).astype(np.float32)
    x[7] = 1.5e6  # far outside the polynomial's validity
    xj = jnp.asarray(x)
    c, s = sincos(xj)
    x64 = x.astype(np.float64)
    # The poly path would be wildly wrong at x[7]; the guard keeps every
    # element at builtin accuracy.
    assert np.max(np.abs(np.asarray(c) - np.cos(x64))) < 1e-4
    assert np.max(np.abs(np.asarray(s) - np.sin(x64))) < 1e-4


def test_poly_sincos_pythagorean_and_shape():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-50, 50, (64, 128)), dtype=jnp.float32)
    c, s = _poly_sincos(x)
    assert c.shape == x.shape and s.shape == x.shape
    assert np.max(np.abs(np.asarray(c) ** 2 + np.asarray(s) ** 2 - 1.0)) \
        < 1e-6


def test_hi_sincos_accuracy_fp32():
    """The default ("auto"/"hi") full-period deg-13/14 pair: fp32 Horner
    rounding floors the error at ~6e-7 -- a few ULP of a unit-magnitude
    result, >1000x inside the 1e-3 feature contract."""
    from xgpr_tpu.ops.sincos import _hi_sincos
    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.uniform(-3.0, 3.0, 20000),
        rng.uniform(-120.0, 120.0, 20000),
        rng.uniform(-8000.0, 8000.0, 20000),
        np.pi * np.arange(-64, 64) + rng.normal(0, 1e-4, 128),
        np.array([0.0, np.pi, -np.pi, np.pi / 2, -np.pi / 2]),
    ]).astype(np.float32)
    cosv, sinv = _hi_sincos(jnp.asarray(x))
    x64 = x.astype(np.float64)
    assert np.max(np.abs(np.asarray(cosv) - np.cos(x64))) < 1e-6
    assert np.max(np.abs(np.asarray(sinv) - np.sin(x64))) < 1e-6
    # folded multiplier form
    w = jnp.float32(0.25)
    cw, sw = _hi_sincos(jnp.asarray(x), w)
    assert np.allclose(np.asarray(cw), np.asarray(cosv) * 0.25, atol=1e-6)
    assert np.allclose(np.asarray(sw), np.asarray(sinv) * 0.25, atol=1e-6)


def test_fast_sincos_accuracy_fp32():
    """The "fast" full-period pair must stay ~25x inside the 1e-3 fp32
    feature contract across its whole validity range (|x| < ~8192)."""
    from xgpr_tpu.ops.sincos import _fast_sincos
    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.uniform(-3.0, 3.0, 20000),
        rng.uniform(-120.0, 120.0, 20000),
        rng.uniform(-8000.0, 8000.0, 20000),
        np.pi * np.arange(-64, 64) + rng.normal(0, 1e-4, 128),
        np.array([0.0, np.pi, -np.pi, np.pi / 2, -np.pi / 2]),
    ]).astype(np.float32)
    cosv, sinv = _fast_sincos(jnp.asarray(x))
    x64 = x.astype(np.float64)
    assert np.max(np.abs(np.asarray(cosv) - np.cos(x64))) < 5e-5
    assert np.max(np.abs(np.asarray(sinv) - np.sin(x64))) < 1e-5


def test_fast_sincos_folded_multiplier():
    """pair(x, w) == pair(x) * w for the fused-multiplier form, for all
    three trace-time paths (fast / cephes / exact)."""
    from xgpr_tpu.ops.sincos import _fast_sincos, kernel_sincos
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-40, 40, (32, 64)), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(0.0, 2.0, (32, 1)), dtype=jnp.float32)
    c0, s0 = _fast_sincos(x)
    cw, sw = _fast_sincos(x, w)
    assert np.allclose(np.asarray(cw), np.asarray(c0 * w), atol=1e-6)
    assert np.allclose(np.asarray(sw), np.asarray(s0 * w), atol=1e-6)
    for mode in ("auto", "exact", "fast"):
        config.set_sincos_mode(mode)
        try:
            pair = kernel_sincos(jnp.float32)
            c0, s0 = pair(x)
            cw, sw = pair(x, w)
            assert np.allclose(np.asarray(cw), np.asarray(c0 * w),
                               atol=1e-6)
            assert np.allclose(np.asarray(sw), np.asarray(s0 * w),
                               atol=1e-6)
        finally:
            config.set_sincos_mode("auto")


def test_fast_mode_dispatch_and_guard():
    """set_sincos_mode("fast"): fp32 routes to the full-period pair with
    the same out-of-range guard as auto; fp64 stays exact."""
    from xgpr_tpu.ops.sincos import _fast_sincos
    x32 = jnp.asarray(np.linspace(-50, 50, 1024), dtype=jnp.float32)
    x64 = jnp.asarray(np.linspace(-50, 50, 1024), dtype=jnp.float64)
    config.set_sincos_mode("fast")
    try:
        c, s = sincos(x32)
        cf, sf = _fast_sincos(x32)
        assert np.allclose(np.asarray(c), np.asarray(cf), atol=1e-6)
        assert np.allclose(np.asarray(s), np.asarray(sf), atol=1e-6)
        c64, _ = sincos(x64)
        assert np.array_equal(np.asarray(c64), np.asarray(jnp.cos(x64)))
        # out-of-range arguments switch the whole call to the builtin
        big = x32.at[11].set(1.5e6)
        cb, sb = sincos(big)
        b64 = np.asarray(big, dtype=np.float64)
        assert np.max(np.abs(np.asarray(cb) - np.cos(b64))) < 1e-4
        assert np.max(np.abs(np.asarray(sb) - np.sin(b64))) < 1e-4
    finally:
        config.set_sincos_mode("auto")


def test_mode_switch_retraces_jitted_pallas_wrappers():
    """Regression: the module-level jit on the Pallas wrappers caches by
    shape, so the sincos mode must be a static ARGUMENT resolved outside
    the jit -- switching modes after a same-shape trace must change the
    result (previously the first-traced mode was silently frozen)."""
    from xgpr_tpu.ops.pallas.sorf_pallas import rbf_feature_map_pallas

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((128, 128)) * 2.0,
                    dtype=jnp.float32)
    proj = jnp.asarray(rng.standard_normal((128, 256)),
                       dtype=jnp.float32)
    config.set_sincos_mode("exact")
    try:
        exact = np.asarray(rbf_feature_map_pallas(x, proj, False, 256,
                                                  interpret=True))
        config.set_sincos_mode("fast")
        fast = np.asarray(rbf_feature_map_pallas(x, proj, False, 256,
                                                 interpret=True))
    finally:
        config.set_sincos_mode("auto")
    delta = np.abs(fast - exact).max()
    # The fast pair differs from exact by up to ~4.1e-5 elementwise;
    # identical output means the stale trace was reused.
    assert 0.0 < delta < 1e-3


def test_pallas_wrappers_auto_aliases_hi():
    """Regression: the Pallas wrappers normalise mode "auto" to a
    concrete evaluator name for a stable jit cache key -- that name must
    track the default ("hi", since the deg-13/14 promotion), not the
    legacy "poly" it used to be, or default-config users silently run
    the old evaluator."""
    from xgpr_tpu.ops.pallas.sorf_pallas import rbf_feature_map_pallas

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((128, 128)) * 2.0,
                    dtype=jnp.float32)
    proj = jnp.asarray(rng.standard_normal((128, 256)),
                       dtype=jnp.float32)
    outs = {}
    try:
        for mode in ("auto", "hi", "poly"):
            config.set_sincos_mode(mode)
            outs[mode] = np.asarray(rbf_feature_map_pallas(
                x, proj, False, 256, interpret=True))
    finally:
        config.set_sincos_mode("auto")
    assert np.array_equal(outs["auto"], outs["hi"])
    assert np.abs(outs["auto"] - outs["poly"]).max() > 0.0
