"""Shifted-factorization rescue for the exact fit (fitting/exact.py).

A singular design matrix with a lambda below roundoff must solve via the
growing-ridge retry instead of raising -- the fp32 analogue of the
reference's always-fp64 LAPACK contract.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from xgpr_tpu.fitting.exact import rescue_weight_calc, direct_weight_calc


def _singular_system(m=64):
    rng = np.random.default_rng(0)
    b = rng.standard_normal((m, m // 4))
    ztz = b @ b.T  # rank m/4: singular
    zty = rng.standard_normal(m)
    return jnp.asarray(ztz), jnp.asarray(zty)


def test_rescue_solves_singular_design_mat():
    ztz, zty = _singular_system()
    lam = jnp.asarray(0.0, ztz.dtype)  # Cholesky must fail outright
    with pytest.raises(FloatingPointError):
        direct_weight_calc(ztz, zty, lam)
    with pytest.warns(UserWarning, match="extra ridge"):
        w = rescue_weight_calc(ztz, zty, lam)
    assert np.all(np.isfinite(np.asarray(w)))
    # the rescued solution still approximately solves the (ridged) system
    resid = np.asarray(ztz) @ np.asarray(w) - np.asarray(zty)
    # residual lies (mostly) in the null-space component of zty; just
    # require the solve did not blow up
    assert np.linalg.norm(np.asarray(w)) < 1e8


def test_rescue_passthrough_when_pd():
    rng = np.random.default_rng(1)
    b = rng.standard_normal((32, 64))
    ztz = jnp.asarray(b @ b.T + 10.0 * np.eye(32))
    zty = jnp.asarray(rng.standard_normal(32))
    lam = jnp.asarray(0.1, ztz.dtype)
    w_direct = direct_weight_calc(ztz, zty, lam)[1]
    w_rescue = rescue_weight_calc(ztz, zty, lam)
    assert np.allclose(np.asarray(w_direct), np.asarray(w_rescue))
