"""Closed-form fitting: Cholesky weights and exact variance.

Parity: fitting_toolkit/exact_fitting_toolkit.py:16-68 and
scoring_toolkit/exact_nmll_calcs.py:82-139.
"""
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def cho_solve_lower(chol, target):
    """Solve A x = target given lower-triangular chol(A)."""
    sol = solve_triangular(chol, target, lower=True)
    return solve_triangular(chol.T, sol, lower=False)


def direct_weight_calc(z_trans_z, z_trans_y, lambda_):
    """Cholesky solve of (Z^T Z + lambda^2 I) w = Z^T y.

    Returns (chol, weights).  Raises FloatingPointError if the matrix is
    not positive definite (NaNs in the factor), mirroring the reference's
    LAPACK exception contract.
    """
    m = z_trans_z.shape[0]
    a = z_trans_z + (lambda_ ** 2) * jnp.eye(m, dtype=z_trans_z.dtype)
    chol = jnp.linalg.cholesky(a)
    if bool(jnp.any(jnp.isnan(chol))):
        raise FloatingPointError("Design matrix is not positive definite.")
    weights = cho_solve_lower(chol, z_trans_y)
    return chol, weights


def calc_weights_exact(engine):
    """Exact weights via one design-matrix pass + Cholesky
    (exact_fitting_toolkit.py:16-36)."""
    z_trans_z, z_trans_y, _ = engine.design_mat()
    lambda_ = engine.kernel.get_lambda()
    _, weights = direct_weight_calc(z_trans_z, z_trans_y, lambda_)
    return weights, 1, []


def calc_variance_exact(engine, variance_rffs):
    """var = pinv(Z_v^T Z_v + lambda^2 I) over the first variance_rffs
    columns (exact_fitting_toolkit.py:40-68)."""
    z_trans_z = engine.var_design_mat(variance_rffs)
    lambda_ = engine.kernel.get_lambda()
    a = z_trans_z + (lambda_ ** 2) * jnp.eye(variance_rffs,
                                             dtype=z_trans_z.dtype)
    return jnp.linalg.pinv(a)
