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

    When the Gram matrix arrives in fp32 (the TPU working dtype), the
    factorization runs on HOST in float64: the unnormalized entries are
    O(n)-scale sums, so at n ~ 1e6 a well-tuned lambda^2 sits BELOW the
    fp32 roundoff of the diagonal and an on-device fp32 Cholesky breaks
    down at exactly the well-conditioned interior points tuning finds
    (observed at the 1M north-star verify).  The reference always runs
    this step in fp64 LAPACK (scoring_toolkit/exact_nmll_calcs.py); one
    host factorization of the small (M, M) matrix keeps that contract
    without any device round-trip of the fp64 factor.
    """
    m = z_trans_z.shape[0]
    if z_trans_z.dtype != jnp.float64:
        import numpy as np
        from scipy import linalg as sp_linalg
        a = np.asarray(z_trans_z, dtype=np.float64)
        a[np.arange(m), np.arange(m)] += float(lambda_) ** 2
        try:
            chol = sp_linalg.cholesky(a, lower=True, check_finite=False)
        except np.linalg.LinAlgError as err:
            raise FloatingPointError(
                "Design matrix is not positive definite.") from err
        weights = sp_linalg.cho_solve(
            (chol, True), np.asarray(z_trans_y, dtype=np.float64),
            check_finite=False)
        return chol, jnp.asarray(weights, dtype=z_trans_z.dtype)
    a = z_trans_z + (lambda_ ** 2) * jnp.eye(m, dtype=z_trans_z.dtype)
    chol = jnp.linalg.cholesky(a)
    if bool(jnp.any(jnp.isnan(chol))):
        raise FloatingPointError("Design matrix is not positive definite.")
    weights = cho_solve_lower(chol, z_trans_y)
    return chol, weights


def rescue_weight_calc(z_trans_z, z_trans_y, lambda_):
    """Cholesky weights with a shifted-factorization rescue.

    The reference runs LAPACK in fp64, where (Z^T Z + lambda^2 I) is
    essentially always numerically PD; in fp32 (TPU) a well-tuned tiny
    lambda can put the shift below roundoff of the leading eigenvalues
    and the factorization breaks down.  Mirroring the reference's
    numerically-shifted Cholesky in its preconditioner constructor
    (rand_nys_constructors.py:198-213), retry with a growing diagonal
    shift -- a slightly stronger ridge -- rather than failing the fit.
    """
    import warnings
    try:
        _, weights = direct_weight_calc(z_trans_z, z_trans_y, lambda_)
        return weights
    except FloatingPointError:
        pass
    m = z_trans_z.shape[0]
    mean_eig = float(jnp.trace(z_trans_z)) / m
    for k in range(7):
        eps = mean_eig * (10.0 ** (k - 7))
        try:
            _, weights = direct_weight_calc(
                z_trans_z, z_trans_y,
                jnp.sqrt(lambda_ ** 2 + eps))
            warnings.warn(
                "Design matrix was not positive definite at the "
                f"requested lambda; solved with an extra ridge of {eps:.3e} "
                "(fp32 shifted factorization).")
            return weights
    # pragma: no cover -- trace-scaled shifts always succeed eventually
        except FloatingPointError:
            continue
    raise FloatingPointError("Design matrix is not positive definite.")


def calc_weights_exact(engine):
    """Exact weights via one design-matrix pass + Cholesky
    (exact_fitting_toolkit.py:16-36)."""
    z_trans_z, z_trans_y, _ = engine.design_mat()
    lambda_ = engine.kernel.get_lambda()
    weights = rescue_weight_calc(z_trans_z, z_trans_y, lambda_)
    return weights, 1, []


def calc_variance_exact(engine, variance_rffs):
    """var = pinv(Z_v^T Z_v + lambda^2 I) over the first variance_rffs
    columns (exact_fitting_toolkit.py:40-68)."""
    z_trans_z = engine.var_design_mat(variance_rffs)
    lambda_ = engine.kernel.get_lambda()
    a = z_trans_z + (lambda_ ** 2) * jnp.eye(variance_rffs,
                                             dtype=z_trans_z.dtype)
    return jnp.linalg.pinv(a)
