"""Exact NMLL gradient.

Parity: scoring_toolkit/nmll_gradient_tools.py:94-161 (closed-form
dNMLL/dlambda and per-sigma gradients via Cholesky traces, returned times
the linear hyperparameters for the log-space chain rule).
"""
import numpy as np
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .alpha_beta import optimize_alpha_beta
from ..fitting.exact import cho_solve_lower


def exact_nmll_reg_grad(z_trans_z, z_trans_y, y_trans_y, hparams,
                        ndatapoints, dz_dsigma_ty, inner_deriv):
    """Returns (negloglik, grad, beta).

    Args:
        z_trans_z: (M, M) design matrix WITHOUT the lambda^2 shift.
        hparams: linear-space hyperparameters.
    """
    m = z_trans_z.shape[0]
    lambda_ = float(hparams[0])
    shifted = z_trans_z + (lambda_ ** 2) * jnp.eye(m, dtype=z_trans_z.dtype)
    chol = jnp.linalg.cholesky(shifted)
    if bool(jnp.any(jnp.isnan(chol))):
        raise FloatingPointError("Design matrix is not positive definite.")
    weights = cho_solve_lower(chol, z_trans_y)
    chol_inv = solve_triangular(chol, jnp.eye(m, dtype=chol.dtype),
                                lower=True)

    nll1 = float(0.5 * (y_trans_y - z_trans_y @ weights))
    nll2 = float(jnp.sum(jnp.log(jnp.diag(chol))))
    negloglik, beta = optimize_alpha_beta(lambda_,
                                          np.array([nll1, nll2]),
                                          float(ndatapoints), float(m))

    grad = np.zeros((hparams.shape[0],))
    alpha = lambda_ * beta

    dnll_dlambda = (1 / (beta ** 2 * lambda_ ** 3)) * float(
        z_trans_y @ weights - y_trans_y)
    dnll_dlambda += (1 / (beta ** 2 * lambda_)) * float(weights @ weights)
    dnll_dlambda += (ndatapoints - m) / lambda_
    dnll_dlambda += lambda_ * float(jnp.sum(chol_inv ** 2))
    grad[0] = dnll_dlambda

    for i in range(grad.shape[0] - 1):
        trace_term = cho_solve_lower(chol, inner_deriv[:, :, i])
        dnll_dsigma = -2 * float(weights @ dz_dsigma_ty[:, i])
        dnll_dsigma += float(weights @ (inner_deriv[:, :, i] @ weights))
        dnll_dsigma *= 0.5 / alpha ** 2
        dnll_dsigma += 0.5 * float(jnp.trace(trace_term))
        grad[i + 1] = dnll_dsigma

    grad *= np.asarray(hparams)
    return negloglik, grad, beta
