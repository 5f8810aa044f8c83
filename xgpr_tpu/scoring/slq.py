"""Stochastic Lanczos quadrature logdet estimation from CG coefficients.

Parity: scoring_toolkit/approximate_nmll_calcs.py:12-50.  The Lanczos
tridiagonal for each probe is reconstructed from the CG (alpha, beta)
sequences: diag_i = 1/alpha_i + beta_{i-1}/alpha_{i-1}, offdiag_i =
sqrt(beta_i)/alpha_i; then logdet ~= num_rffs * mean_probes
sum_j w_j ln(theta_j) with w_j the squared first eigenvector components,
plus the preconditioner's own logdet when preconditioned probes were used.

The tridiagonal eigenproblems are tiny (niter x niter per probe), so they
run on host via scipy's eigh_tridiagonal.
"""
import numpy as np
from scipy.linalg import eigh_tridiagonal


def estimate_logdet(alphas, betas, num_rffs, preconditioner=None):
    """alphas/betas: (niter, nprobes) numpy arrays from the CG run."""
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    mat_diag = 1.0 / alphas
    mat_diag[1:, :] += betas[:-1, :] / alphas[:-1, :]
    upper_diag = np.sqrt(betas) / alphas

    nprobes = mat_diag.shape[1]
    logdets = np.zeros((nprobes,))
    for i in range(nprobes):
        if mat_diag.shape[0] > 1:
            eigvals, eigvecs = eigh_tridiagonal(
                mat_diag[:, i], upper_diag[:-1, i], lapack_driver="stev")
        else:
            eigvals = mat_diag[:1, i]
            eigvecs = np.ones((1, 1))
        weights = eigvecs[0, :] ** 2
        logdets[i] = (weights * np.log(eigvals)).sum()

    logdet = num_rffs * logdets.sum() / nprobes
    if preconditioner is not None:
        logdet += preconditioner.get_logdet()
    return float(logdet)
