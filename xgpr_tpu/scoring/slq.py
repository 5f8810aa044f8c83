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


def slq_nmll_from_engine(engine, preconditioner, random_seed, nsamples,
                         nmll_iter, nmll_tol):
    """Approximate NMLL via preconditioned CG + SLQ over any engine.

    The estimator only touches the data through the engine's ``ztzv``
    reduction and the preconditioner's stored Z^T y / y^T y, so the same
    code scores a streamed dataset (models.regression.approximate_nmll,
    parity xgp_regression.py:264-377) or an exact cached Gram
    (fitting.gram_engine.GramEngine -- the reference-grade float64
    verification path).
    """
    import jax.numpy as jnp
    from ..fitting.cg import ConjugateGrad
    from ..utils import rng as state_rng
    from .alpha_beta import optimize_alpha_beta

    num_rffs = engine.num_rffs
    probes = jnp.asarray(state_rng.normal_probes(
        random_seed, num_rffs, nsamples))
    probes = preconditioner.matvec_for_sampling(probes)

    z_trans_y = preconditioner.get_zty()
    y_trans_y = preconditioner.get_yty()
    ndatapoints = engine.ndatapoints

    rhs = jnp.concatenate(
        [jnp.asarray(z_trans_y)[:, None] / ndatapoints,
         probes.astype(jnp.asarray(z_trans_y).dtype)], axis=1)

    cg = ConjugateGrad(engine)
    x_k, alphas, betas = cg.fit(rhs, engine.kernel.get_lambda(),
                                preconditioner, nmll_iter, nmll_tol,
                                verbose=False, nmll_settings=True)
    x0 = x_k[:, 0] * ndatapoints
    logdet = estimate_logdet(alphas, betas, num_rffs, preconditioner)
    nll1 = float(0.5 * (y_trans_y - jnp.asarray(z_trans_y) @ x0))
    negloglik, _ = optimize_alpha_beta(
        engine.kernel.get_lambda(), np.array([nll1, 0.5 * logdet]),
        ndatapoints, num_rffs)
    return negloglik


def estimate_logdet(alphas, betas, num_rffs, preconditioner=None):
    """alphas/betas: (niter, nprobes) numpy arrays from the CG run.

    Each probe's Lanczos sequence is truncated at its first non-positive
    alpha: the breakdown-safe CG records alpha = 0 once a column has
    converged or broken down (see fitting/fused_cg.py), and only the
    preceding coefficients define a valid tridiagonal.
    """
    alphas = np.asarray(alphas, dtype=np.float64)
    betas = np.asarray(betas, dtype=np.float64)
    nprobes = alphas.shape[1]
    logdets = np.zeros((nprobes,))
    n_used = 0
    for i in range(nprobes):
        a = alphas[:, i]
        b = betas[:, i]
        bad = ~(a > 0)
        length = int(np.argmax(bad)) if bad.any() else a.shape[0]
        if length < 1:
            continue
        a = a[:length]
        b = np.clip(b[:length], 0.0, None)
        mat_diag = 1.0 / a
        mat_diag[1:] += b[:-1] / a[:-1]
        if length > 1:
            upper_diag = (np.sqrt(b) / a)[:-1]
            eigvals, eigvecs = eigh_tridiagonal(
                mat_diag, upper_diag, lapack_driver="stev")
        else:
            eigvals = mat_diag[:1]
            eigvecs = np.ones((1, 1))
        weights = eigvecs[0, :] ** 2
        eigvals = np.clip(eigvals, 1e-30, None)
        logdets[i] = (weights * np.log(eigvals)).sum()
        n_used += 1

    if n_used == 0:
        raise FloatingPointError("SLQ: no usable probe sequences.")
    logdet = num_rffs * logdets.sum() / n_used
    if preconditioner is not None:
        logdet += preconditioner.get_logdet()
    return float(logdet)
