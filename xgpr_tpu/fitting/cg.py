"""Batched-RHS preconditioned conjugate gradients.

Algorithmic parity with the reference's CPU/GPU_ConjugateGrad
(fitting_toolkit/cg_tools.py:26-302): matvec is the streamed
(Z^T Z + lambda^2) v chunk reduction, per-RHS alpha/beta, convergence when
the max relative residual norm < tol, and nmll mode captures the per-
iteration (alpha, beta) pairs for stochastic Lanczos quadrature with the
first (fit) column dropped.

The matvec runs through the Engine (jitted scan in stacked mode); the
outer iteration is a light Python loop -- a handful of O(M*K) vector ops
per iteration, negligible next to the matvec.
"""
import warnings

import numpy as np
import jax.numpy as jnp


class ConjugateGrad:
    """PCG over the implicit normal equations (Z^T Z + lambda^2) x = b."""

    def __init__(self, engine):
        self.engine = engine

    def matvec(self, vec, lambda_):
        prod = self.engine.ztzv(vec)
        return prod + (lambda_ ** 2) * vec

    def _fused_solver(self, preconditioner):
        """Pick the single-dispatch while_loop solver when the engine's
        data is device-resident; the Python loop remains for streaming
        engines and exotic preconditioners."""
        from .. import config as _config
        if _config.cg_mode() == "looped":
            return None
        if preconditioner is not None and \
                not hasattr(preconditioner, "u_mat"):
            return None
        from ..parallel.sharded import ShardedEngine
        from .fused_cg import (fused_cg_solve_stacked,
                               fused_cg_solve_sharded)
        if isinstance(self.engine, ShardedEngine):
            # Streaming sharded engines have no device-resident stack;
            # they re-stream the dataset per iteration through the Python
            # loop below (the reference's cg_tools.py:26-53 pattern).
            if getattr(self.engine, "_x", None) is None:
                return None
            return fused_cg_solve_sharded
        if getattr(self.engine, "_stacked", None) is not None:
            return fused_cg_solve_stacked
        return None

    def fit(self, rhs, lambda_, preconditioner=None, maxiter=200, tol=1e-4,
            verbose=True, nmll_settings=False):
        """Solve (Z^T Z + lambda^2) x = rhs for each RHS column.

        Args:
            rhs: (M, K) right-hand sides (K simultaneous systems).
            lambda_: shared noise hyperparameter.
            preconditioner: object with batch_matvec, or None.
            maxiter, tol: iteration limits as in the reference.
            nmll_settings: if True, return (x, alphas, betas) with the fit
                column's coefficients dropped (cg_tools.py:143-150).

        Returns:
            (x, converged, niter, losses) or (x, alphas, betas).
        """
        fused = self._fused_solver(preconditioner)
        if fused is not None:
            x_k, done, niter, alphas, betas, errs = fused(
                self.engine, jnp.asarray(rhs), lambda_, preconditioner,
                maxiter, tol)
            niter = int(niter)
            if nmll_settings:
                a = np.asarray(alphas)[:niter]
                b = np.asarray(betas)[:niter]
                return x_k, a[:, 1:], b[:, 1:]
            losses = list(np.asarray(errs)[:niter])
            return x_k, bool(done), niter, losses

        resid = jnp.asarray(rhs)
        init_norms = jnp.linalg.norm(resid, axis=0)
        x_k = jnp.zeros_like(resid)
        k = resid.shape[1]

        if preconditioner is None:
            z_k = resid
        else:
            z_k = preconditioner.batch_matvec(resid)
        p_k = z_k

        alphas, betas, losses = [], [], []
        niter = 0
        rz = jnp.sum(resid * z_k, axis=0)
        # Per-column breakdown safety -- see fused_cg._cg_while.
        active = jnp.ones((k,), jnp.bool_)
        converged_mask = jnp.zeros((k,), jnp.bool_)

        for niter in range(1, maxiter + 1):
            # 'active' == not broken down; converged columns keep
            # iterating until the global exit (see fused_cg._cg_while).
            w = self.matvec(p_k, lambda_)
            pw = jnp.sum(p_k * w, axis=0)
            alpha_raw = rz / pw
            bad = jnp.logical_or(~jnp.isfinite(alpha_raw), pw <= 0)
            active = jnp.logical_and(active, ~bad)
            alpha = jnp.where(active, alpha_raw, 0.0)
            x_k = x_k + alpha[None, :] * p_k
            resid_next = resid - alpha[None, :] * w
            err = jnp.linalg.norm(resid_next, axis=0) / init_norms
            converged_mask = jnp.logical_or(converged_mask, err < tol)

            if preconditioner is None:
                z_next = resid_next
            else:
                z_next = preconditioner.batch_matvec(resid_next)
            rz_next = jnp.sum(resid_next * z_next, axis=0)
            active = jnp.logical_and(active, rz_next > 0)
            beta = jnp.where(active, rz_next / rz, 0.0)
            p_k = jnp.where(active[None, :],
                            z_next + beta[None, :] * p_k, p_k)
            resid, z_k, rz = resid_next, z_next, rz_next

            if nmll_settings:
                alphas.append(np.asarray(alpha))
                betas.append(np.asarray(beta))
            else:
                losses.append(float(err[0]))

            if verbose and niter % 5 == 0:
                print(f"{niter} iterations complete.")
            if bool(jnp.all(jnp.logical_or(converged_mask, ~active))):
                break
        converged = bool(jnp.all(converged_mask))

        if nmll_settings:
            alphas = np.stack(alphas)
            betas = np.stack(betas)
            # Drop column 0 (the fit RHS); SLQ uses the probe columns only.
            return x_k, alphas[:, 1:], betas[:, 1:]
        return x_k, converged, niter, losses


def cg_fit(engine, preconditioner=None, tol=1e-6, max_iter=500,
           verbose=True):
    """Fit driver (cg_fitting_toolkit.py:18-70): rhs = Z^T y / N, run PCG,
    rescale weights by N, warn on non-convergence."""
    kernel = engine.kernel
    lambda_ = kernel.get_lambda()
    ndatapoints = engine.ndatapoints

    if preconditioner is None:
        z_trans_y, _ = engine.zty()
    else:
        z_trans_y = preconditioner.get_zty()

    rhs = (z_trans_y / ndatapoints)[:, None]
    cg = ConjugateGrad(engine)
    x_k, converged, n_iter, losses = cg.fit(rhs, lambda_, preconditioner,
                                            max_iter, tol, verbose)
    weights = x_k[:, 0] * ndatapoints
    if not converged:
        if n_iter >= max_iter:
            warnings.warn("CG hit max_iter before reaching tol; the "
                          "returned weights are usable but a larger "
                          "preconditioner rank or looser tol may fit "
                          "better.")
        else:
            # Early exit with unconverged columns = every remaining
            # column was frozen by the breakdown guard: the system is
            # near-singular at these hyperparameters.
            warnings.warn("CG froze numerically broken-down columns "
                          "before reaching tol; the returned weights are "
                          "usable but the system is near-singular at "
                          "these hyperparameters.")
    if verbose:
        print(f"CG iterations: {n_iter}")
    return weights, n_iter, losses
