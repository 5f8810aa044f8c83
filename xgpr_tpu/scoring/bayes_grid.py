"""Bayesian-grid tuning for 2-3 hyperparameter kernels.

Parity: scoring_toolkit/bayes_grid.py -- initial sigma grid (linspace for
one sigma, random for two), each point scored with the telescoping-lambda
search, then a GP surrogate proposes new points via Thompson sampling over
500 uniform candidates; converges when the proposal distance < tol.
"""
import warnings

import numpy as np
from sklearn.gaussian_process import GaussianProcessRegressor as GPR
from sklearn.gaussian_process.kernels import RBF as SkRBF

from .lb_optimizer import shared_hparam_search


def bayes_grid_tuning(kernel, engine_factory, bounds, random_seed,
                      max_iter, verbose, tol=1e-1, n_pts_per_dim=100,
                      n_cycles=1, n_init_pts=10, subsample=1.0):
    """Returns (best_hparams, (sigma_grid, scores), best_score, n_feval)."""
    bounds = np.asarray(bounds, dtype=np.float64)
    if bounds.shape[0] >= 4 or bounds.shape[0] < 2:
        raise RuntimeError("Bayesian optimization is only allowed for "
                           "kernels with 2 - 3 hyperparameters.")

    if bounds.shape[0] == 2:
        sigma_grid = np.linspace(bounds[1, 0], bounds[1, 1], n_init_pts)
    else:
        rng = np.random.default_rng(random_seed)
        sigma_grid = np.column_stack([
            rng.uniform(size=n_init_pts, low=bounds[i + 1, 0],
                        high=bounds[i + 1, 1])
            for i in range(bounds.shape[0] - 1)])

    sigma_grid = np.round(sigma_grid, 7)
    if sigma_grid.ndim == 1:
        sigma_grid = sigma_grid.reshape(-1, 1)
    sigma_grid = list(sigma_grid)

    lb_vals, scores = [], []
    for i, sigma_pt in enumerate(sigma_grid):
        score, lb_val = shared_hparam_search(
            sigma_pt, kernel, engine_factory, bounds[:1, :],
            n_pts_per_dim=n_pts_per_dim, n_cycles=n_cycles,
            subsample=subsample)
        scores.append(score)
        lb_vals.append(lb_val)
        if verbose:
            print(f"Grid point {i} acquired.")

    scores = np.asarray(scores)
    finite = scores[scores < np.inf]
    cap = float(np.max(finite)) if finite.size else 0.0
    scores[scores == np.inf] = cap
    scores = scores.tolist()

    surrogate = GPR(kernel=SkRBF(), normalize_y=True, alpha=1e-6,
                    random_state=random_seed, n_restarts_optimizer=4)
    sigma_bounds = bounds[1:, :]
    iternum = len(sigma_grid)
    for iternum in range(len(sigma_grid), max_iter):
        new_sigma, min_dist, surrogate = _propose_new_point(
            sigma_grid, scores, surrogate, sigma_bounds,
            random_seed + iternum)
        if verbose:
            print(f"New hparams: {new_sigma}")
        score, lb_val = shared_hparam_search(
            new_sigma, kernel, engine_factory, bounds[:1, :],
            n_pts_per_dim=n_pts_per_dim, n_cycles=n_cycles,
            subsample=subsample)
        sigma_grid.append(new_sigma)
        lb_vals.append(lb_val)
        scores.append(min(score, cap))
        if min_dist < tol:
            break
        if verbose:
            print(f"Additional acquisition {iternum}.")

    best_idx = int(np.argmin(scores))
    best_hparams = np.empty((bounds.shape[0],))
    best_hparams[1:] = sigma_grid[best_idx]
    best_hparams[:1] = lb_vals[best_idx]
    if verbose:
        print(f"Best score achieved: {np.round(np.min(scores), 4)}")
        print(f"Best hyperparams: {best_hparams}")
    return best_hparams, (sigma_grid, scores), float(np.min(scores)), iternum


def _propose_new_point(sigma_vals, scores, surrogate, bounds, random_seed,
                       num_cand=500):
    """Thompson sampling over uniform candidates (bayes_grid.py:113-155)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        xvals = np.vstack(sigma_vals)
        surrogate.fit(xvals, scores)

    rng = np.random.default_rng(random_seed)
    candidates = rng.uniform(low=bounds[:, 0], high=bounds[:, 1],
                             size=(num_cand, bounds.shape[0]))
    candidates = np.round(candidates, 7)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        y_candidates = surrogate.sample_y(candidates, n_samples=15,
                                          random_state=random_seed)
    best_idx = np.unravel_index(np.argmin(y_candidates),
                                y_candidates.shape)
    best_cand = candidates[best_idx[0], :]
    min_dist = float(np.min(np.linalg.norm(best_cand[None, :] - xvals,
                                           axis=1)))
    return best_cand, min_dist, surrogate
