"""Telescoping-grid search over the shared lambda hyperparameter.

Parity: scoring_toolkit/lb_optimizer.py -- one SVD of Z^T Z (+1e-5 jitter,
eigenvalue floor 1e-7), then NMLL scored in closed form for a 100-point
lambda grid per cycle, grid contracted around the best point.
"""
import numpy as np
import jax.numpy as jnp


def get_eigvals(engine, subsample=1.0):
    """Eigen-decompose Z^T Z; returns (eigvals, U^T Z^T y, y^T y, N)
    (lb_optimizer.py:68-117)."""
    if subsample >= 1.0:
        z_trans_z, z_trans_y, y_trans_y = engine.design_mat()
        ndatapoints = engine.ndatapoints
    else:
        z_trans_z, z_trans_y, y_trans_y, _, _, ndatapoints = \
            _subsampled_design_mat(engine, subsample)

    m = z_trans_z.shape[0]
    # Z^T Z is symmetric PSD: eigh == the reference's SVD here
    # (lb_optimizer.py:103-106).  The decomposition runs in float64 on
    # host: accelerator fp32 eigh of a near-singular jittered matrix can
    # return eigenpairs inaccurate enough that the closed-form score's
    # explained energy exceeds y^T y, producing spuriously negative NMLL
    # that the tuner then chases to the bounds (observed on-chip at
    # sigma -> 0).  The reference leans on fp64 LAPACK for exactly this
    # step; the matrix is at most MAX_CLOSED_FORM_RFFS square, so the
    # host round trip is cheap next to the dataset pass that built it.
    ztz64 = np.array(z_trans_z, dtype=np.float64)
    ztz64 += 1e-5 * np.eye(m)
    eigvals, eigvecs = np.linalg.eigh(ztz64)
    eigvals = eigvals[::-1] - 1e-5
    eigvecs = eigvecs[:, ::-1]

    eigvals_np = np.array(eigvals)
    mask = eigvals_np >= 1e-7
    cut_point = max(int(mask.sum()), 1)
    eigvals_np[cut_point:] = 1e-7
    eigvecs = np.array(eigvecs)
    eigvecs[:, cut_point:] = 0
    proj = eigvecs.T @ np.asarray(z_trans_y)
    return eigvals_np, proj, float(y_trans_y), ndatapoints


def _subsampled_design_mat(engine, subsample):
    """Row-subsampled design matrix via the object API (matches
    lb_optimizer.py:94-106's per-chunk subsample)."""
    rng = np.random.default_rng(123)
    m = engine.num_rffs
    ztz = np.zeros((m, m))
    zty = np.zeros((m,))
    yty = 0.0
    n = 0
    for xb, yb, lb in engine.dataset.get_chunked_data():
        idx_size = max(1, int(subsample * xb.shape[0]))
        idx = rng.choice(xb.shape[0], idx_size, replace=False)
        xb, yb = xb[idx, ...], yb[idx]
        lb = None if lb is None else lb[idx]
        z, y = engine.kernel.transform_x_y(xb, yb, lb)
        z, y = np.asarray(z), np.asarray(y)
        ztz += z.T @ z
        zty += z.T @ y
        yty += float(y @ y)
        n += xb.shape[0]
    return jnp.asarray(ztz), jnp.asarray(zty), yty, None, None, n


def generate_scoregrid(num_rffs, eigvals, proj, lambda_grid, y_trans_y,
                       ndatapoints):
    """Closed-form NMLL for each lambda grid point
    (lb_optimizer.py:122-168)."""
    eigval_batch = eigvals[:, None] + lambda_grid[None, :] ** 2
    resid = y_trans_y - proj @ (proj[:, None] / eigval_batch)
    # In exact arithmetic the explained energy cannot exceed y^T y; a
    # materially negative residual means the eigenpairs were too
    # inaccurate to score (fp32 breakdown) -- flag those grid points as
    # degenerate instead of letting a zero-clipped quadratic term turn
    # the logdet into a spuriously attractive score.
    bad = resid < -1e-3 * max(abs(y_trans_y), 1e-30)
    scoregrid = np.clip(resid, 0, None)
    scoregrid = 0.5 * scoregrid

    beta = np.sqrt(2 * scoregrid / (ndatapoints * lambda_grid ** 2))
    beta = np.clip(beta, 0.1, 10)

    scoregrid = scoregrid / (beta * lambda_grid) ** 2
    scoregrid += 0.5 * np.log(eigval_batch).sum(axis=0)
    scoregrid += (ndatapoints - num_rffs) * np.log(lambda_grid)
    scoregrid += ndatapoints * 0.5 * np.log(2 * np.pi) \
        + ndatapoints * np.log(beta)
    from ..constants import DEFAULT_SCORE_IF_PROBLEM
    scoregrid = np.where(bad | ~np.isfinite(scoregrid),
                         DEFAULT_SCORE_IF_PROBLEM, scoregrid)
    return scoregrid


def shared_hparam_search(sigma_vals, kernel, engine_factory, init_bounds,
                         n_pts_per_dim=100, n_cycles=1, subsample=1.0):
    """Score a sigma point by optimising lambda on a telescoping grid
    (lb_optimizer.py:13-63).

    Args:
        sigma_vals: (n_hyperparams - 1,) log-space kernel-specific values.
        kernel: the kernel object (hyperparams will be overwritten).
        engine_factory: zero-arg callable returning a fresh Engine view of
            (kernel, dataset) -- the kernel's hyperparams are read through
            feature_params at reduction time.
        init_bounds: log-space bounds, row 0 is lambda's.

    Returns:
        (score, best_lambda_logspace) -- rounded like the reference.
    """
    bounds = np.asarray(init_bounds, dtype=np.float64).copy()
    if np.exp(bounds[0, 0]) < 1e-3:
        bounds[0, 0] = np.log(1e-3)

    hparams = np.zeros((np.asarray(sigma_vals).shape[0] + 1))
    if hparams.shape[0] > 1:
        hparams[1:] = sigma_vals
    kernel.set_hyperparams(hparams, logspace=True)

    engine = engine_factory()
    eigvals, proj, y_trans_y, ndatapoints = get_eigvals(engine, subsample)
    num_rffs = kernel.get_num_rffs()

    best_score, best_lb = np.inf, None
    for _ in range(n_cycles):
        lambda_grid = np.exp(np.linspace(bounds[0, 0], bounds[0, 1],
                                         n_pts_per_dim))
        spacing = 1.05 * abs(bounds[0, 0] - bounds[0, 1]) / n_pts_per_dim
        scoregrid = generate_scoregrid(num_rffs, eigvals, proj, lambda_grid,
                                       y_trans_y, ndatapoints)
        min_pt = int(np.argmin(scoregrid))
        best_score = scoregrid[min_pt]
        best_lb = np.log(float(lambda_grid[min_pt]))
        bounds[0, 0] = max(best_lb - spacing, init_bounds[0, 0])
        bounds[0, 1] = min(best_lb + spacing, init_bounds[0, 1])

    return np.round(float(best_score), 3), np.round(np.asarray([best_lb]), 7)
