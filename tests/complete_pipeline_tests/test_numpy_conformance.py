"""Full-model conformance against an INDEPENDENT pure-numpy pipeline.

The op-level oracle tests pin feature generation; the E2E Spearman floors
pin end quality statistically.  This closes the gap between them: a tiny
model fitted end-to-end must agree with a numpy reference that never
touches library code downstream of the projection state -- oracle SORF
features, numpy Cholesky ridge solve, direct N x N-covariance marginal
likelihood (the alpha-beta amplitude optimised in closed form), and the
exact predictive-variance formula.  NMLL gate is the north star's 0.1%;
weights/predictions are held to fp64 linear-algebra agreement.
"""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.oracle import oracle_rbf_features, oracle_positions

SEED = 123
HPARAMS = np.array([-1.2, -0.9])  # log(lambda), log(sigma)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n, d = 500, 21
    x = rng.standard_normal((n, d))
    w = rng.standard_normal(d) / np.sqrt(d)
    y = np.sin(2 * x @ w) + 0.1 * rng.standard_normal(n)
    xt = rng.standard_normal((40, d))
    return x, y, xt


def _oracle_pipeline(model, x, y, xt, variance_rffs):
    """Everything downstream of the projection state, in numpy."""
    kernel = model.kernel
    radem = np.asarray(kernel.radem_diag, dtype=np.float64)
    chi = np.asarray(kernel.chi_arr, dtype=np.float64)
    lam, sigma = np.exp(HPARAMS)
    ymean, ystd = y.mean(), y.std()
    yn = (y - ymean) / ystd
    n = x.shape[0]

    z = oracle_rbf_features(x, radem, chi, sigma, kernel.fit_intercept)
    m = z.shape[1]

    # Ridge solve: (Z^T Z + lam^2 I) w = Z^T y.
    ztz = z.T @ z
    zty = z.T @ yn
    weights = np.linalg.solve(ztz + lam ** 2 * np.eye(m), zty)

    zt = oracle_rbf_features(xt, radem, chi, sigma, kernel.fit_intercept)
    preds = (zt @ weights) * ystd + ymean

    # Marginal likelihood straight from the N x N covariance
    # C = beta^2 (Z Z^T + lam^2 I_N), beta optimised in closed form and
    # clipped to [0.1, 10] (alpha_beta_optimizer.py:13-39 contract).
    c0 = z @ z.T + lam ** 2 * np.eye(n)
    c0_inv_y = np.linalg.solve(c0, yn)
    quad = 0.5 * float(yn @ c0_inv_y)
    beta = np.clip(np.sqrt(2.0 * quad / n), 0.1, 10.0)
    sign, logdet = np.linalg.slogdet(c0)
    assert sign > 0
    nmll = (quad / beta ** 2 + n * np.log(beta) + 0.5 * logdet
            + 0.5 * n * np.log(2 * np.pi))

    # Predictive variance over the first variance_rffs features
    # (cos/sin pairs of the first variance_rffs/2 frequencies).
    cos_pos, sin_pos = oracle_positions(chi.shape[0], radem.shape[-1])
    cols = np.concatenate(
        [np.stack([cos_pos[:variance_rffs // 2],
                   sin_pos[:variance_rffs // 2]], axis=1).ravel()])
    zv = z[:, cols]
    zvt = zt[:, cols]
    vmat = np.linalg.pinv(zv.T @ zv + lam ** 2 * np.eye(len(cols)))
    var = (lam ** 2 + lam ** 2 *
           np.sum(zvt * (zvt @ vmat), axis=1)) * ystd ** 2
    return weights, preds, nmll, var, cols


def test_full_model_matches_numpy_pipeline(problem):
    x, y, xt = problem
    data = build_regression_dataset(x, y, chunk_size=128)
    variance_rffs = 16

    model = GPRegression(num_rffs=256, variance_rffs=variance_rffs,
                         kernel_choice="RBF", verbose=False,
                         random_seed=SEED)
    model.set_hyperparams(HPARAMS, data)
    weights_o, preds_o, nmll_o, var_o, cols = _oracle_pipeline(
        model, x, y, xt, variance_rffs)

    # The library must select the same variance columns.
    lib_cols = model.kernel.variance_column_indices(variance_rffs)
    assert np.array_equal(np.sort(lib_cols), np.sort(cols))

    # Exact fit.
    model.fit(data, mode="exact")
    assert np.allclose(np.asarray(model.weights), weights_o,
                       rtol=1e-7, atol=1e-9)
    preds, var = model.predict(xt, get_var=True)
    assert np.allclose(preds, preds_o, rtol=1e-7, atol=1e-9)
    assert np.allclose(var, var_o, rtol=1e-5, atol=1e-8)

    # Exact NMLL within the 0.1% north-star tolerance of the direct
    # N x N-covariance computation (in fp64 they agree far tighter).
    nmll = model.exact_nmll(HPARAMS, data)
    assert abs(nmll - nmll_o) / abs(nmll_o) < 1e-3
    assert abs(nmll - nmll_o) / abs(nmll_o) < 1e-8  # fp64 actual

    # Approximate (SLQ) NMLL within 1% of the numpy value too
    # (test_slq_nmll.py gate, but against the independent oracle).
    approx = model.approximate_nmll(HPARAMS, data)
    assert abs(approx - nmll_o) / abs(nmll_o) < 0.01

    # CG fit converges to the same solution.
    model2 = GPRegression(num_rffs=256, variance_rffs=variance_rffs,
                          kernel_choice="RBF", verbose=False,
                          random_seed=SEED)
    model2.set_hyperparams(HPARAMS, data)
    model2.fit(data, mode="cg", tol=1e-10, max_rank=64, min_rank=32)
    assert np.allclose(np.asarray(model2.weights), weights_o,
                       rtol=1e-6, atol=1e-8)
