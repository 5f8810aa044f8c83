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


def _ridge_pipeline(z, zt, yn, lam, ymean, ystd):
    m = z.shape[1]
    weights = np.linalg.solve(z.T @ z + lam ** 2 * np.eye(m), z.T @ yn)
    preds = (zt @ weights) * ystd + ymean
    return weights, preds


def test_conv_model_matches_numpy_pipeline():
    """Conv1dRBF end-to-end: oracle k-mer conv features -> numpy ridge."""
    from utils.oracle import oracle_conv_rbf_features
    rng = np.random.default_rng(3)
    n, l, d, width = 240, 14, 5, 4
    x = rng.standard_normal((n, l, d))
    sl = rng.integers(width, l + 1, n).astype(np.int32)
    y = np.sin(x[:, 0, 0]) + x.mean(axis=(1, 2))
    data = build_regression_dataset(x[:200], y[:200],
                                    sequence_lengths=sl[:200],
                                    chunk_size=50)
    hp = np.array([-1.0, -1.2])
    model = GPRegression(num_rffs=128, variance_rffs=16,
                         kernel_choice="Conv1dRBF", verbose=False,
                         kernel_settings={"conv_width": width},
                         random_seed=SEED)
    model.set_hyperparams(hp, data)
    model.fit(data, mode="exact")

    radem = np.asarray(model.kernel.radem_diag, np.float64)
    chi = np.asarray(model.kernel.chi_arr, np.float64)
    lam, sigma = np.exp(hp)
    ymean, ystd = y[:200].mean(), y[:200].std()
    z = oracle_conv_rbf_features(x[:200], sl[:200], radem, chi, sigma,
                                 width)
    zt = oracle_conv_rbf_features(x[200:], sl[200:], radem, chi, sigma,
                                  width)
    z[:, 0] = 1.0   # intercept column overwrite
    zt[:, 0] = 1.0
    yn = (y[:200] - ymean) / ystd
    weights_o, preds_o = _ridge_pipeline(z, zt, yn, lam, ymean, ystd)
    assert np.allclose(np.asarray(model.weights), weights_o,
                       rtol=1e-7, atol=1e-9)
    preds = model.predict(x[200:], sl[200:])
    assert np.allclose(preds, preds_o, rtol=1e-7, atol=1e-9)


def test_miniard_model_matches_numpy_pipeline():
    """MiniARD end-to-end: per-group lengthscales are a column scaling of
    the input before the plain RBF oracle map."""
    rng = np.random.default_rng(4)
    n, d = 400, 20
    x = rng.standard_normal((n, d))
    y = np.sin(2 * x[:, 0]) + x[:, 15]
    data = build_regression_dataset(x[:320], y[:320], chunk_size=80)
    hp = np.array([-1.3, -0.8, -1.6])  # lambda, sigma_1, sigma_2
    model = GPRegression(num_rffs=128, variance_rffs=16,
                         kernel_choice="MiniARD", verbose=False,
                         kernel_settings={"split_points": [12]},
                         random_seed=SEED)
    model.set_hyperparams(hp, data)
    model.fit(data, mode="exact")

    radem = np.asarray(model.kernel.radem_diag, np.float64)
    chi = np.asarray(model.kernel.chi_arr, np.float64)
    lam = np.exp(hp[0])
    w_cols = np.concatenate([np.full(12, np.exp(hp[1])),
                             np.full(d - 12, np.exp(hp[2]))])
    ymean, ystd = y[:320].mean(), y[:320].std()
    z = oracle_rbf_features(x[:320] * w_cols[None, :], radem, chi, 1.0,
                            model.kernel.fit_intercept)
    zt = oracle_rbf_features(x[320:] * w_cols[None, :], radem, chi, 1.0,
                             model.kernel.fit_intercept)
    yn = (y[:320] - ymean) / ystd
    weights_o, preds_o = _ridge_pipeline(z, zt, yn, lam, ymean, ystd)
    assert np.allclose(np.asarray(model.weights), weights_o,
                       rtol=1e-7, atol=1e-9)
    preds = model.predict(x[320:])
    assert np.allclose(preds, preds_o, rtol=1e-7, atol=1e-9)
