"""Analytic NMLL gradient vs numerical gradient, < 0.5% relative error
(reference: tests/gradient_calc_tests/kernel_specific_gradient_test.py)."""
import sys
import os
import numpy as np
import pytest
from scipy.optimize import approx_fprime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data, sequence_data


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), _ = tabular_data(n_train=900)
    return build_regression_dataset(trx, tr_y, chunk_size=300)


@pytest.mark.parametrize("kernel,settings,hparams", [
    ("RBF", {}, np.array([-1.0, -2.5])),
    ("Matern", {"matern_nu": 5 / 2}, np.array([-1.0, -2.5])),
    ("Cauchy", {}, np.array([-1.0, -2.5])),
    ("MiniARD", {"split_points": [40]}, np.array([-1.0, -2.5, -2.0])),
    ("Linear", {}, np.array([-1.0])),
])
def test_gradient_matches_numerical(data, kernel, settings, hparams):
    model = GPRegression(num_rffs=256, kernel_choice=kernel,
                         kernel_settings=settings, verbose=False)
    model.set_hyperparams(dataset=data)

    def cost(h):
        return model.exact_nmll_gradient(h, data)[0]

    _, analytic = model.exact_nmll_gradient(hparams, data)
    numerical = approx_fprime(hparams, cost, 1e-7)
    rel_err = np.abs(analytic - numerical) / \
        np.maximum(np.abs(numerical), 1e-8)
    assert rel_err.max() < 0.005


@pytest.fixture(scope="module")
def seq_data():
    (trx, tr_y, tr_len), _ = sequence_data(n_train=400, max_len=16,
                                           n_features=8, conv_width=5)
    return build_regression_dataset(trx, tr_y, tr_len, chunk_size=200)


# The reference gradient-checks every registry kernel, conv/graph
# included, and repeats conv kernels with averaging="full"
# (tests/gradient_calc_tests/test_kernel_gradient_calcs.py:12-28).
@pytest.mark.parametrize("kernel,settings,hparams", [
    ("Conv1dRBF", {"conv_width": 5}, np.array([-1.0, -2.0])),
    ("Conv1dRBF", {"conv_width": 5, "averaging": "full"},
     np.array([-1.0, -2.0])),
    ("Conv1dMatern", {"conv_width": 5, "matern_nu": 5 / 2},
     np.array([-1.0, -2.0])),
    ("Conv1dCauchy", {"conv_width": 5}, np.array([-1.0, -2.0])),
    ("GraphRBF", {}, np.array([-1.0, -2.0])),
    ("GraphRBF", {"averaging": "sqrt"}, np.array([-1.0, -2.0])),
    ("Conv1dTwoLayer", {"conv_width": 5, "init_rffs": 128},
     np.array([-1.0, -2.0])),
])
def test_conv_gradient_matches_numerical(seq_data, kernel, settings,
                                         hparams):
    model = GPRegression(num_rffs=256, kernel_choice=kernel,
                         kernel_settings=settings, verbose=False)
    model.set_hyperparams(dataset=seq_data)

    def cost(h):
        return model.exact_nmll_gradient(h, seq_data)[0]

    _, analytic = model.exact_nmll_gradient(hparams, seq_data)
    numerical = approx_fprime(hparams, cost, 1e-7)
    rel_err = np.abs(analytic - numerical) / \
        np.maximum(np.abs(numerical), 1e-8)
    assert rel_err.max() < 0.005
