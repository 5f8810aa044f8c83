"""Tuning gates: all optimizers must reach the fixture's known-good NMLL
(reference pattern: tests/tuning_tests/test_tuning.py -- NMLL < 430 on
their tabular set; on this fixture the tuned NMLL is ~2064, so the gate is
2100)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data

NMLL_GATE = 2100.0


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), _ = tabular_data()
    return build_regression_dataset(trx, tr_y, chunk_size=400)


def test_crude_tuning(data):
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    hparams, n_feval, score = model.tune_hyperparams_crude(data)
    assert score < NMLL_GATE
    assert np.all(np.isfinite(hparams))


@pytest.mark.parametrize("method", ["Powell", "Nelder-Mead", "L-BFGS-B"])
def test_optimizer_tuning(data, method):
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    hparams, n_feval, score = model.tune_hyperparams(
        data, tuning_method=method, max_iter=50,
        starting_hyperparams=np.array([-1.0, -3.0]))
    assert score < NMLL_GATE


def test_crude_tuning_miniard(data):
    model = GPRegression(num_rffs=512, kernel_choice="MiniARD",
                         kernel_settings={"split_points": [40]},
                         verbose=False)
    hparams, n_feval, score = model.tune_hyperparams_crude(data)
    assert score < NMLL_GATE + 100
