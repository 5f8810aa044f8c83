"""SLQ-approximate NMLL must land within 1% of exact NMLL for both easy
and hard hyperparameter regimes (reference:
tests/approximate_nmll_tests/test_slq_nmll.py:19-74)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data

EASY_HPARAMS = np.array([-1.7908995, -3.9549678])
HARD_HPARAMS = np.array([-3.2, -2.0])


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), _ = tabular_data()
    return build_regression_dataset(trx, tr_y, chunk_size=400)


@pytest.mark.parametrize("hparams", [EASY_HPARAMS, HARD_HPARAMS])
def test_slq_within_one_percent(data, hparams):
    model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(hparams, data)
    exact = model.exact_nmll(hparams, data)
    approx = model.approximate_nmll(hparams, data,
                                    manual_settings={"max_rank": 256})
    assert abs(approx - exact) / abs(exact) < 0.01
