"""Conformance: all three scipy tuning methods reach the reference's
NMLL bar on its shipped data.

Mirrors /root/reference/tests/tuning_tests/test_tuning.py -- RBF at 512
RFFs, starting point [0, 0], n_restarts=1: Nelder-Mead, Powell and
L-BFGS-B (exact NMLL) must all reach best score < 430 (:40).  The crude
tuner must clear the same bar (test_crude_tuning.py:15-28).  Thresholds
unmodified.
"""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import requires_reference_data, reference_dataset

pytestmark = requires_reference_data

NMLL_BAR = 430.0


def _model():
    return GPRegression(num_rffs=512, variance_rffs=12,
                        kernel_choice="RBF", verbose=False,
                        random_seed=123,
                        kernel_settings={"intercept": True})


@pytest.mark.parametrize("tuning_method,max_iter",
                         [("Nelder-Mead", 100), ("Powell", 100),
                          ("L-BFGS-B", 100)])
def test_scipy_tuning_reaches_bar(tuning_method, max_iter):
    dset = reference_dataset(conv=False)
    model = _model()
    _, niter, best_score = model.tune_hyperparams(
        dset, tuning_method=tuning_method, n_restarts=1,
        starting_hyperparams=np.array([0.0, 0.0]), max_iter=max_iter,
        nmll_method="exact")
    assert best_score < NMLL_BAR


def test_crude_tuning_reaches_bar():
    dset = reference_dataset(conv=False)
    model = _model()
    _, _, best_score = model.tune_hyperparams_crude(dset)
    assert best_score < NMLL_BAR
