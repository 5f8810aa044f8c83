"""Conformance: reference preconditioner-quality gates on its shipped data.

Mirrors /root/reference/tests/preconditioner_tests/
test_preconditioner_calculations.py -- golden hyperparams
[-1.39209982, -1.00860899] at 4100 RFFs: rank-256 srht ratio < 0.3 (:34),
rank-256 srht_2 ratio < 0.4 (:56), and the sampled rank-64 ratio estimate
within 1.5x of the exact one (:80).  Thresholds unmodified.
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import (requires_reference_data,
                                  reference_dataset, PRECOND_HPARAM)

pytestmark = requires_reference_data


def _model():
    return GPRegression(num_rffs=4100, variance_rffs=12,
                        kernel_choice="RBF", verbose=False,
                        random_seed=123,
                        kernel_settings={"intercept": True})


def test_srht_ratio():
    dset = reference_dataset(conv=False)
    model = _model()
    model.set_hyperparams(PRECOND_HPARAM, dset)
    _, ratio = model.build_preconditioner(dset, max_rank=256,
                                          method="srht")
    assert ratio < 0.3


def test_srht2_ratio():
    dset = reference_dataset(conv=False)
    model = _model()
    model.set_hyperparams(PRECOND_HPARAM, dset)
    _, ratio = model.build_preconditioner(dset, max_rank=256,
                                          method="srht_2")
    assert ratio < 0.4


def test_sampled_ratio_estimate():
    dset = reference_dataset(conv=False)
    model = _model()
    model.set_hyperparams(PRECOND_HPARAM, dset)
    _, exact_ratio = model.build_preconditioner(dset, max_rank=64,
                                                method="srht")
    sampled_ratio = model._check_rank_ratio(dset, 0.5, max_rank=64)
    assert (sampled_ratio / exact_ratio) < 1.5
