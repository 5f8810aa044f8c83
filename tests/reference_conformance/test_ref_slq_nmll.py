"""Conformance: SLQ approximate NMLL within 1% of exact on the
reference's shipped data.

Mirrors /root/reference/tests/approximate_nmll_tests/test_slq_nmll.py --
2100 RFFs, 'easy' hyperparams [0, 1] and 'hard' hyperparams [ln 1e-3, 1],
|approx - exact| / exact < 1% (:19-74).  Thresholds unmodified.
"""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import (requires_reference_data,
                                  reference_dataset, SLQ_EASY_HPARAMS,
                                  SLQ_HARD_HPARAMS)

pytestmark = requires_reference_data

ERROR_MARGIN_PCT = 1.0


@pytest.mark.parametrize("hyperparams", [SLQ_EASY_HPARAMS,
                                         SLQ_HARD_HPARAMS],
                         ids=["easy", "hard"])
def test_slq_nmll_within_one_percent(hyperparams):
    dset = reference_dataset(conv=False)
    model = GPRegression(num_rffs=2100, variance_rffs=12,
                         kernel_choice="RBF", verbose=False,
                         random_seed=123,
                         kernel_settings={"intercept": True})
    exact = model.exact_nmll(hyperparams, dset)
    approx = model.approximate_nmll(hyperparams, dset)
    assert 100.0 * abs(approx - exact) / exact < ERROR_MARGIN_PCT
