"""Conformance: the reference's complete-pipeline gates on its shipped
data with its own per-kernel Spearman floors.

Mirrors /root/reference/tests/complete_pipeline_tests/
test_current_kernels.py: tune at 512 RFFs (crude; L-BFGS-B for MiniARD),
preconditioned-CG fit at 8192 RFFs, exact fit at 2048 RFFs, then held-out
Spearman rho on the shipped test blocks must clear the floors from
current_kernel_list.py:15-22 -- Conv1dRBF 0.58, RBF 0.58, Matern 0.55,
Linear 0.53, MiniARD 0.64, GraphRBF 0.38.  Floors and protocol
unmodified.
"""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import (requires_reference_data,
                                  reference_dataset,
                                  spearman_vs_reference_testset)

pytestmark = requires_reference_data

# (kernel, is_conv, reference floor)
IMPLEMENTED_KERNELS = [
    ("Conv1dRBF", True, 0.58),
    ("RBF", False, 0.58),
    ("Matern", False, 0.55),
    ("Linear", False, 0.53),
    ("MiniARD", False, 0.64),
    ("GraphRBF", True, 0.38),
]

TRAINING_RFFS = 512
CG_FITTING_RFFS = 8192
EXACT_FITTING_RFFS = 2048


def _settings(kernel):
    settings = {"matern_nu": 5 / 2, "conv_width": 3,
                "split_points": [21, 42, 63], "intercept": True,
                "averaging": "none"}
    return settings


def _fit_and_evaluate(kernel, is_conv):
    train = reference_dataset(conv=is_conv, offline=True)
    model = GPRegression(num_rffs=TRAINING_RFFS, variance_rffs=12,
                         kernel_choice=kernel, verbose=False,
                         random_seed=123, kernel_settings=_settings(kernel))
    if kernel == "MiniARD":
        model.tune_hyperparams(train, n_restarts=1, tol=1e-2,
                               tuning_method="L-BFGS-B")
    else:
        model.tune_hyperparams_crude(train)

    model.num_rffs = CG_FITTING_RFFS
    model.fit(train, max_iter=500, tol=1e-6, mode="cg")
    cg_score = spearman_vs_reference_testset(model, conv=is_conv,
                                             get_var=True)

    model.num_rffs = EXACT_FITTING_RFFS
    model.fit(train, mode="exact")
    exact_score = spearman_vs_reference_testset(model, conv=is_conv,
                                                get_var=True)
    return cg_score, exact_score


@pytest.mark.parametrize("kernel,is_conv,floor", IMPLEMENTED_KERNELS)
def test_pipeline_clears_reference_floor(kernel, is_conv, floor):
    cg_score, exact_score = _fit_and_evaluate(kernel, is_conv)
    print(f"{kernel}: CG {cg_score:.4f}, exact {exact_score:.4f}, "
          f"floor {floor}")
    assert cg_score > floor
    assert exact_score > floor
