"""Conformance: the documented speed presets must still clear the
reference's end-to-end pipeline floors on its shipped data.

The "balanced" (default) and "max" presets trade deterministic
per-feature accuracy for throughput (docs/speed_modes.md); "max" in
particular exceeds the reference's 1e-3 fp32 feature gate
(/root/reference/tests/fht_operations_tests/test_rbf_rfgen.py:104) at
~4e-3 relative.  The statistical contract is what matters for a GP on
random features, so this test enforces it where the reference enforces
its own: tune crude at 512 RFFs, preconditioned-CG fit at 8192 RFFs,
then held-out Spearman rho on the shipped test blocks must clear the
unmodified floors (current_kernel_list.py:15-22 -- RBF 0.58,
Conv1dRBF 0.58) under every preset.
"""
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from xgpr_tpu import config as cfg
from utils.reference_data import (requires_reference_data,
                                  reference_dataset,
                                  spearman_vs_reference_testset)

pytestmark = requires_reference_data

TRAINING_RFFS = 512
CG_FITTING_RFFS = 8192


@pytest.mark.parametrize("preset", ["balanced", "max"])
@pytest.mark.parametrize("kernel,is_conv,floor", [
    ("RBF", False, 0.58),
    ("Conv1dRBF", True, 0.58),
])
def test_preset_clears_reference_floor(preset, kernel, is_conv, floor):
    train = reference_dataset(conv=is_conv, offline=True)
    try:
        cfg.set_speed_preset(preset)
        model = GPRegression(
            num_rffs=TRAINING_RFFS, variance_rffs=12, kernel_choice=kernel,
            verbose=False, random_seed=123,
            kernel_settings={"conv_width": 3, "intercept": True,
                             "averaging": "none"})
        model.tune_hyperparams_crude(train)
        model.num_rffs = CG_FITTING_RFFS
        model.fit(train, max_iter=500, tol=1e-6, mode="cg")
        score = spearman_vs_reference_testset(model, conv=is_conv,
                                              get_var=True)
    finally:
        cfg.set_speed_preset("balanced")
    print(f"{kernel} @ {preset}: CG {score:.4f}, floor {floor}")
    assert score > floor
