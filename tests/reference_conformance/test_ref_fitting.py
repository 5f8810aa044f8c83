"""Conformance: the reference's own CG-fit gates on its shipped data.

Mirrors /root/reference/tests/fitting_tests/test_cg_fit.py -- golden
hyperparams HPARAM = [ln sqrt(0.0767), ln 0.358], 4096 RFFs, rank-256 srht
preconditioner, tol 1e-6 => MUST converge in under 10 iterations; same
bound with the autoselected preconditioner (test_cg_fit.py:16-73).
Thresholds are the reference's, unmodified.
"""
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression
from utils.reference_data import (requires_reference_data,
                                  reference_dataset, CG_FIT_HPARAM)

NUM_RFFS = 4096

pytestmark = requires_reference_data


def _model():
    return GPRegression(num_rffs=NUM_RFFS, variance_rffs=12,
                        kernel_choice="RBF", verbose=False,
                        random_seed=123,
                        kernel_settings={"intercept": True})


def test_preconditioned_cg_converges_fast():
    dset = reference_dataset(conv=False)
    model = _model()
    model.set_hyperparams(CG_FIT_HPARAM, dset)
    preconditioner, _ = model.build_preconditioner(dset, max_rank=256,
                                                   method="srht")
    niter, _ = model.fit(dset, preconditioner=preconditioner,
                         max_iter=500, tol=1e-6, mode="cg",
                         run_diagnostics=True, suppress_var=True)
    assert niter < 10


def test_autoselect_cg_converges_fast():
    dset = reference_dataset(conv=False)
    model = _model()
    model.set_hyperparams(CG_FIT_HPARAM, dset)
    niter, _ = model.fit(dset, max_iter=500, tol=1e-6, mode="cg",
                         run_diagnostics=True, suppress_var=True)
    assert niter < 10


def test_offline_preconditioned_cg_converges_fast():
    """Same gate driven through the file-backed dataset over the
    reference's own .npy blocks (test_offline_cg_fit.py:27-52)."""
    dset = reference_dataset(conv=False, offline=True)
    model = _model()
    model.set_hyperparams(CG_FIT_HPARAM, dset)
    preconditioner, _ = model.build_preconditioner(dset, max_rank=256,
                                                   method="srht")
    niter, _ = model.fit(dset, preconditioner=preconditioner,
                         max_iter=500, tol=1e-6, mode="cg",
                         run_diagnostics=True, suppress_var=True)
    assert niter < 10
