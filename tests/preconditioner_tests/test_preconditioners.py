"""Preconditioner quality gates, mirroring the reference's
preconditioner_tests (ratio thresholds at rank 256; sampled estimator
within 1.5x of exact)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def model_and_data():
    (trx, tr_y), _ = tabular_data()
    dset = build_regression_dataset(trx, tr_y, chunk_size=400)
    model = GPRegression(num_rffs=4096, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    return model, dset


def test_srht_ratio(model_and_data):
    model, dset = model_and_data
    _, ratio = model.build_preconditioner(dset, max_rank=256,
                                          method="srht")
    assert ratio < 0.3


def test_srht2_ratio(model_and_data):
    model, dset = model_and_data
    _, ratio = model.build_preconditioner(dset, max_rank=256,
                                          method="srht_2")
    assert ratio < 0.4


def test_sampled_ratio_estimator(model_and_data):
    """The subsampled estimator must land within 1.5x of the exact ratio
    (test_preconditioner_calculations.py:80)."""
    model, dset = model_and_data
    _, exact_ratio = model.build_preconditioner(dset, max_rank=256,
                                                method="srht")
    est_ratio = model._check_rank_ratio(dset, sample_frac=0.4,
                                        max_rank=256)
    assert est_ratio < 1.5 * exact_ratio + 1e-10
    assert exact_ratio < 10 * est_ratio + 1e-10


def test_state_roundtrip(model_and_data, tmp_path):
    """A to_state/from_state roundtrip through an .npz must reproduce
    every solver-facing action of the preconditioner exactly (this is
    what lets a crashed long fit resume without rebuilding)."""
    import numpy as np
    from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
    model, dset = model_and_data
    precond, _ = model.build_preconditioner(dset, max_rank=256,
                                            method="srht_2")
    path = tmp_path / "precond.npz"
    np.savez(path, **precond.to_state())
    reborn = NystromPreconditioner.from_state(np.load(path))

    rng = np.random.default_rng(7)
    v = rng.standard_normal((precond.u_mat.shape[0], 3))
    for method in ("batch_matvec", "rev_batch_matvec",
                   "matvec_for_sampling"):
        a = np.asarray(getattr(precond, method)(v))
        b = np.asarray(getattr(reborn, method)(v))
        assert np.array_equal(a, b), method
    assert reborn.get_rank() == precond.get_rank()
    assert np.isclose(reborn.get_logdet(), precond.get_logdet())
    assert np.allclose(np.asarray(reborn.get_zty()),
                       np.asarray(precond.get_zty()))
    assert np.isclose(reborn.get_yty(), precond.get_yty())
    assert np.isclose(reborn.achieved_ratio, precond.achieved_ratio)
