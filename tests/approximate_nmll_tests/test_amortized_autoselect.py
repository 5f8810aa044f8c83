"""The amortized NMLL preconditioner (rank cached across repeated
approximate_nmll calls, as scipy.optimize makes during tuning) must give
the same answers as the reference's per-call full autoselect
(xgp_regression.py:330-333): still within 1% of exact NMLL, and the
cache must invalidate whenever the kernel is rebuilt."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data

HPARAMS_A = np.array([-1.7908995, -3.9549678])
HPARAMS_B = np.array([-1.6, -3.7])  # a nearby tuner iterate


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), _ = tabular_data()
    return build_regression_dataset(trx, tr_y, chunk_size=400)


def test_amortized_autoselect_matches_exact(data):
    model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS_A, data)

    assert model._nmll_rank_cache is None
    approx_a = model.approximate_nmll(HPARAMS_A, data)
    first_rank = model._nmll_rank_cache
    assert first_rank is not None

    # Second call (a nearby tuner iterate) hits the cache and must still
    # land within the reference's 1%-of-exact gate.
    approx_b = model.approximate_nmll(HPARAMS_B, data)
    assert model._nmll_rank_cache is not None
    exact_a = model.exact_nmll(HPARAMS_A, data)
    exact_b = model.exact_nmll(HPARAMS_B, data)
    assert abs(approx_a - exact_a) / abs(exact_a) < 0.01
    assert abs(approx_b - exact_b) / abs(exact_b) < 0.01

    # Cache-hit path must agree with a fresh model's full autoselect.
    fresh = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    fresh.set_hyperparams(HPARAMS_B, data)
    approx_fresh = fresh.approximate_nmll(HPARAMS_B, data)
    assert abs(approx_b - approx_fresh) / abs(approx_fresh) < 0.01


def test_manual_settings_bypass_cache(data):
    """manual_settings pins the rank explicitly (xgp_regression.py:277-302)
    and must neither read nor write the autoselect cache."""
    model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS_A, data)
    model.approximate_nmll(HPARAMS_A, data,
                           manual_settings={"max_rank": 256})
    assert model._nmll_rank_cache is None


def test_rank_cache_invalidation(data):
    model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS_A, data)
    model.approximate_nmll(HPARAMS_A, data)
    assert model._nmll_rank_cache is not None
    model.num_rffs = 2048  # kernel rebuild must drop the cached rank
    assert model._nmll_rank_cache is None
