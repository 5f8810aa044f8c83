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


def test_rank_cache_keyed_by_dataset(data):
    """Switching datasets between calls must re-run the full autoselect
    rather than reuse a rank picked for different data: the cache stores
    a dataset identity token alongside the rank."""
    model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS_A, data)
    model.approximate_nmll(HPARAMS_A, data)
    token_a, rank_a = model._nmll_rank_cache

    rng = np.random.default_rng(7)
    trx = rng.standard_normal((900, data.get_xdim()[1]))
    tr_y = rng.standard_normal((900,))
    other = build_regression_dataset(trx, tr_y, chunk_size=400)
    approx_other = model.approximate_nmll(HPARAMS_A, other)
    token_b, _ = model._nmll_rank_cache
    assert token_b != token_a
    assert np.isfinite(approx_other)

    # A fresh model evaluating the second dataset directly must agree --
    # the switch cannot have left a stale under-provisioned rank behind.
    fresh = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    fresh.set_hyperparams(HPARAMS_A, other)
    approx_fresh = fresh.approximate_nmll(HPARAMS_A, other)
    assert abs(approx_other - approx_fresh) / abs(approx_fresh) < 0.01


def test_cache_hit_grows_until_ratio_met(data, monkeypatch):
    """When hyperparameters drift enough that the cached rank badly misses
    the ratio target, the cache-hit path must keep growing the rank (up to
    the hard cap) instead of accepting one +512 increment -- matching the
    reference autoselect's escalation to max_rank."""
    from xgpr_tpu.models import baseclass as bc

    model = GPRegression(num_rffs=1030, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS_A, data)
    # Seed the cache with a small rank as if an earlier easy iterate
    # selected it.
    ds_token = model._dataset_token(data)
    model._engine(data)  # initialize engine
    model._nmll_rank_cache = (ds_token, 128)

    built_ranks = []
    real_ctor = bc.NystromPreconditioner

    class RecordingPrecond(real_ctor):
        def __init__(self, engine, max_rank, *a, **k):
            built_ranks.append(max_rank)
            super().__init__(engine, max_rank, *a, **k)

    monkeypatch.setattr(bc, "NystromPreconditioner", RecordingPrecond)
    # An unreachable ratio target forces escalation all the way to the
    # hard cap (min(LARGEST_NMLL_MAX_RANK, num_rffs - 1) = 1029).
    precond = model._amortized_nmll_preconditioner(data, ratio_target=-1.0)
    assert built_ranks == [128, 640, 1029]
    assert precond.get_rank() == 1029
    assert model._nmll_rank_cache == (ds_token, 1029)
