"""approximate_nmll must degrade gracefully under the optimizer.

The reference's exact path returns DEFAULT_SCORE_IF_PROBLEM on singular
design matrices instead of raising (xgp_regression.py:182-201) so one bad
hyperparameter point cannot kill a long scipy.optimize tune.  The
approximate path must honor the same contract: preconditioner, CG or SLQ
failures become a sentinel score, never an exception.
"""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset, constants
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), _ = tabular_data(n_train=900, n_test=100)
    return build_regression_dataset(trx, tr_y, chunk_size=300)


def test_preconditioner_failure_returns_sentinel(data, monkeypatch):
    from xgpr_tpu.models import baseclass as bc

    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, data)

    def explode(*a, **k):
        raise np.linalg.LinAlgError("synthetic preconditioner failure")

    monkeypatch.setattr(bc, "NystromPreconditioner", explode)
    with pytest.warns(UserWarning):
        score = model.approximate_nmll(HPARAMS, data)
    assert score == constants.DEFAULT_SCORE_IF_PROBLEM
    # The failure must not leave a poisoned rank cache behind.
    assert model._nmll_rank_cache is None


def test_slq_failure_returns_sentinel(data, monkeypatch):
    from xgpr_tpu.scoring import slq

    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, data)

    def explode(*a, **k):
        raise FloatingPointError("SLQ: no usable probe sequences.")

    monkeypatch.setattr(slq, "estimate_logdet", explode)
    with pytest.warns(UserWarning):
        score = model.approximate_nmll(HPARAMS, data)
    assert score == constants.DEFAULT_SCORE_IF_PROBLEM


def test_tune_survives_degenerate_point(data, monkeypatch):
    """A short approximate-NMLL tune whose cost function fails at some
    iterates must complete and return finite hyperparameters."""
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)

    real_inner = GPRegression._approximate_nmll_inner
    calls = {"n": 0}

    def flaky(self, dataset, manual_settings=None):
        calls["n"] += 1
        if calls["n"] % 2 == 0:  # every other iterate "degenerates"
            raise FloatingPointError("synthetic degenerate point")
        return real_inner(self, dataset, manual_settings)

    monkeypatch.setattr(GPRegression, "_approximate_nmll_inner", flaky)
    hparams, n_feval, best = model.tune_hyperparams(
        data, max_iter=6, tuning_method="Nelder-Mead",
        nmll_method="approximate", starting_hyperparams=HPARAMS)
    assert np.all(np.isfinite(hparams))
    assert best < constants.DEFAULT_SCORE_IF_PROBLEM
    assert calls["n"] >= 2
