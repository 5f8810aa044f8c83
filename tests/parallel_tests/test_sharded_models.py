"""Full model API in forced-sharded mode: fit/tune/predict must work and
match single-engine results on the virtual 8-device mesh."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, GPClassification, \
    build_regression_dataset, build_classification_dataset
from xgpr_tpu import config as xconfig
from utils.synthetic import tabular_data, classification_data, spearman

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture
def sharded_mode():
    xconfig.set_engine_mode("sharded")
    yield
    xconfig.set_engine_mode("auto")


def test_sharded_regression_matches_single(sharded_mode):
    (trx, tr_y), (tex, te_y) = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)

    m_sharded = GPRegression(num_rffs=1024, variance_rffs=64,
                             kernel_choice="RBF", verbose=False)
    m_sharded.set_hyperparams(HPARAMS, dset)
    m_sharded.fit(dset, mode="cg", tol=1e-8)
    p_sharded, v_sharded = m_sharded.predict(tex, get_var=True)

    xconfig.set_engine_mode("single")
    m_single = GPRegression(num_rffs=1024, variance_rffs=64,
                            kernel_choice="RBF", verbose=False)
    m_single.set_hyperparams(HPARAMS, dset)
    m_single.fit(dset, mode="cg", tol=1e-8)
    p_single, v_single = m_single.predict(tex, get_var=True)

    assert np.allclose(p_sharded, p_single, rtol=1e-6, atol=1e-8)
    assert np.allclose(v_sharded, v_single, rtol=1e-5, atol=1e-9)


def test_sharded_classification(sharded_mode):
    (trx, tr_y), (tex, te_y) = classification_data(n_train=600)
    dset = build_classification_dataset(trx, tr_y, chunk_size=100)
    model = GPClassification(num_rffs=256, kernel_choice="RBF",
                             verbose=False)
    model.set_hyperparams(np.log(np.array([0.1, 0.2])), dset)
    model.fit(dset, max_iter=50)
    probs = model.predict(tex)
    acc = float((np.argmax(probs, axis=1) == te_y).mean())
    assert acc > 0.75


def test_sharded_tuning(sharded_mode):
    (trx, tr_y), _ = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    hparams, _, score = model.tune_hyperparams_crude(dset,
                                                     max_bayes_iter=12)
    assert np.isfinite(score)
    approx = model.approximate_nmll(hparams, dset,
                                    manual_settings={"max_rank": 128})
    exact = model.exact_nmll(hparams, dset)
    assert abs(approx - exact) / abs(exact) < 0.01
