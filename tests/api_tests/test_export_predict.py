"""export_predict_fn: the exported pure function + state pytree must
reproduce model.predict exactly, survive jit/vmap, and round-trip through
flattened arrays (the serving contract).
"""
import sys
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import (GPRegression, GPClassification,
                      build_regression_dataset,
                      build_classification_dataset)
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


def test_regression_export_matches_predict():
    (trx, tr_y), (tex, _) = tabular_data(n_train=900, n_test=200)
    data = build_regression_dataset(trx, tr_y, chunk_size=300)
    model = GPRegression(num_rffs=256, variance_rffs=32,
                         kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, data)
    model.fit(data, mode="exact")

    fn, state = model.export_predict_fn(get_var=True)
    mean, var = jax.jit(fn)(state, jnp.asarray(tex), None)
    p_ref, v_ref = model.predict(tex, get_var=True)
    assert np.allclose(np.asarray(mean), p_ref, rtol=1e-9, atol=1e-11)
    assert np.allclose(np.asarray(var), v_ref, rtol=1e-8, atol=1e-11)

    # The exported fn is pure: flatten/unflatten the state and get the
    # same numbers (nothing hidden on the model object).
    leaves, treedef = jax.tree.flatten(state)
    state2 = jax.tree.unflatten(treedef, [np.asarray(l) for l in leaves])
    mean2 = jax.jit(fn)(state2, jnp.asarray(tex), None)[0]
    assert np.allclose(np.asarray(mean2), p_ref, rtol=1e-9, atol=1e-11)


def test_regression_export_requires_fit():
    model = GPRegression(num_rffs=64, kernel_choice="RBF", verbose=False)
    with pytest.raises(RuntimeError):
        model.export_predict_fn()


def test_classification_export_matches_predict():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((600, 10))
    w = rng.standard_normal((10, 3))
    y = np.argmax(x @ w + 0.1 * rng.standard_normal((600, 3)), axis=1)
    data = build_classification_dataset(x, y, chunk_size=150)
    model = GPClassification(num_rffs=128, kernel_choice="RBF",
                             verbose=False)
    model.set_hyperparams(np.array([-1.0, -1.0]), data)
    model.fit(data, min_rank=32, max_rank=64)

    fn, state = model.export_predict_fn()
    probs = jax.jit(fn)(state, jnp.asarray(x[:100]), None)
    p_ref = model.predict(x[:100])
    assert np.allclose(np.asarray(probs), p_ref, rtol=1e-9, atol=1e-12)
