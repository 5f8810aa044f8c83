"""Checkpoint round-trip: a saved+loaded model must predict identically."""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, GPClassification, \
    build_regression_dataset, build_classification_dataset
from xgpr_tpu.models.serialization import save_model, load_model
from utils.synthetic import tabular_data, classification_data

HPARAMS = np.array([-1.7908995, -3.9549678])


def test_regression_roundtrip(tmp_path):
    (trx, tr_y), (tex, _) = tabular_data(n_train=600)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=512, variance_rffs=64,
                         kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    model.fit(dset, mode="exact")
    p1, v1 = model.predict(tex, get_var=True)

    path = tmp_path / "model.npz"
    save_model(model, path)
    loaded = load_model(path)
    p2, v2 = loaded.predict(tex, get_var=True)
    assert np.allclose(p1, p2)
    assert np.allclose(v1, v2)


def test_classification_roundtrip(tmp_path):
    (trx, tr_y), (tex, _) = classification_data(n_train=400)
    dset = build_classification_dataset(trx, tr_y, chunk_size=200)
    model = GPClassification(num_rffs=256, kernel_choice="RBF",
                             verbose=False)
    model.set_hyperparams(np.log(np.array([0.1, 0.2])), dset)
    model.fit(dset, max_iter=30)
    p1 = model.predict(tex)

    path = tmp_path / "clf.npz"
    save_model(model, path)
    loaded = load_model(path)
    assert np.allclose(p1, loaded.predict(tex))
