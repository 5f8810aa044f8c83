"""Classification fit + predict gates (reference pattern: wine-dataset
classifier accuracy in its complete_pipeline / auxiliary tests)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPClassification, build_classification_dataset
from utils.synthetic import classification_data


@pytest.fixture(scope="module")
def data():
    (trx, tr_y), (tex, te_y) = classification_data()
    dset = build_classification_dataset(trx, tr_y, chunk_size=300)
    return dset, (tex, te_y)


def test_classifier_fit_accuracy(data):
    dset, (tex, te_y) = data
    model = GPClassification(num_rffs=512, kernel_choice="RBF",
                             verbose=False)
    model.set_hyperparams(np.log(np.array([0.1, 0.2])), dset)
    model.fit(dset, max_iter=100)
    probs = model.predict(tex)
    assert probs.shape == (tex.shape[0], 3)
    assert np.allclose(probs.sum(axis=1), 1.0, atol=1e-6)
    acc = float((np.argmax(probs, axis=1) == te_y).mean())
    assert acc > 0.8


def test_classifier_requires_fit(data):
    dset, (tex, _) = data
    model = GPClassification(num_rffs=128, kernel_choice="RBF",
                             verbose=False)
    with pytest.raises(RuntimeError):
        model.predict(tex)
