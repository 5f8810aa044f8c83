"""Classifier on sequence (conv) kernels end to end."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPClassification, build_classification_dataset


def test_conv_classifier():
    rng = np.random.default_rng(0)
    n, l, d = 600, 16, 6
    x = rng.standard_normal((n, l, d))
    lengths = rng.integers(5, l + 1, size=(n,)).astype(np.int32)
    w = rng.standard_normal(d)
    score = np.zeros(n)
    for i in range(n):
        x[i, lengths[i]:] = 0
        score[i] = np.tanh(x[i, :lengths[i]] @ w).mean()
    y = (score > np.median(score)).astype(np.int64)

    dset = build_classification_dataset(x, y, sequence_lengths=lengths,
                                        chunk_size=150)
    clf = GPClassification(num_rffs=256, kernel_choice="Conv1dRBF",
                           kernel_settings={"conv_width": 3},
                           verbose=False)
    clf.set_hyperparams(np.log(np.array([0.1, 1.0])), dset)
    clf.fit(dset, max_iter=60)
    probs = clf.predict(x, sequence_lengths=lengths)
    acc = float((np.argmax(probs, axis=1) == y).mean())
    assert acc > 0.8
