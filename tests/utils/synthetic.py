"""Synthetic datasets with known GP-like structure for integration tests.

Plays the role of the reference's shipped tests/test_data fixtures (tabular
381x84 fp64 blocks + conv 381x4x21 variant): small enough for CPU test
runs, structured enough that tuned-GP Spearman floors and CG iteration
gates are meaningful.
"""
import numpy as np


def tabular_data(n_train=1800, n_test=400, n_features=84, noise=0.1,
                 seed=123):
    """Smooth nonlinear regression surface + noise on a fixed seed."""
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    x = rng.standard_normal((n, n_features))
    w1 = rng.standard_normal(n_features) / np.sqrt(n_features)
    w2 = rng.standard_normal(n_features) / np.sqrt(n_features)
    w3 = rng.standard_normal(n_features) / np.sqrt(n_features)
    y = (np.sin(2.0 * x @ w1) + (x @ w2) * np.cos(x @ w3)
         + 0.5 * np.tanh(x @ w1 * (x @ w2)))
    y = y + noise * rng.standard_normal(n)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:])


def sequence_data(n_train=600, n_test=200, max_len=24, n_features=21,
                  conv_width=9, noise=0.1, seed=123):
    """Variable-length sequences whose target depends on windowed content."""
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    x = rng.standard_normal((n, max_len, n_features))
    lengths = rng.integers(conv_width, max_len + 1,
                           size=(n,)).astype(np.int32)
    w = rng.standard_normal(n_features) / np.sqrt(n_features)
    y = np.zeros(n)
    for i in range(n):
        li = lengths[i]
        x[i, li:, :] = 0.0
        proj = x[i, :li, :] @ w
        y[i] = np.sin(proj).mean() + 0.3 * np.tanh(proj).max()
    y = y + noise * rng.standard_normal(n)
    return ((x[:n_train], y[:n_train], lengths[:n_train]),
            (x[n_train:], y[n_train:], lengths[n_train:]))


def classification_data(n_train=900, n_test=300, n_features=12,
                        n_classes=3, seed=123):
    """Linearly-ish separable classes with nonlinear boundaries."""
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    x = rng.standard_normal((n, n_features))
    centers = rng.standard_normal((n_classes, n_features)) * 1.5
    logits = x @ centers.T + 0.5 * np.sin(x[:, :1]) * \
        rng.standard_normal((1, n_classes))
    y = np.argmax(logits + 0.3 * rng.standard_normal((n, n_classes)),
                  axis=1).astype(np.int64)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:])


def spearman(a, b):
    from scipy.stats import spearmanr
    return float(spearmanr(a, b)[0])
