"""Smoke tests for KernelFGen and FastConv1d (reference:
tests/auxiliary_tests/test_auxiliary_modules.py:24-50,
static_layer_tests/)."""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import KernelFGen, FastConv1d


def test_kernel_fgen_rbf():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 30))
    fgen = KernelFGen(num_rffs=256, hyperparams=np.array([0.0]),
                      num_features=30, kernel_choice="RBF", verbose=False)
    feats = fgen.predict(x, chunk_size=20)
    assert feats.shape == (64, 256)
    # intercept is forced off for auxiliary tools
    assert not np.allclose(feats[:, 0], 1.0)


def test_kernel_fgen_conv():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 20, 12))
    slen = rng.integers(9, 21, size=(16,)).astype(np.int32)
    fgen = KernelFGen(num_rffs=128, hyperparams=np.array([0.0]),
                      num_features=12, kernel_choice="Conv1dRBF",
                      kernel_settings={"conv_width": 9}, verbose=False)
    feats = fgen.predict(x, slen)
    assert feats.shape == (16, 128)


def test_fast_conv1d():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 18, 8))
    slen = rng.integers(9, 19, size=(32,)).astype(np.int32)
    layer = FastConv1d(seq_width=8, conv_width=9, num_features=256)
    feats = layer.predict(x, slen)
    assert feats.shape == (32, 256)
    assert np.all(feats >= 0)  # ReLU-like: maxpool against zero init
