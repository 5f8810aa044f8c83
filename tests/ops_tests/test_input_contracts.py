"""Variable-length input contracts (reference:
tests/fht_operations_tests/test_variable_length_seq_handling.py:39-97)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS


def _kernel():
    return KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (8, 12, 4), 64, 123, kernel_spec_parms={"conv_width": 5})


def test_valid_variable_lengths_pass():
    k = _kernel()
    k.set_hyperparams(np.zeros(2))
    x = np.random.default_rng(0).standard_normal((8, 12, 4))
    slen = np.array([5, 6, 7, 8, 9, 10, 11, 12], dtype=np.int32)
    feats = k.transform_x(x, slen)
    assert feats.shape == (8, 64)


def test_short_sequence_raises():
    k = _kernel()
    k.set_hyperparams(np.zeros(2))
    x = np.random.default_rng(0).standard_normal((8, 12, 4))
    slen = np.array([4] + [12] * 7, dtype=np.int32)  # 4 < conv_width
    with pytest.raises(RuntimeError):
        k.transform_x(x, slen)


def test_overlong_length_raises():
    k = _kernel()
    k.set_hyperparams(np.zeros(2))
    x = np.random.default_rng(0).standard_normal((8, 12, 4))
    slen = np.array([13] + [12] * 7, dtype=np.int32)
    with pytest.raises(RuntimeError):
        k.transform_x(x, slen)


def test_feature_dim_mismatch_raises():
    k = _kernel()
    k.set_hyperparams(np.zeros(2))
    x = np.random.default_rng(0).standard_normal((8, 12, 5))
    slen = np.full(8, 12, dtype=np.int32)
    with pytest.raises(RuntimeError):
        k.transform_x(x, slen)
