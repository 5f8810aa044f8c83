"""SRHTCompressor public API (kernels/srht_compressor.py parity with the
reference's compressor semantics)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu.kernels import SRHTCompressor
from utils.oracle import oracle_srht


def test_compressor_matches_oracle():
    rng = np.random.default_rng(0)
    comp = SRHTCompressor(compression_size=32, input_size=100,
                          random_seed=7)
    x = rng.standard_normal((9, 100))
    got = np.asarray(comp.transform_x(x))
    expected = oracle_srht(x, comp._radem_np, comp._idx_np)
    assert got.shape == (9, 32)
    assert np.allclose(got, expected, rtol=1e-8)


def test_compressor_validates_input():
    comp = SRHTCompressor(compression_size=16, input_size=64)
    with pytest.raises(RuntimeError):
        comp.transform_x(np.zeros((4, 32)))
    with pytest.raises(RuntimeError):
        SRHTCompressor(compression_size=64, input_size=64)
    with pytest.raises(RuntimeError):
        SRHTCompressor(compression_size=1, input_size=64)
