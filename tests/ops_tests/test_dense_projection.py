"""The dense-projection fast path must agree with the structured SORF
path to floating-point accuracy (same math, different evaluation order)."""
import sys
import os
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from math import ceil
from xgpr_tpu.ops.hadamard import next_pow2
from xgpr_tpu.ops.sorf import (rbf_feature_map, rbf_feature_map_dense,
                               rbf_feature_map_grad,
                               rbf_feature_map_dense_grad,
                               dense_sorf_projection)
from xgpr_tpu.ops.conv import conv_rbf_features
from xgpr_tpu.utils import rng as state_rng


def _state(seed, d, num_freqs):
    padded = next_pow2(d)
    nblocks = max(1, ceil(num_freqs / padded))
    radem = jnp.asarray(
        state_rng.radem_diagonals(seed, nblocks, padded, np.float64))
    chi = jnp.asarray(
        state_rng.chi_scaling(seed, padded, num_freqs, np.float64))
    return radem, chi, padded


def test_rbf_dense_equals_structured():
    rng = np.random.default_rng(0)
    for d, f in [(84, 512), (84, 64), (300, 1000)]:
        x = jnp.asarray(rng.standard_normal((17, d)))
        radem, chi, padded = _state(5, d, f)
        proj = dense_sorf_projection(radem, chi, d)
        a = rbf_feature_map(x * 0.4, radem, chi, False)
        b = rbf_feature_map_dense(x * 0.4, proj, False, padded)
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                           atol=1e-10)


def test_rbf_dense_grad_equals_structured():
    rng = np.random.default_rng(1)
    d, f = 50, 256
    x = jnp.asarray(rng.standard_normal((9, d)))
    radem, chi, padded = _state(7, d, f)
    proj = dense_sorf_projection(radem, chi, d)
    fa, ga = rbf_feature_map_grad(x, radem, chi, 0.7, False)
    fb, gb = rbf_feature_map_dense_grad(x, proj, 0.7, False, padded)
    assert np.allclose(np.asarray(fa), np.asarray(fb), rtol=1e-9)
    assert np.allclose(np.asarray(ga), np.asarray(gb), rtol=1e-9,
                       atol=1e-10)


def test_conv_dense_equals_structured():
    rng = np.random.default_rng(2)
    n, l, d, w, f = 6, 15, 7, 4, 128
    x = jnp.asarray(rng.standard_normal((n, l, d)))
    slen = jnp.asarray(rng.integers(w, l + 1, size=(n,)).astype(np.int32))
    radem, chi, padded = _state(9, w * d, f)
    proj = dense_sorf_projection(radem, chi, w * d)
    a = conv_rbf_features(x, slen, radem, chi, 0.5, w, 0, block_size=4)
    b = conv_rbf_features(x, slen, radem, chi, 0.5, w, 0, block_size=4,
                          proj=proj)
    assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-9,
                       atol=1e-10)
