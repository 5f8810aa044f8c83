"""SORF / conv / SRHT op tests against pure-numpy oracles, sweeping the
reference suite's odd shapes (10x50, 3x2003, 11x1076, 231x856 — the
last pads to 1024 like /root/reference/tests/fht_operations_tests/
test_rbf_rfgen.py:45 — plus 231x56; freq counts below, equal to and
above the padded dim)."""
import sys
import os
import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu.ops.hadamard import next_pow2
from xgpr_tpu.ops.sorf import (rbf_feature_map, rbf_feature_map_grad,
                               srht_rows)
from xgpr_tpu.ops.conv import conv_rbf_features, conv_maxpool_features
from xgpr_tpu.utils import rng as state_rng
from utils.oracle import (oracle_rbf_features, oracle_conv_rbf_features,
                          oracle_conv_maxpool_features, oracle_srht)

from math import ceil


def _make_state(seed, d, num_freqs):
    padded = next_pow2(d)
    nblocks = max(1, ceil(num_freqs / padded))
    radem = state_rng.radem_diagonals(seed, nblocks, padded, np.float64)
    chi = state_rng.chi_scaling(seed, padded, num_freqs, np.float64)
    return radem, chi


@pytest.mark.parametrize("n,d,num_freqs", [
    (10, 50, 32), (10, 50, 64), (10, 50, 1000),
    (3, 2003, 128), (11, 1076, 1024), (231, 56, 4096),
    (231, 856, 2000), (231, 856, 8192),
])
def test_rbf_features_vs_oracle(n, d, num_freqs):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((n, d))
    radem, chi = _make_state(123, d, num_freqs)
    sigma = 0.36
    for intercept in (True, False):
        expected = oracle_rbf_features(x, radem, chi, sigma, intercept)
        got = rbf_feature_map(jnp.asarray(x) * sigma, jnp.asarray(radem),
                              jnp.asarray(chi), intercept)
        if intercept:
            got = got.at[:, 0].set(1.0)
        assert np.allclose(np.asarray(got), expected, rtol=1e-7, atol=1e-7)


def test_rbf_grad_matches_numerical():
    rng = np.random.default_rng(7)
    n, d, num_freqs = 9, 33, 128
    x = rng.standard_normal((n, d))
    radem, chi = _make_state(5, d, num_freqs)
    sigma = 0.73
    eps = 1e-6
    feats, grad = rbf_feature_map_grad(jnp.asarray(x), jnp.asarray(radem),
                                       jnp.asarray(chi), sigma, False)
    up = oracle_rbf_features(x, radem, chi, sigma + eps, False)
    dn = oracle_rbf_features(x, radem, chi, sigma - eps, False)
    num_grad = (up - dn) / (2 * eps)
    assert np.allclose(np.asarray(grad[:, :, 0]), num_grad, rtol=1e-4,
                       atol=1e-6)
    expected = oracle_rbf_features(x, radem, chi, sigma, False)
    assert np.allclose(np.asarray(feats), expected, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("n,l,d,width,num_freqs,scaling", [
    (5, 12, 4, 3, 64, 0), (5, 12, 4, 3, 64, 1), (5, 12, 4, 3, 64, 2),
    (4, 37, 21, 9, 500, 0), (3, 8, 2, 1, 32, 0),
])
def test_conv_rbf_vs_oracle(n, l, d, width, num_freqs, scaling):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((n, l, d))
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi = _make_state(77, width * d, num_freqs)
    sigma = 0.52
    expected = oracle_conv_rbf_features(x, seq_len, radem, chi, sigma,
                                        width, scaling)
    got = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                            jnp.asarray(radem), jnp.asarray(chi), sigma,
                            width, scaling, block_size=5)
    assert np.allclose(np.asarray(got), expected, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n,l,d,width,num_freqs,scaling", [
    (5, 12, 4, 3, 64, 1), (4, 37, 21, 9, 500, 0), (3, 8, 2, 1, 96, 2),
])
def test_conv_rbf_parts_assemble_to_features(n, l, d, width, num_freqs,
                                             scaling):
    """The layout-free (cos, sin) parts, assembled into the canonical
    block layout, must equal the canonical conv features exactly."""
    from xgpr_tpu.ops.layout import assemble_cos_sin
    rng = np.random.default_rng(23)
    x = rng.standard_normal((n, l, d))
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi = _make_state(77, width * d, num_freqs)
    sigma = 0.52
    feats = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                              jnp.asarray(radem), jnp.asarray(chi), sigma,
                              width, scaling, block_size=5)
    c, s = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                             jnp.asarray(radem), jnp.asarray(chi), sigma,
                             width, scaling, block_size=5, parts=True)
    assembled = assemble_cos_sin(c, s, radem.shape[-1])
    assert np.array_equal(np.asarray(assembled), np.asarray(feats))


def test_conv_kernel_parts_fn_matches_feature_fn():
    """Kernel-level parts fn (incl. intercept overwrite and the dense
    projection path) must reproduce pure_feature_fn under assembly."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    from xgpr_tpu.ops.layout import assemble_cos_sin
    rng = np.random.default_rng(31)
    n, l, d, width = 7, 15, 6, 4
    x = jnp.asarray(rng.standard_normal((n, l, d)))
    slen = jnp.asarray(rng.integers(width, l + 1, size=(n,)),
                       dtype=jnp.int32)
    for intercept in (True, False):
        kern = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
            (n, l, d), 256, 123, double_precision=True,
            kernel_spec_parms={"conv_width": width,
                               "intercept": intercept})
        kern.set_hyperparams(np.log(np.array([0.1, 0.8])))
        params = kern.feature_params()
        feats = kern.pure_feature_fn()(params, x, slen)
        c, s = kern.pure_feature_parts_fn()(params, x, slen)
        assembled = assemble_cos_sin(c, s, kern.padded_dims)
        assert np.array_equal(np.asarray(assembled), np.asarray(feats))
        cos_pos, sin_pos = kern.feature_positions()
        rebuilt = np.zeros_like(np.asarray(feats))
        rebuilt[:, cos_pos] = np.asarray(c)
        rebuilt[:, sin_pos] = np.asarray(s)
        assert np.array_equal(rebuilt, np.asarray(feats))


def test_conv_rbf_grad_matches_numerical():
    rng = np.random.default_rng(3)
    n, l, d, width, num_freqs = 4, 10, 3, 3, 32
    x = rng.standard_normal((n, l, d))
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi = _make_state(9, width * d, num_freqs)
    sigma = 0.9
    eps = 1e-6
    feats, grad = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                                    jnp.asarray(radem), jnp.asarray(chi),
                                    sigma, width, 0, block_size=4,
                                    with_grad=True)
    up = oracle_conv_rbf_features(x, seq_len, radem, chi, sigma + eps,
                                  width, 0)
    dn = oracle_conv_rbf_features(x, seq_len, radem, chi, sigma - eps,
                                  width, 0)
    num_grad = (up - dn) / (2 * eps)
    assert np.allclose(np.asarray(grad[:, :, 0]), num_grad, rtol=1e-4,
                       atol=1e-6)


def test_conv_maxpool_vs_oracle():
    rng = np.random.default_rng(19)
    n, l, d, width, num_freqs = 6, 14, 5, 4, 128
    x = rng.standard_normal((n, l, d))
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi = _make_state(33, width * d, num_freqs)
    expected = oracle_conv_maxpool_features(x, seq_len, radem, chi, width)
    got = conv_maxpool_features(jnp.asarray(x), jnp.asarray(seq_len),
                                jnp.asarray(radem), jnp.asarray(chi),
                                width, block_size=3)
    assert np.allclose(np.asarray(got), expected, rtol=1e-6, atol=1e-7)


def test_srht_vs_oracle():
    rng = np.random.default_rng(4)
    n, d, comp = 13, 300, 64
    x = rng.standard_normal((n, d))
    radem, idx = state_rng.srht_state(123, d, comp, np.float64)
    expected = oracle_srht(x, radem, idx)
    got = srht_rows(jnp.asarray(x), jnp.asarray(radem), jnp.asarray(idx))
    assert np.allclose(np.asarray(got), expected, rtol=1e-7, atol=1e-8)
