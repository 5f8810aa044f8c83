"""The fused Pallas conv-parts kernel must reproduce the XLA window-scan
parts path up to fp32 roundoff (the bf16x3 projection and shared-reduction
sincos are the same math; only the loop structure differs).

Runs in interpret mode on CPU; the kernel math (im2col projection, poly
sincos, window masking, window-sum accumulation over the grid) is
identical to what runs compiled on the TPU.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from xgpr_tpu.ops.pallas.conv_pallas import (conv_parts_pallas,
                                             conv_parts_shapes_ok)
from xgpr_tpu.ops.conv import conv_rbf_features
from xgpr_tpu.ops.sorf import dense_sorf_projection
from xgpr_tpu.ops.hadamard import next_pow2
from xgpr_tpu.utils import rng as state_rng

from math import ceil


def _state(seed, wd, num_freqs):
    padded = next_pow2(wd)
    nblocks = max(1, ceil(num_freqs / padded))
    radem = state_rng.radem_diagonals(seed, nblocks, padded, np.float32)
    chi = state_rng.chi_scaling(seed, padded, num_freqs, np.float32)
    proj = dense_sorf_projection(jnp.asarray(radem), jnp.asarray(chi), wd)
    return radem, chi, proj


@pytest.mark.parametrize("n,l,d,width,num_freqs", [
    (24, 30, 21, 9, 256),     # n % RD != 0, nw % BW != 0
    (16, 40, 4, 3, 128),      # small wd
    (32, 24, 16, 2, 384),     # F not a power of two (3 x 128)
    (12, 20, 21, 9, 200),     # F not a multiple of 128 (padded tail)
    (8, 16, 8, 3, 1000),      # ragged F, multiple freq tiles
])
def test_conv_parts_pallas_matches_xla(n, l, d, width, num_freqs):
    rng = np.random.default_rng(hash((n, l, d, width)) % 2 ** 31)
    x = rng.standard_normal((n, l, d)).astype(np.float32)
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi, proj = _state(5, width * d, num_freqs)
    sigma = np.float32(0.61)

    assert conv_parts_shapes_ok(l - width + 1, width * d, num_freqs,
                                jnp.float32)
    c_p, s_p = conv_parts_pallas(jnp.asarray(x), jnp.asarray(seq_len),
                                 proj, sigma, width, num_freqs,
                                 interpret=True)
    # XLA reference path: unscaled parts = parts / base_scale.
    from xgpr_tpu.ops.sorf import rbf_norm_constant
    c_x, s_x = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                                 jnp.asarray(radem), jnp.asarray(chi),
                                 sigma, width, 0, parts=True, proj=proj)
    base = rbf_norm_constant(num_freqs, fit_intercept=False)
    c_x = np.asarray(c_x, np.float64) / base
    s_x = np.asarray(s_x, np.float64) / base
    tol = 3e-5 * max(1.0, np.abs(c_x).max(), np.abs(s_x).max())
    assert np.abs(np.asarray(c_p) - c_x).max() < tol
    assert np.abs(np.asarray(s_p) - s_x).max() < tol


def test_conv_parts_shape_gates():
    assert not conv_parts_shapes_ok(100, 189, 4096, jnp.float64)
    assert not conv_parts_shapes_ok(2, 189, 4096, jnp.float32)   # tiny nw
    assert not conv_parts_shapes_ok(100, 2048, 4096, jnp.float32)  # wd
    # Ragged frequency counts are padded internally and accepted.
    assert conv_parts_shapes_ok(100, 189, 200, jnp.float32)


def test_conv_kernel_forced_pallas_matches_xla_end_to_end():
    """Kernel-level: forced-pallas parts fn (intercept, averaging) equals
    the XLA parts fn."""
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    from xgpr_tpu import config as _cfg
    rng = np.random.default_rng(9)
    n, l, d, width = 12, 25, 8, 5
    x = jnp.asarray(rng.standard_normal((n, l, d)).astype(np.float32))
    slen = jnp.asarray(rng.integers(width, l + 1, size=(n,)),
                       dtype=jnp.int32)
    kern = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n, l, d), 256, 123,
        kernel_spec_parms={"conv_width": width, "averaging": "sqrt"})
    kern.set_hyperparams(np.log(np.array([0.1, 0.7])))
    params = {k: (v.astype(jnp.float32) if v.dtype.kind == "f" else v)
              for k, v in kern.feature_params().items()}

    c_x, s_x = kern.pure_feature_parts_fn()(params, x, slen)
    _cfg.set_conv_mode("pallas")
    try:
        c_p, s_p = kern.pure_feature_parts_fn()(params, x, slen)
        z_p = kern.pure_feature_fn()(params, x, slen)
    finally:
        _cfg.set_conv_mode("auto")
    tol = 3e-5
    assert np.abs(np.asarray(c_p) - np.asarray(c_x)).max() < tol
    assert np.abs(np.asarray(s_p) - np.asarray(s_x)).max() < tol
    # canonical features route through the same kernel + assembly
    from xgpr_tpu.ops.layout import assemble_cos_sin
    z_ref = assemble_cos_sin(c_p, s_p, kern.padded_dims)
    assert np.array_equal(np.asarray(z_p), np.asarray(z_ref))


def test_conv_maxpool_pallas_matches_xla():
    """Forced-pallas maxpool features (interpret mode) equal the XLA
    window-scan maxpool path."""
    from xgpr_tpu import config as _cfg
    from xgpr_tpu.ops.conv import conv_maxpool_features
    rng = np.random.default_rng(13)
    n, l, d, width, num_freqs = 20, 33, 10, 7, 256
    x = jnp.asarray(rng.standard_normal((n, l, d)).astype(np.float32))
    seq_len = jnp.asarray(rng.integers(width, l + 1, size=(n,)),
                          dtype=jnp.int32)
    radem, chi, proj = _state(21, width * d, num_freqs)
    got_x = conv_maxpool_features(x, seq_len, jnp.asarray(radem),
                                  jnp.asarray(chi), width, proj=proj)
    _cfg.set_conv_mode("pallas")
    try:
        got_p = conv_maxpool_features(x, seq_len, jnp.asarray(radem),
                                      jnp.asarray(chi), width, proj=proj)
    finally:
        _cfg.set_conv_mode("auto")
    ref = np.asarray(got_x)
    tol = 3e-5 * max(1.0, np.abs(ref).max())
    assert np.abs(np.asarray(got_p) - ref).max() < tol


def test_conv_parts_fast_sincos_mode():
    """Fast-sincos conv parts stay within the propagated fast-pair error
    of the exact XLA conv path."""
    from xgpr_tpu import config
    from xgpr_tpu.ops.sorf import rbf_norm_constant

    rng = np.random.default_rng(12)
    n, l, d, width, f = 16, 24, 21, 9, 256
    x = rng.standard_normal((n, l, d)).astype(np.float32)
    lengths = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi, proj = _state(7, width * d, f)
    sigma = np.float32(0.5)
    config.set_sincos_mode("fast")
    try:
        c, s = conv_parts_pallas(jnp.asarray(x), jnp.asarray(lengths),
                                 proj, sigma, width, f, interpret=True)
    finally:
        config.set_sincos_mode("auto")
    c_x, s_x = conv_rbf_features(jnp.asarray(x), jnp.asarray(lengths),
                                 jnp.asarray(radem), jnp.asarray(chi),
                                 sigma, width, 0, parts=True, proj=proj)
    base = rbf_norm_constant(f, fit_intercept=False)
    c_x = np.asarray(c_x, np.float64) / base
    s_x = np.asarray(s_x, np.float64) / base
    # window sums of <= nw elementwise errors of 4.1e-5 each
    nw = l - width + 1
    tol = 4.1e-5 * nw
    assert np.abs(np.asarray(c) - c_x).max() < tol
    assert np.abs(np.asarray(s) - s_x).max() < tol


@pytest.mark.parametrize("split", [True, False])
def test_conv_parts_split_schedule_matches_oracle(monkeypatch, split):
    """Both block schedules -- the default half-block MXU/VPU interleave
    and the plain single-block form -- must match the XLA oracle (the
    split only reorders work within a window block)."""
    from xgpr_tpu.ops.pallas import conv_pallas as cp
    monkeypatch.setattr(cp, "_SPLIT", split)
    n, l, d, width, num_freqs = 24, 30, 21, 9, 256
    rng = np.random.default_rng(6)
    x = rng.standard_normal((n, l, d)).astype(np.float32)
    seq_len = rng.integers(width, l + 1, size=(n,)).astype(np.int32)
    radem, chi, proj = _state(5, width * d, num_freqs)
    sigma = np.float32(0.61)
    c_p, s_p = conv_parts_pallas(jnp.asarray(x), jnp.asarray(seq_len),
                                 proj, sigma, width, num_freqs,
                                 interpret=True)
    from xgpr_tpu.ops.sorf import rbf_norm_constant
    c_x, s_x = conv_rbf_features(jnp.asarray(x), jnp.asarray(seq_len),
                                 jnp.asarray(radem), jnp.asarray(chi),
                                 sigma, width, 0, parts=True, proj=proj)
    base = rbf_norm_constant(num_freqs, fit_intercept=False)
    c_x = np.asarray(c_x, np.float64) / base
    s_x = np.asarray(s_x, np.float64) / base
    tol = 3e-5 * max(1.0, np.abs(c_x).max(), np.abs(s_x).max())
    assert np.abs(np.asarray(c_p) - c_x).max() < tol
    assert np.abs(np.asarray(s_p) - s_x).max() < tol
