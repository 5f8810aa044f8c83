"""Convolution (k-mer) SORF feature ops for sequence and graph kernels.

Reference semantics (convolution_ops/rbf_convolution.cpp:22-153):
for each datapoint i with sequence length L_i, every k-mer window
j in [0, L_i - w] of the (L, D) input is flattened to a (w*D,) vector,
SORF-projected, and its cos/sin features are *accumulated* into the row's
output with a per-row scaling (none / 1/sqrt(n_kmers) / 1/n_kmers applied on
top of sqrt(1/F), rbf_convolution.cpp:41+96-112).  The maxpool variant
(conv1d_operations.cpp) replaces accumulation with an elementwise max against
a zero-initialised output (so it is implicitly ReLU-thresholded) and uses
h * chi directly (no cos/sin).

TPU-first design: rather than a per-row scalar loop, windows are processed in
blocks via lax.scan -- each step extracts a (N, BLK, w*D) slab with a dynamic
slice, SORF-projects it as a batch, masks windows beyond each row's sequence
length, and accumulates into the (N, 2F) output.  The window sum is
associative so the scan is exact; memory stays O(N * BLK * P + N * F).
"""
import numpy as np
import jax
import jax.numpy as jnp

from .hadamard import next_pow2
from .sorf import sorf_blocks, pad_rows, rbf_norm_constant
from ..config import matmul_precision as _matmul_precision

SCALING_NONE = 0
SCALING_SQRT = 1
SCALING_FULL = 2


def _window_block(x_flat: jnp.ndarray, start: jnp.ndarray, blk: int,
                  width: int, d: int):
    """Extract windows [start, start+blk) as a (N, blk, width*D) slab.

    x_flat is the (N, L*D) flattened input; window j covers columns
    [j*D, (j + width)*D).  The slab is gathered as one dynamic slice of
    (blk + width - 1) positions then re-windowed with static slicing.
    """
    n = x_flat.shape[0]
    span = (blk + width - 1) * d
    base = jax.lax.dynamic_slice(x_flat, (jnp.zeros((), jnp.int32),
                                          start * d), (n, span))
    base = base.reshape(n, blk + width - 1, d)
    # windows[:, j] = base[:, j:j+width] flattened
    wins = jnp.stack([base[:, j:j + width, :] for j in range(blk)], axis=1)
    return wins.reshape(n, blk, width * d)


def _num_kmers(seq_lengths: jnp.ndarray, width: int) -> jnp.ndarray:
    return seq_lengths.astype(jnp.int32) - width + 1


def _conv_project(x_flat: jnp.ndarray, start: jnp.ndarray, blk: int,
                  width: int, d: int, proj: jnp.ndarray) -> jnp.ndarray:
    """Project windows [start, start+blk) through proj as a VALID 1-d
    convolution: out[n, j, f] = sum_{t, c} x[n, start+j+t, c] *
    proj[t*d + c, f]."""
    n = x_flat.shape[0]
    span = (blk + width - 1) * d
    base = jax.lax.dynamic_slice(x_flat, (jnp.zeros((), jnp.int32),
                                          start * d), (n, span))
    base = base.reshape(n, blk + width - 1, d)
    kernel = proj.reshape(width, d, proj.shape[1])
    from ..config import feature_matmul_precision
    if feature_matmul_precision() == "default":
        return jax.lax.conv_general_dilated(
            base.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
    return jax.lax.conv_general_dilated(
        base, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=_matmul_precision())


def conv_rbf_features(x: jnp.ndarray, seq_lengths: jnp.ndarray,
                      radem: jnp.ndarray, chi: jnp.ndarray, sigma,
                      width: int, scaling_type: int = SCALING_NONE,
                      block_size: int = 32,
                      with_grad: bool = False,
                      proj: jnp.ndarray = None,
                      parts: bool = False):
    """Accumulated cos/sin conv-SORF features (optionally with d/dsigma).

    Args:
        x: (N, L, D) zero-padded sequences (NOT pre-scaled by sigma).
        seq_lengths: (N,) int sequence lengths (>= width).
        radem: (3, B, P) Rademacher diagonals, P = next_pow2(width * D).
        chi: (F,) chi-distributed scaling.
        sigma: lengthscale hyperparameter.
        width: convolution width w.
        scaling_type: 0 none / 1 sqrt / 2 full averaging
            (conv_kernel_baseclass.py:73-83).
        block_size: windows processed per scan step.
        with_grad: also return dz/dsigma of shape (N, 2F, 1).
        parts: return the scaled (cos, sin) parts -- each (N, F) in
            frequency order -- without the canonical layout assembly,
            for solvers that contract permutation-invariantly
            (fitting/fused_cg.matvec_parts).  Incompatible with
            with_grad.

    Returns:
        (N, 2F) features, or (features, dz_dsigma), or (cos, sin) parts.
    """
    n, l, d = x.shape
    num_freqs = chi.shape[0]
    num_windows = l - width + 1
    if num_windows < 1:
        raise ValueError("Sequence axis shorter than conv_width.")
    blk = min(block_size, num_windows)
    nsteps = -(-num_windows // blk)

    dtype = x.dtype
    sigma = jnp.asarray(sigma, dtype=dtype)
    x_flat = x.reshape(n, l * d)
    nk = _num_kmers(seq_lengths, width)

    base_scale = rbf_norm_constant(num_freqs, fit_intercept=False)
    if scaling_type == SCALING_SQRT:
        row_scale = base_scale / jnp.sqrt(nk.astype(dtype))
    elif scaling_type == SCALING_FULL:
        row_scale = base_scale / nk.astype(dtype)
    else:
        row_scale = jnp.full((n,), base_scale, dtype=dtype)

    def step(carry, start):
        if proj is not None:
            # TPU-native path: the k-mer projection IS a 1-d convolution
            # over the sequence axis with kernel proj reshaped to
            # (width, D, F) -- XLA lowers it onto the MXU with no window
            # materialisation.  chi is folded into proj.
            g = _conv_project(x_flat, start, blk, width, d, proj)
        else:
            wins = _window_block(x_flat, start, blk, width, d)
            g = sorf_blocks(
                pad_rows(wins.reshape(n * blk, -1), radem.shape[-1]),
                radem)
            g = g.reshape(n * blk, -1)[:, :num_freqs] * chi
            g = g.reshape(n, blk, num_freqs)
        arg = g * sigma
        # mask windows beyond this row's kmer count
        widx = start + jnp.arange(blk, dtype=jnp.int32)
        mask = (widx[None, :] < nk[:, None]).astype(dtype)[:, :, None]
        from .sincos import sincos
        cos_arg, sin_arg = sincos(arg)
        cosv = jnp.sum(cos_arg * mask, axis=1)
        sinv = jnp.sum(sin_arg * mask, axis=1)
        if with_grad:
            dcos = jnp.sum(-sin_arg * g * mask, axis=1)
            dsin = jnp.sum(cos_arg * g * mask, axis=1)
            acc_f, acc_g = carry
            acc_f = (acc_f[0] + cosv, acc_f[1] + sinv)
            acc_g = (acc_g[0] + dcos, acc_g[1] + dsin)
            return (acc_f, acc_g), None
        acc_f = carry
        return (acc_f[0] + cosv, acc_f[1] + sinv), None

    # Pad the sequence axis so the final block's dynamic slice stays in
    # bounds; windows past each row's kmer count are masked out anyway.
    needed = nsteps * blk + width - 1
    if needed > l:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, (needed - l) * d)))

    zeros = jnp.zeros((n, num_freqs), dtype=dtype)
    starts = jnp.arange(nsteps, dtype=jnp.int32) * blk

    if with_grad:
        if parts:
            raise ValueError("parts and with_grad are mutually exclusive")
        init = ((zeros, zeros), (zeros, zeros))
        (acc_f, acc_g), _ = jax.lax.scan(step, init, starts)
    else:
        acc_f, _ = jax.lax.scan(step, (zeros, zeros), starts)

    if parts:
        return (acc_f[0] * row_scale[:, None],
                acc_f[1] * row_scale[:, None])

    from .layout import assemble_cos_sin
    padded = radem.shape[-1]
    feats = assemble_cos_sin(acc_f[0], acc_f[1], padded) \
        * row_scale[:, None]
    if with_grad:
        grad = assemble_cos_sin(acc_g[0], acc_g[1], padded) \
            * row_scale[:, None]
        return feats, grad[:, :, None]
    return feats


def conv_maxpool_features(x: jnp.ndarray, seq_lengths: jnp.ndarray,
                          radem: jnp.ndarray, chi: jnp.ndarray,
                          width: int, block_size: int = 32,
                          proj: jnp.ndarray = None) -> jnp.ndarray:
    """ReLU + global-maxpool conv SORF features.

    Matches cpuConv1dMaxpool (conv1d_operations.cpp:22-168): output starts at
    zero and takes the elementwise max of h * chi over valid windows, so the
    result is max(0, max_j h_j * chi) per frequency -- no cos/sin.
    Output has num_freqs (not 2*num_freqs) columns.
    """
    n, l, d = x.shape
    num_freqs = chi.shape[0]
    num_windows = l - width + 1
    if num_windows < 1:
        raise ValueError("Sequence axis shorter than conv_width.")

    if proj is not None and x.dtype == jnp.float32:
        from ..config import conv_mode, default_backend
        mode = conv_mode()
        on_accel = default_backend() != "cpu"
        if mode == "pallas" or (mode == "auto" and on_accel):
            from .pallas.conv_pallas import (conv_parts_shapes_ok,
                                             conv_maxpool_pallas)
            if conv_parts_shapes_ok(num_windows, width * d, num_freqs,
                                    x.dtype):
                return conv_maxpool_pallas(x, seq_lengths, proj, width,
                                           num_freqs,
                                           interpret=not on_accel)

    blk = min(block_size, num_windows)
    nsteps = -(-num_windows // blk)

    dtype = x.dtype
    x_flat = x.reshape(n, l * d)
    needed = nsteps * blk + width - 1
    if needed > l:
        x_flat = jnp.pad(x_flat, ((0, 0), (0, (needed - l) * d)))
    nk = _num_kmers(seq_lengths, width)
    neg_inf = jnp.asarray(-np.inf, dtype=dtype)

    def step(acc, start):
        if proj is not None:
            g = _conv_project(x_flat, start, blk, width, d, proj)
        else:
            wins = _window_block(x_flat, start, blk, width, d)
            g = sorf_blocks(
                pad_rows(wins.reshape(n * blk, -1), radem.shape[-1]),
                radem)
            g = g.reshape(n * blk, -1)[:, :num_freqs] * chi
            g = g.reshape(n, blk, num_freqs)
        widx = start + jnp.arange(blk, dtype=jnp.int32)
        mask = widx[None, :] < nk[:, None]
        g = jnp.where(mask[:, :, None], g, neg_inf)
        return jnp.maximum(acc, jnp.max(g, axis=1)), None

    init = jnp.zeros((n, num_freqs), dtype=dtype)
    starts = jnp.arange(nsteps, dtype=jnp.int32) * blk
    acc, _ = jax.lax.scan(step, init, starts)
    return acc
