"""Fused Pallas conv-SORF feature-parts kernel.

The XLA conv path (ops/conv.py) materialises the (rows, windows, F)
window-projection intermediate to HBM between the conv and the
sincos+mask+reduce fusion -- ~4 GB round-trip per 2048x120x4096 chunk,
measured ~35 ms/chunk on-chip (scripts/conv_matvec_profile.py) against a
~6 ms compute bound.

This kernel keeps the window axis entirely in VMEM.  The input is the
im2col patch array xw (rows, windows, w*D) built by
``lax.conv_general_dilated_patches`` (a cheap strided gather: w*D per
window instead of F).  Per grid step (row tile i, frequency tile j,
window block k):

    arg = (xw[i,k] as (Rd*Bw, P)) @ proj[:, j] * sigma   (MXU)
    c, s = poly_sincos(arg)                              (VPU)
    oc[i,j] += sum_over_window_block(c * mask[i,k])      (VPU)
    os[i,j] += sum_over_window_block(s * mask[i,k])

The (Rd, Ft) output accumulators map to the same block for every k, so
they stay resident in VMEM; HBM sees only xw (read once per frequency
tile) and the small (rows, F) cos/sin parts (written once).  Row scaling
(averaging) and the intercept column are applied by the caller on the
(rows, F) parts -- semantics match conv_rbf_features(parts=True) with
float32 exactly up to fp addition order.

Reference parity: computes the same accumulated k-mer cos/sin features
as the reference's cpuConv1dFGen window loop
(convolution_ops/rbf_convolution.cpp:96-133), restricted to one chunk.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ztzv_pallas import _make_dot, _round_up

_VMEM_BUDGET = 12 * 1024 * 1024

_RD = 16    # datapoint rows per tile
_BW = 16    # windows per block
_FT = 2048  # frequency tile cap
# Interleave each window block as two half-blocks: the second half's
# MXU projection issues between the first half's VPU sincos/reduce
# chains, giving the scheduler independent MXU and VPU work to overlap.
# On-chip A/B at the protein matvec shape (scripts/conv_pallas_tune.py,
# healthy window, round 5): split 19.72 ms/chunk vs 20.30 unsplit
# (-2.9%); split_bw32 19.85; every tile-size variant tried (RD32, BW32,
# FT1024, FT4096) measured at or behind the shipped tiles, so the block
# split is the one scheduling lever that moved the VPU-bound kernel.
_SPLIT = True


def _window_block(num_windows):
    """Windows per grid step: _BW, shrunk (in sublane-aligned steps) for
    short sequences so padded windows don't dominate the work."""
    return min(_BW, _round_up(num_windows, 8))


def _tile_plan(num_freqs, wd_padded, bw=None):
    """Frequency tile: largest of (_FT, ..., 128) dividing F whose
    working set (double-buffered proj + xw block + arg/cos/sin temps +
    double-buffered accumulators) fits the VMEM budget."""
    if bw is None:
        bw = _BW
    for ft in (2048, 1024, 512, 256, 128):
        if ft > _FT:
            continue
        if num_freqs % ft == 0:
            working = 4 * (2 * wd_padded * ft        # proj, 2 buffers
                           + 2 * _RD * bw * wd_padded   # xw block
                           + 3 * _RD * bw * ft       # arg/c/s temps
                           + 4 * _RD * ft)           # oc/os, 2 buffers
            if working <= _VMEM_BUDGET:
                return ft
    return None


def conv_parts_shapes_ok(num_windows, wd, num_freqs, dtype) -> bool:
    """Whether the fused conv kernel supports this configuration.
    num_freqs is padded to a lane multiple inside the wrappers (zero
    projection columns, outputs sliced), so any frequency count works."""
    if dtype not in (jnp.float32, np.float32):
        return False
    if num_windows < 4:          # tiny window counts: XLA path is fine
        return False
    if _round_up(wd, 128) > 1024:  # conv_width*D beyond one VMEM stripe
        return False
    return _tile_plan(_round_up(num_freqs, 128), _round_up(wd, 128),
                      _window_block(num_windows)) is not None


def _conv_parts_kernel(sig_ref, xw_ref, m_ref, proj_ref, oc_ref, os_ref,
                       *, precision, sincos):
    # sincos/precision arrive as jit-STATIC arguments resolved by the
    # un-jitted public wrapper (see ztzv_pallas._ztzv_kernel for why).
    from ..sincos import kernel_sincos
    pair = kernel_sincos(jnp.float32, sincos)
    dot = _make_dot(precision)
    cdims = (((1,), (0,)), ((), ()))
    rd, bw, p = xw_ref.shape
    ft = proj_ref.shape[1]
    if _SPLIT and bw % 2 == 0:
        # Two half-blocks with the MXU projection of the second issued
        # between the first's VPU sincos/reduce chains, giving the
        # scheduler independent MXU and VPU work to overlap.
        h = bw // 2
        xa = xw_ref[:, :h, :].reshape(rd * h, p)
        xb = xw_ref[:, h:, :].reshape(rd * h, p)
        proj = proj_ref[:]
        arg_a = dot(xa, proj, cdims) * sig_ref[0, 0]
        arg_b = dot(xb, proj, cdims) * sig_ref[0, 0]
        ca, sa = pair(arg_a, m_ref[:, :h, :].reshape(rd * h, 1))
        cb, sb = pair(arg_b, m_ref[:, h:, :].reshape(rd * h, 1))
        cs = jnp.sum(ca.reshape(rd, h, ft), axis=1) + \
            jnp.sum(cb.reshape(rd, h, ft), axis=1)
        ss = jnp.sum(sa.reshape(rd, h, ft), axis=1) + \
            jnp.sum(sb.reshape(rd, h, ft), axis=1)
    else:
        xwb = xw_ref[:].reshape(rd * bw, p)
        arg = dot(xwb, proj_ref[:], cdims) * sig_ref[0, 0]
        # window mask folded into the pair evaluation (one multiply, or
        # zero extra on the fast path) instead of a separate masked
        # product on the reshaped block.
        c, s = pair(arg, m_ref[:].reshape(rd * bw, 1))
        cs = jnp.sum(c.reshape(rd, bw, ft), axis=1)
        ss = jnp.sum(s.reshape(rd, bw, ft), axis=1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        oc_ref[:] = cs
        os_ref[:] = ss

    @pl.when(k != 0)
    def _():
        oc_ref[:] = oc_ref[:] + cs
        os_ref[:] = os_ref[:] + ss


def _conv_maxpool_kernel(xw_ref, m_ref, proj_ref, out_ref, *, precision):
    dot = _make_dot(precision)
    cdims = (((1,), (0,)), ((), ()))
    rd, bw, p = xw_ref.shape
    ft = proj_ref.shape[1]
    xwb = xw_ref[:].reshape(rd * bw, p)
    g = dot(xwb, proj_ref[:], cdims).reshape(rd, bw, ft)
    neg = jnp.float32(-np.inf)
    g = jnp.where(m_ref[:] > 0.5, g, neg)
    blockmax = jnp.max(g, axis=1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        # zero-initialised output == implicit ReLU threshold
        # (conv1d_operations.cpp:22-168).
        out_ref[:] = jnp.maximum(blockmax, 0.0)

    @pl.when(k != 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], blockmax)


def conv_maxpool_pallas(x, seq_lengths, proj, width, num_freqs,
                        interpret=False):
    """ReLU + global-maxpool conv SORF features, (N, F) float32.

    Same VMEM window loop as conv_parts_pallas with the masked window
    sum replaced by a running elementwise max against a zero-initialised
    output (no sigma, no cos/sin) -- matching
    ops/conv.py::conv_maxpool_features.  Un-jitted wrapper: the matmul
    precision is resolved here and passed static (see conv_parts_pallas).
    """
    from ... import config as _cfg
    return _conv_maxpool_impl(x, seq_lengths, proj, width, num_freqs,
                              interpret, _cfg.feature_matmul_precision())


@partial(jax.jit, static_argnames=("width", "num_freqs", "interpret",
                                   "precision"))
def _conv_maxpool_impl(x, seq_lengths, proj, width, num_freqs,
                       interpret, precision):
    n, l, d = x.shape
    nw = l - width + 1
    wd = width * d
    bw = _window_block(nw)
    fp = _round_up(num_freqs, 128)
    ft = _tile_plan(fp, _round_up(wd, 128), bw)
    if ft is None:
        raise ValueError("unsupported shapes for the fused conv kernel")

    xw = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(width,), window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    t_idx = np.arange(wd) % width
    c_idx = np.arange(wd) // width
    proj_cm = proj[t_idx * d + c_idx]

    p = _round_up(wd, 128)
    nwp = _round_up(nw, bw)
    np_rows = _round_up(n, _RD)
    xw = jnp.pad(xw, ((0, np_rows - n), (0, nwp - nw), (0, p - wd)))
    # Padded frequency columns are zero projections; their outputs are
    # sliced off below.
    proj_cm = jnp.pad(proj_cm, ((0, p - wd), (0, fp - num_freqs)))

    nk = seq_lengths.astype(jnp.int32) - width + 1
    nk = jnp.pad(nk, (0, np_rows - n))
    widx = jnp.arange(nwp, dtype=jnp.int32)
    mask = (widx[None, :] < nk[:, None]).astype(jnp.float32)[:, :, None]

    grid = (np_rows // _RD, fp // ft, nwp // bw)
    out = pl.pallas_call(
        partial(_conv_maxpool_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((np_rows, fp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_RD, bw, p), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RD, bw, 1), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, ft), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RD, ft), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, mask, proj_cm)
    return out[:n, :num_freqs]


def conv_parts_pallas(x, seq_lengths, proj, sigma, width, num_freqs,
                      interpret=False):
    """Unscaled conv-SORF (cos, sin) parts, each (N, F) frequency-ordered.

    Un-jitted wrapper: the sincos mode and matmul precision are resolved
    here (at call / outer trace time) and passed to the jitted impl as
    static arguments, so config switches retrace already-compiled shapes.

    Args:
        x: (N, L, D) zero-padded sequences (NOT pre-scaled by sigma).
        seq_lengths: (N,) int sequence lengths.
        proj: (w*D, F) dense SORF projection in window-major row order
            (t*D + c), chi folded in.
        sigma: scalar lengthscale (traced).
        width: conv width (static).
        num_freqs: F (static; padded internally to a lane multiple).

    Returns:
        (c, s) -- the masked window sums WITHOUT row averaging or the
        intercept column (the caller applies both; see
        ConvKernelBaseclass.pure_feature_parts_fn).
    """
    from ... import config as _cfg
    from ..sincos import resolved_sincos_mode
    sincos = resolved_sincos_mode()
    return _conv_parts_impl(x, seq_lengths, proj, sigma, width,
                            num_freqs, interpret, sincos,
                            _cfg.feature_matmul_precision())


@partial(jax.jit, static_argnames=("width", "num_freqs", "interpret",
                                   "sincos", "precision"))
def _conv_parts_impl(x, seq_lengths, proj, sigma, width, num_freqs,
                     interpret, sincos, precision):
    n, l, d = x.shape
    nw = l - width + 1
    wd = width * d
    bw = _window_block(nw)
    fp = _round_up(num_freqs, 128)
    ft = _tile_plan(fp, _round_up(wd, 128), bw)
    if ft is None:
        raise ValueError("unsupported shapes for the fused conv kernel")

    # im2col patches, channel-major (c*width + t) feature order -- so the
    # projection rows are permuted to match (cheap: (wD, F) gather once).
    xw = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(width,), window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    t_idx = np.arange(wd) % width
    c_idx = np.arange(wd) // width
    perm = t_idx * d + c_idx            # row c*w+t of xw <- row t*d+c
    proj_cm = proj[perm]

    p = _round_up(wd, 128)
    nwp = _round_up(nw, bw)
    np_rows = _round_up(n, _RD)
    xw = jnp.pad(xw, ((0, np_rows - n), (0, nwp - nw), (0, p - wd)))
    # Padded frequency columns are zero projections; outputs sliced off.
    proj_cm = jnp.pad(proj_cm, ((0, p - wd), (0, fp - num_freqs)))

    nk = seq_lengths.astype(jnp.int32) - width + 1
    nk = jnp.pad(nk, (0, np_rows - n))
    widx = jnp.arange(nwp, dtype=jnp.int32)
    mask = (widx[None, :] < nk[:, None]).astype(jnp.float32)[:, :, None]

    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)
    grid = (np_rows // _RD, fp // ft, nwp // bw)
    c, s = pl.pallas_call(
        partial(_conv_parts_kernel, precision=precision, sincos=sincos),
        out_shape=(
            jax.ShapeDtypeStruct((np_rows, fp), jnp.float32),
            jax.ShapeDtypeStruct((np_rows, fp), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_RD, bw, p), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RD, bw, 1), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, ft), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_RD, ft), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_RD, ft), lambda i, j, k: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(sig, xw, mask, proj_cm)
    return c[:n, :num_freqs], s[:n, :num_freqs]
