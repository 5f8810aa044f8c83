"""Fused Pallas CG-matvec chunk op: Z^T (Z v) without materialising Z.

The XLA parts path (fitting/fused_cg._parts_contract) materialises the
(chunk, F) cos/sin feature parts to HBM and reads them back for the
second contraction -- at 8192x4096 fp32 that is ~256 MB of HBM round
trip per chunk, a large slice of the measured chunk time once the
projection runs on the MXU and sincos is the cheap polynomial.

This kernel instead processes a row tile per grid step entirely in VMEM:

    arg = (x_tile @ proj) * sigma          (MXU, fp32-HIGHEST)
    c, s = poly_sincos(arg) * scale        (VPU, ops/sincos.py)
    [intercept column, row mask]
    zv   = c @ v_c + s @ v_s               (R, K)
    oc  += c^T zv ;  os += s^T zv          (F, K) accumulators

The (F, K) outputs map to the same block on every grid step, so they
live in VMEM for the whole call and HBM only ever sees x (read) and the
small outputs (write).  Semantics match parts_fn + _parts_contract with
float32/HIGHEST exactly up to fp addition order.

Reference parity: this computes the same streamed Z^T(Zv) accumulation
as the reference's cg_tools.py:26-53, restricted to one chunk.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024

# Schedule variant for on-chip A/B runs (scripts/ztzv_split_bench.py).
# The measured matvec sits at bound + ~0.45 * vpu_time (BENCH roofline),
# i.e. about half the sincos cost is NOT hidden behind the matmuls;
# splitting the tile into two independent MXU/VPU chains gives the
# Mosaic VLIW scheduler concurrent work for both units.
#   "none"  -- one contiguous chain (shipping default).
#   "rows"  -- two half-ROW chains.  Measured 19% WORSE on-chip: halving
#              the matmul M dim (128 -> 64) costs more MXU efficiency
#              than the interleave recovers.
#   "freqs" -- two half-FREQUENCY chains: matmul M stays 128; the
#              projection splits along output columns, each half runs
#              its own sincos and zv partial, and the oc/os dots write
#              disjoint output rows.
_SPLIT = "none"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_tile(n_rows, d_padded, num_freqs):
    """Largest row tile whose working set fits the VMEM budget.  Row
    counts need not divide the tile -- the wrapper zero-pads rows (mask 0)
    up to a tile multiple, so any chunk size takes the fused path."""
    for r in (512, 256, 128, 64, 32):
        # proj + x tile + (arg, c, s) + vectors/accumulators slack
        working = 4 * (d_padded * num_freqs + r * d_padded
                       + 3 * r * num_freqs) + 512 * 1024
        if working <= _VMEM_BUDGET:
            return r
    return None


def ztzv_shapes_ok(n_rows, d, num_freqs, dtype) -> bool:
    """Whether the fused matvec kernel supports this configuration.
    num_freqs is padded to a lane multiple inside the wrapper, so the
    only hard gates are fp32 and the VMEM working-set fit."""
    if dtype not in (jnp.float32, np.float32):
        return False
    return _pick_tile(n_rows, _round_up(d, 128),
                      _round_up(num_freqs, 128)) is not None


def _dot_high(a, b, dims):
    """3-pass bf16 matmul (the bf16x3 scheme XLA uses for
    Precision.HIGH, which Mosaic does not lower natively): split each
    operand into bf16 high + bf16 residual and drop the lo*lo term.
    Relative error ~2^-21."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _make_dot(precision):
    if precision == "high":
        return _dot_high
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    return dot


def _ztzv_kernel(sig_ref, x_ref, m_ref, proj_ref, vc_ref, vs_ref,
                 oc_ref, os_ref, *, scale, intercept, precision, sincos,
                 split):
    # sincos/precision arrive as jit-STATIC arguments resolved by the
    # un-jitted public wrapper below: reading config inside this body
    # would freeze the first-traced mode for every later same-shape call
    # (the module-level jit cache is keyed on shapes, not config epoch).
    from ..sincos import kernel_sincos
    pair = kernel_sincos(jnp.float32, sincos)
    dot = _make_dot(precision)
    cdims = (((1,), (0,)), ((), ()))     # rows x cols contraction
    tdims = (((0,), (0,)), ((), ()))     # contract over the row axis

    mb = m_ref[:]

    def parts(proj, first):
        """cos/sin parts for a slice of the frequency axis."""
        arg = dot(x_ref[:], proj, cdims) * sig_ref[0, 0]
        # scale * row-mask folded into ONE per-element multiply (the
        # fast path folds it into the polynomial's trailing multiplies).
        c, s = pair(arg, mb * scale)
        if intercept and first:
            col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
            c = jnp.where(col == 0, mb, c)
        return c, s

    fp = proj_ref.shape[1]
    if split == "freqs" and fp % 2 == 0:
        # Two independent MXU/VPU chains (matmul M stays the full tile);
        # the zv partials sum and the oc/os dots write disjoint rows.
        h = fp // 2
        ca, sa = parts(proj_ref[:, :h], True)
        cb, sb = parts(proj_ref[:, h:], False)
        zv = (dot(ca, vc_ref[:h], cdims) + dot(sa, vs_ref[:h], cdims) +
              dot(cb, vc_ref[h:], cdims) + dot(sb, vs_ref[h:], cdims))
        oc_inc = jnp.concatenate([dot(ca, zv, tdims),
                                  dot(cb, zv, tdims)], axis=0)
        os_inc = jnp.concatenate([dot(sa, zv, tdims),
                                  dot(sb, zv, tdims)], axis=0)
    elif split == "rows" and x_ref.shape[0] % 2 == 0:
        h = x_ref.shape[0] // 2

        def half(x, m):
            arg = dot(x, proj_ref[:], cdims) * sig_ref[0, 0]
            c, s = pair(arg, m * scale)
            if intercept:
                col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
                c = jnp.where(col == 0, m, c)
            zv = dot(c, vc_ref[:], cdims) + dot(s, vs_ref[:], cdims)
            return dot(c, zv, tdims), dot(s, zv, tdims)

        oc_a, os_a = half(x_ref[:h], mb[:h])
        oc_b, os_b = half(x_ref[h:], mb[h:])
        oc_inc = oc_a + oc_b
        os_inc = os_a + os_b
    else:
        c, s = parts(proj_ref[:], True)
        zv = dot(c, vc_ref[:], cdims) + dot(s, vs_ref[:], cdims)
        oc_inc = dot(c, zv, tdims)
        os_inc = dot(s, zv, tdims)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        oc_ref[:] = oc_inc
        os_ref[:] = os_inc

    @pl.when(i != 0)
    def _():
        oc_ref[:] = oc_ref[:] + oc_inc
        os_ref[:] = os_ref[:] + os_inc


def ztzv_parts_pallas(x, m, proj, sigma, v_c, v_s, fit_intercept,
                      num_freqs, interpret=False):
    """Fused chunk matvec: returns (oc, os), each (num_freqs, K).

    Args:
        x: (chunk, D) raw input rows (NOT pre-scaled by sigma).
        m: (chunk,) float row mask.
        proj: (D, F) dense SORF projection, chi folded in.
        sigma: scalar lengthscale (traced).
        v_c / v_s: (F, K) cos/sin slices of the CG direction.
        fit_intercept: static; canonical column 0 == 1.

    Not itself jitted: config modes are resolved HERE (at call / outer
    trace time) and passed to the jitted impl as static arguments, so a
    set_sincos_mode / set_speed_preset switch retraces even for shapes
    the impl has already compiled.
    """
    from ... import config as _cfg
    from ..sincos import resolved_sincos_mode
    sincos = resolved_sincos_mode()
    return _ztzv_parts_impl(x, m, proj, sigma, v_c, v_s,
                            fit_intercept, num_freqs, interpret,
                            sincos, _cfg.feature_matmul_precision(),
                            _SPLIT)


@partial(jax.jit,
         static_argnames=("fit_intercept", "num_freqs", "interpret",
                          "sincos", "precision", "split"))
def _ztzv_parts_impl(x, m, proj, sigma, v_c, v_s, fit_intercept,
                     num_freqs, interpret, sincos, precision, split):
    from ..sorf import rbf_norm_constant
    n, d = x.shape
    dp = _round_up(d, 128)
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, dp - d)))
        proj = jnp.pad(proj, ((0, dp - d), (0, 0)))
    # Pad the frequency axis to a lane multiple with zero projection
    # columns: padded frequencies see v rows of zero (zv unchanged) and
    # their output rows are sliced off, so results are exact.
    fp = _round_up(num_freqs, 128)
    if fp != num_freqs:
        proj = jnp.pad(proj, ((0, 0), (0, fp - num_freqs)))
        v_c = jnp.pad(v_c, ((0, fp - num_freqs), (0, 0)))
        v_s = jnp.pad(v_s, ((0, fp - num_freqs), (0, 0)))
    r = _pick_tile(n, dp, fp)
    if r is None:
        raise ValueError("unsupported shapes for the fused matvec kernel")
    # Pad rows to a tile multiple; padded rows carry mask 0 and so
    # contribute exactly zero to the accumulators.
    np_rows = _round_up(n, r)
    m2 = m.astype(jnp.float32).reshape(n, 1)
    if np_rows != n:
        x = jnp.pad(x, ((0, np_rows - n), (0, 0)))
        m2 = jnp.pad(m2, ((0, np_rows - n), (0, 0)))
    k = v_c.shape[1]
    scale = np.float32(rbf_norm_constant(num_freqs, fit_intercept))
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)

    grid = (np_rows // r,)
    oc, os_ = pl.pallas_call(
        partial(_ztzv_kernel, scale=scale, intercept=fit_intercept,
                precision=precision, sincos=sincos, split=split),
        out_shape=(
            jax.ShapeDtypeStruct((fp, k), jnp.float32),
            jax.ShapeDtypeStruct((fp, k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((r, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((fp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(sig, x, m2, proj, v_c, v_s)
    if fp != num_freqs:
        oc = oc[:num_freqs]
        os_ = os_[:num_freqs]
    return oc, os_
