"""Fused Pallas kernel for the dense-projection RBF feature map.

One program computes a (TILE_ROWS, padded) tile of the projection
arg = x @ proj on the MXU and writes the corresponding contiguous
(TILE_ROWS, 2*padded) [cos | sin] output block straight to its final
position -- no intermediate (N, F) array ever reaches HBM and no separate
cos/sin/concat kernels run.

Grid: (row tiles, frequency blocks).  Requires the uniform block layout
(num_freqs <= padded or num_freqs % padded == 0); callers fall back to the
XLA path otherwise.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pallas_feature_shapes_ok(n, d, num_freqs, padded, dtype) -> bool:
    """Whether the fused kernel supports this configuration."""
    if dtype not in (jnp.float32, np.float32):
        return False
    if num_freqs > padded and num_freqs % padded != 0:
        return False
    if padded < 128 or padded > 4096:
        return False
    if d % 128 != 0:
        # The x tile's lane dim must be aligned; callers can zero-pad.
        return False
    return True


def _feature_kernel(x_ref, proj_ref, out_ref, *, width, scale, sincos):
    # Inside Pallas use the unguarded polynomial / builtin split directly:
    # the runtime max-|arg| guard (ops/sincos._guarded_poly_sincos) is a
    # lax.cond, which does not belong in a kernel body.  Callers route
    # extreme-argument workloads through the XLA path.  The sincos mode
    # arrives as a jit-static argument resolved by the un-jitted wrapper
    # (see ztzv_pallas._ztzv_kernel for why).
    from ..sincos import kernel_sincos
    arg = jnp.dot(x_ref[:], proj_ref[:],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    cosv, sinv = kernel_sincos(arg.dtype, sincos)(arg, jnp.float32(scale))
    out_ref[:, :width] = cosv
    out_ref[:, width:] = sinv


def rbf_feature_map_pallas(x, proj, fit_intercept, padded,
                           interpret=False):
    """Fused equivalent of ops.sorf.rbf_feature_map_dense.

    Args:
        x: (N, D) rows, already scaled by sigma; D must be a multiple of
            128 (zero-pad if needed -- padding columns multiply zero rows
            of proj, so results are unchanged only if proj is padded too;
            use ``pad_operands`` below).
        proj: (D, F) dense projection with chi folded in.

    Un-jitted wrapper: the sincos mode is resolved here and passed
    static so config switches retrace already-compiled shapes.
    """
    from ..sincos import resolved_sincos_mode
    sincos = resolved_sincos_mode()
    return _rbf_feature_map_impl(x, proj, fit_intercept, padded,
                                 interpret, sincos)


@partial(jax.jit, static_argnames=("fit_intercept", "padded", "interpret",
                                   "sincos"))
def _rbf_feature_map_impl(x, proj, fit_intercept, padded, interpret,
                          sincos):
    n, d = x.shape
    num_freqs = proj.shape[1]
    width = min(num_freqs, padded)
    nblocks = max(1, num_freqs // padded) if num_freqs > padded else 1

    from ..sorf import rbf_norm_constant
    scale = rbf_norm_constant(num_freqs, fit_intercept)

    tile_rows = 256 if n % 256 == 0 else 128
    if n % tile_rows != 0:
        # Row-pad to the tile size; extra rows are discarded below.
        pad = _round_up(n, tile_rows) - n
        x = jnp.pad(x, ((0, pad), (0, 0)))
    n_padded = x.shape[0]

    grid = (n_padded // tile_rows, nblocks)
    out = pl.pallas_call(
        partial(_feature_kernel, width=width, scale=np.float32(scale),
                sincos=sincos),
        out_shape=jax.ShapeDtypeStruct((n_padded, 2 * num_freqs),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, width), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 2 * width),
                               lambda i, b: (i, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, proj)
    return out[:n]


def pad_operands(x, proj):
    """Zero-pad the contraction dim to a multiple of 128 for the fused
    kernel; padding contributes exactly zero to x @ proj."""
    d = x.shape[1]
    dp = _round_up(d, 128)
    if dp == d:
        return x, proj
    x = jnp.pad(x, ((0, 0), (0, dp - d)))
    proj = jnp.pad(proj, ((0, dp - d), (0, 0)))
    return x, proj
