"""Structured orthogonal random feature (SORF) ops, batched for TPU.

Semantics follow the reference's native ops:

- SORF transform: three rounds of (Rademacher diagonal * 1/sqrt(P)) followed
  by an unnormalised FWHT (shared_rfgen_ops.cpp:50-78, singleVectorSORF).
- RBF post-process: interleaved features out[2i] = cos(h_i * chi_i) * s,
  out[2i+1] = sin(h_i * chi_i) * s (shared_rfgen_ops.cpp:91-114), with
  s = sqrt(1 / (F - 0.5)) when an intercept is fitted, sqrt(1/F) otherwise
  (rbf_ops.cpp:63-67).
- When num_freqs > P, the padded input is processed once per block against an
  independent slice of the Rademacher diagonals (rbf_ops.cpp:76-99).

Unlike the reference (one thread/CUDA-block per datapoint with a scalar
butterfly), everything here is a single batched expression: pad -> broadcast
over blocks -> 3x (diag mult + factored-matmul FWHT) -> chi scale -> cos/sin.
XLA fuses the elementwise stages into the matmuls.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .hadamard import fwht
from ..config import matmul_precision as _matmul_precision


def sorf_blocks(x_padded: jnp.ndarray, radem: jnp.ndarray) -> jnp.ndarray:
    """Apply the 3-round SORF transform to each block.

    Args:
        x_padded: (N, P) input rows, already zero-padded to P = 2^k.
        radem: (3, B, P) float Rademacher diagonals (+-1) for B blocks.

    Returns:
        (N, B, P) transformed values, one independent projection per block.
    """
    p = x_padded.shape[-1]
    norm = np.asarray(1.0 / np.sqrt(p), dtype=x_padded.dtype)
    y = x_padded[:, None, :] * (radem[0] * norm)
    y = fwht(y)
    y = y * (radem[1] * norm)
    y = fwht(y)
    y = y * (radem[2] * norm)
    y = fwht(y)
    return y


def pad_rows(x: jnp.ndarray, padded_dim: int) -> jnp.ndarray:
    """Zero-pad the last axis of (N, d) rows out to padded_dim."""
    d = x.shape[-1]
    if d == padded_dim:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, padded_dim - d)]
    return jnp.pad(x, pad)


def sorf_project(x: jnp.ndarray, radem: jnp.ndarray,
                 num_freqs: int) -> jnp.ndarray:
    """SORF-project rows to num_freqs frequencies.

    Args:
        x: (N, d) rows (any d; padded internally to P = radem.shape[-1]).
        radem: (3, B, P) float Rademacher diagonals.
        num_freqs: number of frequencies to keep (<= B * P).

    Returns:
        (N, num_freqs) projected values (before chi scaling).
    """
    p = radem.shape[-1]
    h = sorf_blocks(pad_rows(x, p), radem)
    return h.reshape(x.shape[0], -1)[:, :num_freqs]


def cos_sin_features(arg: jnp.ndarray, scale, padded: int) -> jnp.ndarray:
    """[cos | sin] block-layout features * scale (see ops/layout.py --
    a TPU-friendly permutation of the reference's interleaved layout,
    shared_rfgen_ops.cpp:104-113)."""
    from .layout import assemble_cos_sin
    from .sincos import sincos
    s = jnp.asarray(scale, dtype=arg.dtype)
    cosv, sinv = sincos(arg)
    return assemble_cos_sin(cosv * s, sinv * s, padded)


def rbf_norm_constant(num_freqs: int, fit_intercept: bool) -> float:
    """Feature scaling: sqrt(1/(F - 0.5)) with intercept else sqrt(1/F)
    (rbf_ops.cpp:63-67)."""
    denom = num_freqs - 0.5 if fit_intercept else float(num_freqs)
    return float(np.sqrt(1.0 / denom))


def rbf_feature_map(x: jnp.ndarray, radem: jnp.ndarray, chi: jnp.ndarray,
                    fit_intercept: bool) -> jnp.ndarray:
    """Full RBF SORF feature map for pre-scaled input rows.

    The caller is responsible for multiplying x by the lengthscale
    hyperparameter first (sorf_kernel_baseclass.py:117 does input *= sigma).

    Returns (N, 2 * num_freqs) features; column 0 is overwritten with 1 by the
    kernel layer when an intercept is fitted (kernel_baseclass.py:295-297).
    """
    num_freqs = chi.shape[0]
    h = sorf_project(x, radem, num_freqs)
    arg = h * chi
    scale = rbf_norm_constant(num_freqs, fit_intercept)
    return cos_sin_features(arg, scale, radem.shape[-1])


def rbf_feature_map_grad(x: jnp.ndarray, radem: jnp.ndarray,
                         chi: jnp.ndarray, sigma, fit_intercept: bool):
    """RBF features and d(features)/d(sigma).

    Matches singleVectorRBFPostGrad (shared_rfgen_ops.cpp:124-158): with
    g_i = h_i * chi_i (projection of the *unscaled* input), features are
    cos/sin(g_i * sigma) * s and the gradient entries are
    (-sin * g, +cos * g) * s, interleaved.

    Returns:
        feats: (N, 2F) features.
        dz_dsigma: (N, 2F, 1) derivative w.r.t. sigma.
    """
    from .layout import assemble_cos_sin
    from .sincos import sincos
    num_freqs = chi.shape[0]
    padded = radem.shape[-1]
    g = sorf_project(x, radem, num_freqs) * chi
    arg = g * jnp.asarray(sigma, dtype=x.dtype)
    scale = np.asarray(rbf_norm_constant(num_freqs, fit_intercept),
                       dtype=x.dtype)
    cosv, sinv = sincos(arg)
    cosv = cosv * scale
    sinv = sinv * scale
    feats = assemble_cos_sin(cosv, sinv, padded)
    grad = assemble_cos_sin(-sinv * g, cosv * g, padded)
    return feats, grad[:, :, None]


def dense_sorf_projection(radem: jnp.ndarray, chi: jnp.ndarray,
                          input_dim: int) -> jnp.ndarray:
    """Materialise the SORF projection as a dense (input_dim, F) matrix.

    W[:, j] is the j-th SORF frequency restricted to the first input_dim
    coordinates, with chi folded in: SORF(x) * chi == x @ W exactly.

    Rationale (TPU): the factored FWHT decomposes into tiny (<=128) matmuls
    that leave the 128x128 MXU nearly idle; for moderate dims a single
    dense matmul is mathematically identical and runs at high MXU
    utilisation.  The structured path remains for large padded dims where
    the dense matrix would not fit.
    """
    from .ard import precompute_sorf_weights
    w = precompute_sorf_weights(radem, chi, input_dim)  # (F, D), chi folded
    return w.T


def dense_threshold_ok(input_dim: int, num_freqs: int,
                       max_elements: int = 32 * 1024 * 1024) -> bool:
    """Use the dense projection when the matrix stays modest."""
    return input_dim * num_freqs <= max_elements


def _feature_projection(x, proj):
    """x @ proj at the configured feature precision.  In fast mode the
    operands are explicitly rounded to bfloat16 (f32 accumulation) --
    deterministic on every backend, so CPU tests exercise exactly the
    TPU fast path's numbers."""
    from ..config import feature_matmul_precision
    if feature_matmul_precision() == "default":
        return jnp.matmul(x.astype(jnp.bfloat16),
                          proj.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(x, proj, precision=feature_matmul_precision())


def rbf_feature_map_dense(x: jnp.ndarray, proj: jnp.ndarray,
                          fit_intercept: bool, padded: int) -> jnp.ndarray:
    """RBF features via the dense projection; x must be pre-scaled by
    sigma.  Output layout identical to rbf_feature_map."""
    num_freqs = proj.shape[1]
    arg = _feature_projection(x, proj)
    scale = rbf_norm_constant(num_freqs, fit_intercept)
    return cos_sin_features(arg, scale, padded)


def rbf_feature_map_dense_grad(x: jnp.ndarray, proj: jnp.ndarray, sigma,
                               fit_intercept: bool, padded: int):
    """Dense-projection analogue of rbf_feature_map_grad."""
    from .layout import assemble_cos_sin
    from .sincos import sincos
    num_freqs = proj.shape[1]
    g = jnp.matmul(x, proj, precision=_matmul_precision())
    arg = g * jnp.asarray(sigma, dtype=x.dtype)
    scale = np.asarray(rbf_norm_constant(num_freqs, fit_intercept),
                       dtype=x.dtype)
    cosv, sinv = sincos(arg)
    cosv = cosv * scale
    sinv = sinv * scale
    feats = assemble_cos_sin(cosv, sinv, padded)
    grad = assemble_cos_sin(-sinv * g, cosv * g, padded)
    return feats, grad[:, :, None]


def rbf_feature_parts_dense(x_scaled: jnp.ndarray, proj: jnp.ndarray,
                            fit_intercept: bool):
    """(cos, sin) feature parts WITHOUT the block-layout assembly.

    The canonical (N, 2F) layout costs extra full-Z copies (concat +
    reshape) that the CG matvec does not need: Z^T (Z v) is invariant to
    any column permutation applied consistently to v, so the solver can
    contract the parts directly (see fitting/fused_cg._ztzv_parts) and
    gather/scatter only the small (M, K) vectors.  Intercept handling
    (canonical column 0 == cos of frequency 0) is applied here.
    """
    from .sincos import sincos
    num_freqs = proj.shape[1]
    arg = _feature_projection(x_scaled, proj)
    scale = jnp.asarray(rbf_norm_constant(num_freqs, fit_intercept),
                        dtype=x_scaled.dtype)
    cosv, sinv = sincos(arg)
    cosv = cosv * scale
    sinv = sinv * scale
    if fit_intercept:
        cosv = cosv.at[:, 0].set(1.0)
    return cosv, sinv


def srht_rows(x: jnp.ndarray, radem_vec: jnp.ndarray,
              sample_idx: jnp.ndarray) -> jnp.ndarray:
    """Subsampled randomised Hadamard transform of each row.

    Matches cpuSRHT + the Python-side truncation
    (basic_ops/transform_functions.cpp:94-129, srht_compressor.py:70-97):
    y = FWHT(diag(radem) * x / sqrt(P)), then keep permuted columns.

    Args:
        x: (N, d) rows; padded to P = radem_vec.shape[0].
        radem_vec: (P,) float +-1 diagonal.
        sample_idx: (compression_size,) column indices to keep.
    """
    p = radem_vec.shape[0]
    xp = pad_rows(x, p)
    norm = np.asarray(1.0 / np.sqrt(p), dtype=x.dtype)
    y = fwht(xp * (radem_vec * norm))
    return jnp.take(y, sample_idx, axis=1)
