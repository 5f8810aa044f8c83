"""MiniARD gradient op.

The reference precomputes the dense SORF projection matrix W (num_freqs, D)
once (mini_ard.py:208-258, via 2-D FHT on an identity matrix) and then, per
row, accumulates per-lengthscale partial dot products
(rbf_ops/ard_ops.cpp:39-146):

    dot[j, l]  = sum_{k: group(k)==l} x_k * W[j, k]
    rf_sum[j]  = sum_k sigma_k * x_k * W[j, k]
    feats      = s * [cos(rf_sum), sin(rf_sum)] interleaved
    grad[j, l] = s * (-sin(rf_sum) * dot, +cos(rf_sum) * dot) interleaved

On TPU this is a handful of dense matmuls: one per lengthscale group (the
number of groups is tiny and static).
"""
import jax.numpy as jnp

from .sorf import rbf_norm_constant
from .hadamard import fwht, next_pow2


def precompute_sorf_weights(radem: jnp.ndarray, chi: jnp.ndarray,
                            input_dim: int) -> jnp.ndarray:
    """Dense (num_freqs, input_dim) matrix W with h = x @ W.T == SORF(x)*chi.

    Equivalent to the reference's precompute_weights (mini_ard.py:208-258)
    but expressed by SORF-transforming the identity matrix with the batched
    op rather than a 2-D FHT extension.
    """
    p = radem.shape[-1]
    nblocks = radem.shape[1]
    num_freqs = chi.shape[0]
    eye = jnp.eye(p, dtype=chi.dtype)
    norm = jnp.asarray(1.0 / jnp.sqrt(jnp.asarray(float(p))), dtype=chi.dtype)
    blocks = []
    for b in range(nblocks):
        m = eye * (radem[0, b] * norm)
        m = fwht(m)
        m = m * (radem[1, b] * norm)
        m = fwht(m)
        m = m * (radem[2, b] * norm)
        m = fwht(m)
        # m[k, j]: contribution of input k to padded output j of block b
        blocks.append(m.T[:, :input_dim])
    w = jnp.concatenate(blocks, axis=0)[:num_freqs, :]
    return w * chi[:, None]


def mini_ard_grad(x: jnp.ndarray, weights: jnp.ndarray,
                  group_starts, group_ends, sigma_vals: jnp.ndarray,
                  fit_intercept: bool):
    """MiniARD features and per-lengthscale gradient.

    Args:
        x: (N, D) raw input (not pre-scaled).
        weights: (F, D) precomputed dense SORF weights (chi included).
        group_starts / group_ends: python lists delimiting each lengthscale's
            feature slice (static).
        sigma_vals: (n_groups,) lengthscale values.

    Returns:
        feats (N, 2F), grad (N, 2F, n_groups).
    """
    n = x.shape[0]
    num_freqs = weights.shape[0]
    ngroups = len(group_starts)
    dots = []
    for g in range(ngroups):
        s, e = group_starts[g], group_ends[g]
        dots.append(x[:, s:e] @ weights[:, s:e].T)  # (N, F)
    dots = jnp.stack(dots, axis=-1)  # (N, F, G)
    rf_sum = jnp.einsum("nfg,g->nf", dots, sigma_vals.astype(x.dtype))
    scale = jnp.asarray(rbf_norm_constant(num_freqs, fit_intercept),
                        dtype=x.dtype)
    from .sincos import sincos
    cosv, sinv = sincos(rf_sum)
    cosv = cosv * scale
    sinv = sinv * scale
    from .layout import assemble_cos_sin
    padded = next_pow2(weights.shape[1])
    feats = assemble_cos_sin(cosv, sinv, padded)
    grads = []
    for g in range(ngroups):
        grads.append(assemble_cos_sin(-sinv * dots[:, :, g],
                                      cosv * dots[:, :, g], padded))
    grad = jnp.stack(grads, axis=-1)
    return feats, grad
