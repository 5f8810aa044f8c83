"""Fast Walsh-Hadamard transform, TPU-first.

The reference implements the FWHT as an in-place butterfly loop over each row
(/root/reference/src/xGPR/random_feature_generation/cpu_rf_gen/
shared_fht_functions/hadamard_transforms.cpp:16-131).  A butterfly is a poor
fit for the TPU: it is a log2(n)-pass, bandwidth-bound shuffle across lanes.
Instead we use the Kronecker factorisation

    H_n = H_a (x) H_b (x) ...      (n = a*b*..., each factor <= 128)

so that the transform of a length-n vector reshaped row-major to (a, b, ...)
is a sequence of small dense +-1 matmuls -- exactly the shape of work the MXU
(128x128 systolic array) is built for, and trivially batched/fused by XLA.
"""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..config import matmul_precision as _matmul_precision

_MAX_FACTOR_LOG2 = 7  # factors capped at 128 == MXU tile width


@lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    """Unnormalised +-1 Hadamard matrix of size n (n a power of two)."""
    if n < 1 or (n & (n - 1)) != 0:
        raise ValueError(f"Hadamard size must be a power of two, got {n}.")
    h = np.ones((1, 1), dtype=np.float64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_matrix(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_hadamard_np(n), dtype=dtype)


@lru_cache(maxsize=None)
def _factorize(n: int):
    """Split n = 2^k into balanced power-of-two factors, each <= 128.

    Balanced factors minimise total multiply-adds (sum of factors per
    element) for the factored-matmul transform.
    """
    if n < 1 or (n & (n - 1)) != 0:
        raise ValueError(f"FWHT length must be a power of two, got {n}.")
    k = n.bit_length() - 1
    if k == 0:
        return (1,)
    nparts = -(-k // _MAX_FACTOR_LOG2)  # ceil
    base, rem = divmod(k, nparts)
    logs = [base + (1 if i < rem else 0) for i in range(nparts)]
    return tuple(1 << l for l in logs)


def fwht(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised fast Walsh-Hadamard transform along the last axis.

    Matches the reference op ``cpuFastHadamardTransform`` semantics
    (natural / Hadamard ordering, no 1/sqrt(n) normalisation) but runs as
    MXU matmuls.  Works for any batch shape; last axis must be a power of 2.
    """
    n = x.shape[-1]
    if n == 1:
        return x
    factors = _factorize(n)
    batch_shape = x.shape[:-1]
    nb = len(batch_shape)
    x = x.reshape(batch_shape + factors)
    for i, f in enumerate(factors):
        h = hadamard_matrix(f, x.dtype)
        # Contract axis (nb + i) with H; tensordot moves the result axis to
        # the end, so move it back to keep layout stable.
        # HIGHEST precision: on TPU the default matmul precision rounds
        # inputs to bf16, which breaks the +-1e-3 feature-agreement contract.
        x = jnp.tensordot(x, h, axes=((nb + i,), (0,)),
                          precision=_matmul_precision())
        x = jnp.moveaxis(x, -1, nb + i)
    return x.reshape(batch_shape + (n,))


def fwht_normalized(x: jnp.ndarray) -> jnp.ndarray:
    """Orthonormal Walsh-Hadamard transform (H / sqrt(n))."""
    n = x.shape[-1]
    return fwht(x) * (1.0 / np.sqrt(n))


def next_pow2(n: int) -> int:
    """Smallest power of two >= max(n, 2).

    The reference pads every input to 2^ceil(log2(max(d, 2)))
    (sorf_kernel_baseclass.py:71, rbf_ops.cpp:54-58).
    """
    n = max(int(n), 2)
    return 1 << (n - 1).bit_length()
