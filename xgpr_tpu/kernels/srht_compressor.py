"""SRHT compressor for sketching random-feature matrices.

Parity: /root/reference/src/xGPR/kernels/srht_compressor.py -- Rademacher
diagonal + normalised FWHT + truncated column permutation.  Used by the
randomized Nystrom preconditioner constructors.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hadamard import next_pow2
from ..ops.sorf import srht_rows
from ..utils import rng as state_rng


@jax.jit
def _srht_apply(x, radem, idx):
    return srht_rows(x, radem, idx)


class SRHTCompressor:
    """Compress (N, input_size) feature rows to (N, compression_size)."""

    def __init__(self, compression_size, input_size, random_seed=123):
        if compression_size >= input_size or compression_size <= 1:
            raise RuntimeError(
                f"compression_size must lie strictly between 1 and the "
                f"input width ({input_size}); got {compression_size}.")
        self.compression_size = int(compression_size)
        self.input_size = int(input_size)
        self.padded_dims = next_pow2(input_size)
        radem, idx = state_rng.srht_state(random_seed, input_size,
                                          compression_size, np.float64)
        self._radem_np = radem
        self._idx_np = idx
        self.radem = jnp.asarray(radem)
        self.sample_idx = jnp.asarray(idx)

    def transform_x(self, features):
        if features.ndim != 2 or features.shape[1] != self.input_size:
            raise RuntimeError("Input with unexpected size passed to a "
                               "compressor module.")
        return _srht_apply(features, self.radem.astype(features.dtype),
                           self.sample_idx)
