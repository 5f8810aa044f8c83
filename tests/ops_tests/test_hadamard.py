"""FWHT correctness against a dense Hadamard-matrix oracle, mirroring the
reference's oracle-vs-fast test pattern (tests/fht_operations_tests/)."""
import numpy as np
import pytest
from scipy.linalg import hadamard

from xgpr_tpu.ops.hadamard import fwht, next_pow2, _factorize

import jax.numpy as jnp


@pytest.mark.parametrize("n", [2, 4, 8, 64, 128, 256, 1024, 2048, 8192])
def test_fwht_matches_dense(n):
    rng = np.random.default_rng(123)
    x = rng.standard_normal((7, n))
    expected = x @ hadamard(n).astype(np.float64)
    got = np.asarray(fwht(jnp.asarray(x)))
    assert np.allclose(got, expected, rtol=1e-8, atol=1e-8)


def test_fwht_batched_shapes():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 256))
    got = np.asarray(fwht(jnp.asarray(x)))
    expected = x @ hadamard(256).astype(np.float64)
    assert np.allclose(got, expected, rtol=1e-8, atol=1e-8)


def test_factorize_balanced():
    assert _factorize(128) == (128,)
    assert all(f <= 128 for f in _factorize(1 << 20))
    assert np.prod(_factorize(1 << 20)) == 1 << 20


def test_next_pow2():
    assert next_pow2(1) == 2
    assert next_pow2(2) == 2
    assert next_pow2(3) == 4
    assert next_pow2(84) == 128
    assert next_pow2(128) == 128
    assert next_pow2(129) == 256
