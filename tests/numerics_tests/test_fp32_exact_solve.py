"""direct_weight_calc must survive fp32 Gram matrices at dataset scale.

The unnormalized Z^T Z carries O(n)-scale entries; at n ~ 1e6 a tuned
lambda^2 sits below fp32 roundoff of the diagonal, so an fp32 on-device
Cholesky breaks down at well-conditioned interior hyperparameters
(observed at the 1M north-star verify).  fp32 inputs must route through
the host-fp64 factorization and reproduce the true fp64 solve.
"""
import numpy as np
import jax.numpy as jnp

from xgpr_tpu.fitting.exact import direct_weight_calc


def test_fp32_million_scale_gram_solves_in_fp64():
    rng = np.random.default_rng(0)
    m, n_scale = 512, 1.0e6
    b = rng.standard_normal((m, 2 * m))
    gram64 = (b @ b.T) / (2 * m) * n_scale
    gram32 = jnp.asarray(gram64, jnp.float32)
    zty = jnp.asarray(rng.standard_normal(m), jnp.float32)
    lam = 0.2  # lambda^2 = 0.04 << fp32 eps * 1e6

    chol, w = direct_weight_calc(gram32, zty, lam)
    assert np.asarray(chol).dtype == np.float64
    w64 = np.linalg.solve(gram64 + lam ** 2 * np.eye(m),
                          np.asarray(zty, np.float64))
    rel = np.linalg.norm(np.asarray(w, np.float64) - w64) \
        / np.linalg.norm(w64)
    assert rel < 1e-3
    # logdet from the host factor matches the fp64 slogdet
    want = 0.5 * np.linalg.slogdet(gram64 + lam ** 2 * np.eye(m))[1]
    got = float(np.sum(np.log(np.diagonal(np.asarray(chol)))))
    assert abs(got - want) / abs(want) < 1e-6
