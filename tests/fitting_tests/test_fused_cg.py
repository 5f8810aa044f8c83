"""The single-dispatch while_loop CG must reproduce the Python-loop CG
exactly (same iterations, same weights, same SLQ coefficients)."""
import sys
import os
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu.fitting.engine import Engine
from xgpr_tpu.fitting.cg import ConjugateGrad
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


def _setup(mode):
    (trx, tr_y), _ = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=300)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    return Engine(model.kernel, dset, mode=mode), model.kernel


def test_fused_matches_python_loop():
    stacked, kernel = _setup("stacked")
    streaming, _ = _setup("streaming")
    lam = kernel.get_lambda()
    p_st = NystromPreconditioner(stacked, 128, random_state=123,
                                 method="srht")
    p_sm = NystromPreconditioner(streaming, 128, random_state=123,
                                 method="srht")

    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((512, 3)))

    x1, c1, n1, l1 = ConjugateGrad(stacked).fit(rhs, lam, p_st,
                                                maxiter=50, tol=1e-8,
                                                verbose=False)
    x2, c2, n2, l2 = ConjugateGrad(streaming).fit(rhs, lam, p_sm,
                                                  maxiter=50, tol=1e-8,
                                                  verbose=False)
    assert c1 and c2
    assert n1 == n2
    assert np.allclose(np.asarray(x1), np.asarray(x2), rtol=1e-8,
                       atol=1e-10)
    assert np.allclose(l1, l2, rtol=1e-6)


def test_fused_nmll_coefficients_match():
    stacked, kernel = _setup("stacked")
    streaming, _ = _setup("streaming")
    lam = kernel.get_lambda()
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal((512, 4)))

    x1, a1, b1 = ConjugateGrad(stacked).fit(rhs, lam, None, maxiter=30,
                                            tol=1e-10, verbose=False,
                                            nmll_settings=True)
    x2, a2, b2 = ConjugateGrad(streaming).fit(rhs, lam, None, maxiter=30,
                                              tol=1e-10, verbose=False,
                                              nmll_settings=True)
    assert a1.shape == a2.shape
    # CG amplifies last-bit rounding differences exponentially (condition
    # number ~1e5 here), so deep-iteration coefficients differ between
    # any two valid implementations; what must agree are the early
    # coefficients, the converged solution, and the SLQ logdet estimate
    # built from the coefficients.
    assert np.allclose(a1[:4], a2[:4], rtol=1e-6)
    assert np.allclose(b1[:4], b2[:4], rtol=1e-6)
    assert np.allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5,
                       atol=1e-7)
    from xgpr_tpu.scoring.slq import estimate_logdet
    ld1 = estimate_logdet(a1, b1, 512)
    ld2 = estimate_logdet(a2, b2, 512)
    assert abs(ld1 - ld2) / abs(ld2) < 0.01


def test_looped_mode_matches_fused():
    """config.set_cg_mode('looped') keeps the iteration in Python (one
    matvec dispatch per CG step -- the reliable form behind fragile
    device relays) and must reproduce the fused while_loop solve."""
    import numpy as np
    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu import config as xcfg

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2000, 32))
    y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(2000)
    data = build_regression_dataset(x, y, chunk_size=500)

    def solve(mode):
        xcfg.set_cg_mode(mode)
        try:
            m = GPRegression(num_rffs=512, kernel_choice="RBF",
                             verbose=False)
            m.set_hyperparams(np.log(np.array([0.1, 0.25])), data)
            pc, _ = m.build_preconditioner(data, max_rank=64,
                                           method="srht_2")
            m.fit(data, preconditioner=pc, mode="cg", suppress_var=True)
            return np.asarray(m.weights)
        finally:
            xcfg.set_cg_mode("fused")

    w_fused = solve("fused")
    w_looped = solve("looped")
    rel = np.linalg.norm(w_fused - w_looped) / np.linalg.norm(w_fused)
    assert rel < 1e-6
