"""M-dimension scale-out: the fused sharded CG with feature-axis-sharded
iterates and preconditioner (reduce-scatter matvec accumulation) must
reproduce the replicated-state solver exactly, and must run at a num_rffs
whose replicated solver state (CG iterates + (M, rank) Nystrom factor +
(M, M) exact-path matrices) stops fitting a single chip's HBM budget.
Required addition per SURVEY.md section 2.9 / BASELINE north star; no
reference analogue exists (the reference has no distributed backend)."""
import sys
import os
import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset, config as xcfg
from xgpr_tpu.fitting.cg import cg_fit, ConjugateGrad
from xgpr_tpu.parallel import ShardedEngine, data_mesh
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8
    (trx, tr_y), _ = tabular_data(n_train=1600)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    engine = ShardedEngine(model.kernel, dset, data_mesh(8))
    precond = NystromPreconditioner(engine, 128, random_state=123,
                                    method="srht")
    return engine, precond, model


def test_msharded_matches_replicated_fit(setup):
    engine, precond, _ = setup
    try:
        xcfg.set_m_sharding("off")
        w1, n1, _ = cg_fit(engine, precond, tol=1e-7, verbose=False)
        xcfg.set_m_sharding("on")
        w2, n2, _ = cg_fit(engine, precond, tol=1e-7, verbose=False)
    finally:
        xcfg.set_m_sharding("auto")
    assert n1 == n2
    assert np.allclose(np.asarray(w1), np.asarray(w2), rtol=1e-8,
                       atol=1e-10)


def test_msharded_slq_coefficients_match(setup):
    """The SLQ (alphas, betas) Lanczos coefficients drive approximate
    NMLL; the M-sharded solver must reproduce them."""
    engine, precond, model = setup
    rng = np.random.default_rng(1)
    rhs = np.concatenate(
        [np.asarray(precond.get_zty())[:, None] / 1600,
         rng.standard_normal((512, 4))], axis=1)
    cg = ConjugateGrad(engine)
    lam = model.kernel.get_lambda()
    try:
        xcfg.set_m_sharding("on")
        x1, a1, b1 = cg.fit(rhs, lam, precond, 50, 1e-6, verbose=False,
                            nmll_settings=True)
        xcfg.set_m_sharding("off")
        x2, a2, b2 = cg.fit(rhs, lam, precond, 50, 1e-6, verbose=False,
                            nmll_settings=True)
    finally:
        xcfg.set_m_sharding("auto")
    assert a1.shape == a2.shape
    assert np.allclose(a1, a2, rtol=1e-8)
    assert np.allclose(b1, b2, rtol=1e-8)
    assert np.allclose(np.asarray(x1), np.asarray(x2), rtol=1e-7,
                       atol=1e-9)


def test_msharded_no_preconditioner(setup):
    engine, _, model = setup
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal((512, 2))
    cg = ConjugateGrad(engine)
    lam = model.kernel.get_lambda()
    try:
        xcfg.set_m_sharding("on")
        x1, _, n1, _ = cg.fit(rhs, lam, None, 30, 1e-6, verbose=False)
        xcfg.set_m_sharding("off")
        x2, _, n2, _ = cg.fit(rhs, lam, None, 30, 1e-6, verbose=False)
    finally:
        xcfg.set_m_sharding("auto")
    assert n1 == n2
    assert np.allclose(np.asarray(x1), np.asarray(x2), rtol=1e-7,
                       atol=1e-9)


def test_msharded_32k_rff_fit():
    """A 32k-RFF CG fit on the 8-device mesh: per-device CG state is
    M/8 = 4096 rows; the replicated form at this M (fp32 TPU: the (M, M)
    exact-path matrix alone is 4.3 GB; U at the reference's max rank 3000
    is 0.4 GB, CG carries 4x (M, 26) iterates for NMLL) is the regime the
    north star names.  auto mode must engage M-sharding at this size."""
    (trx, tr_y), _ = tabular_data(n_train=1000)
    dset = build_regression_dataset(trx, tr_y, chunk_size=250)
    model = GPRegression(num_rffs=32768, kernel_choice="RBF",
                         verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    engine = ShardedEngine(model.kernel, dset, data_mesh(8))
    assert xcfg.use_m_sharding(engine.num_rffs, engine.n_dev)
    precond = NystromPreconditioner(engine, 64, random_state=123,
                                    method="srht")
    w, n_iter, _ = cg_fit(engine, precond, tol=1e-5, max_iter=40,
                          verbose=False)
    w = np.asarray(w)
    assert w.shape == (32768,)
    assert np.all(np.isfinite(w))
    # The solve must actually reduce the residual: check via one matvec.
    resid = np.asarray(engine.ztzv(w / 1000)) + \
        model.kernel.get_lambda() ** 2 * w / 1000 - \
        np.asarray(precond.get_zty()) / 1000
    rhs_norm = np.linalg.norm(np.asarray(precond.get_zty()) / 1000)
    assert np.linalg.norm(resid) < 1e-3 * rhs_norm
