"""Multi-device equivalence: N-device sharded reductions must reproduce
single-device results exactly (up to fp associativity), per SURVEY.md
section 4's multi-host test prescription."""
import sys
import os
import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu.fitting.engine import Engine
from xgpr_tpu.fitting.cg import ConjugateGrad, cg_fit
from xgpr_tpu.parallel import ShardedEngine, data_mesh
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    (trx, tr_y), _ = tabular_data(n_train=1600)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    kernel = model.kernel
    single = Engine(kernel, dset)
    mesh = data_mesh(8)
    sharded = ShardedEngine(kernel, dset, mesh)
    return single, sharded, kernel


def test_ztzv_matches(setup):
    single, sharded, kernel = setup
    rng = np.random.default_rng(0)
    v = rng.standard_normal((kernel.get_num_rffs(), 3))
    a = np.asarray(single.ztzv(v))
    b = np.asarray(sharded.ztzv(v))
    assert np.allclose(a, b, rtol=1e-9, atol=1e-9)


def test_design_mat_matches(setup):
    single, sharded, _ = setup
    a1, b1, c1 = single.design_mat()
    a2, b2, c2 = sharded.design_mat()
    assert np.allclose(np.asarray(a1), np.asarray(a2), rtol=1e-9)
    assert np.allclose(np.asarray(b1), np.asarray(b2), rtol=1e-9)
    assert abs(c1 - c2) < 1e-6 * abs(c1)


def test_sketch_matches(setup):
    single, sharded, kernel = setup
    from xgpr_tpu.utils.rng import srht_state
    radem, idx = srht_state(42, kernel.get_num_rffs(), 128, np.float64)
    a, zty_a, yty_a = single.sketch(radem, idx, with_zty=True)
    b, zty_b, yty_b = sharded.sketch(radem, idx, with_zty=True)
    assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-9)
    assert np.allclose(np.asarray(zty_a), np.asarray(zty_b), rtol=1e-9)


def test_sharded_conv_kernel_matches(setup):
    """Sequence (conv) kernels shard too: lengths ride the data axis."""
    from utils.synthetic import sequence_data
    (trx, tr_y, trl), _ = sequence_data(n_train=320)
    dset = build_regression_dataset(trx, tr_y, sequence_lengths=trl,
                                    chunk_size=40)
    model = GPRegression(num_rffs=128, kernel_choice="Conv1dRBF",
                         kernel_settings={"conv_width": 9}, verbose=False)
    model.set_hyperparams(np.array([-1.0, -1.5]), dset)
    single = Engine(model.kernel, dset)
    sharded = ShardedEngine(model.kernel, dset, data_mesh(8))
    rng = np.random.default_rng(5)
    v = rng.standard_normal((128, 2))
    assert np.allclose(np.asarray(single.ztzv(v)),
                       np.asarray(sharded.ztzv(v)), rtol=1e-9, atol=1e-9)
    a1, b1, c1 = single.design_mat()
    a2, b2, c2 = sharded.design_mat()
    assert np.allclose(np.asarray(a1), np.asarray(a2), rtol=1e-9)


def test_sharded_miniard_matches(setup):
    (trx, tr_y), _ = tabular_data(n_train=800)
    dset = build_regression_dataset(trx, tr_y, chunk_size=100)
    model = GPRegression(num_rffs=256, kernel_choice="MiniARD",
                         kernel_settings={"split_points": [40]},
                         verbose=False)
    model.set_hyperparams(np.array([-1.0, -3.0, -2.5]), dset)
    single = Engine(model.kernel, dset)
    sharded = ShardedEngine(model.kernel, dset, data_mesh(8))
    v = np.random.default_rng(9).standard_normal((256, 2))
    assert np.allclose(np.asarray(single.ztzv(v)),
                       np.asarray(sharded.ztzv(v)), rtol=1e-9, atol=1e-9)


def test_gradient_terms_match(setup):
    """Exact-gradient (L-BFGS-B) tuning terms must run SPMD on the mesh
    and agree with the single-device engine exactly."""
    single, sharded, _ = setup
    a = single.gradient_terms()
    b = sharded.gradient_terms()
    for t1, t2 in zip(a[:5], b[:5]):
        assert np.allclose(np.asarray(t1), np.asarray(t2),
                           rtol=1e-9, atol=1e-9)
    assert a[5] == b[5]


def test_lbfgs_tuning_on_mesh(setup):
    """A short L-BFGS-B exact tune through the sharded engine must agree
    with the single-device result (N-dev == 1-dev)."""
    from xgpr_tpu import config as xcfg
    (trx, tr_y), _ = tabular_data(n_train=800)
    dset = build_regression_dataset(trx, tr_y, chunk_size=100)

    def run_tune():
        model = GPRegression(num_rffs=256, kernel_choice="RBF",
                             verbose=False)
        return model.tune_hyperparams(
            dset, max_iter=5, tuning_method="L-BFGS-B",
            starting_hyperparams=HPARAMS.copy())

    xcfg.set_engine_mode("single")
    try:
        hp_single, _, score_single = run_tune()
        xcfg.set_engine_mode("sharded")
        hp_sharded, _, score_sharded = run_tune()
    finally:
        xcfg.set_engine_mode("auto")
    assert np.allclose(hp_single, hp_sharded, rtol=1e-6, atol=1e-8)
    assert abs(score_single - score_sharded) < 1e-5 * abs(score_single)


def test_full_cg_fit_on_mesh(setup):
    """Preconditioner build + PCG fit entirely through the sharded engine."""
    single, sharded, kernel = setup
    p1 = NystromPreconditioner(single, 128, random_state=123,
                               method="srht")
    p2 = NystromPreconditioner(sharded, 128, random_state=123,
                               method="srht")
    w1, n1, _ = cg_fit(single, p1, tol=1e-7, verbose=False)
    w2, n2, _ = cg_fit(sharded, p2, tol=1e-7, verbose=False)
    assert n1 == n2
    assert np.allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6,
                       atol=1e-8)
