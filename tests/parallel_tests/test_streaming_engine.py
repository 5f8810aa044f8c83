"""Out-of-core streaming on a mesh: StreamingShardedEngine must reproduce
single-device and stacked-sharded results exactly while never holding the
dataset resident on device, and a model-level fit routed through it (as
happens when a dataset exceeds config's stacked limit) must match the
single-device fit.  Mirrors the reference's out-of-core path
(offline_data_handling.py:73-108, cg_tools.py:26-53) on the virtual
8-device mesh."""
import sys
import os
import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, GPClassification, \
    build_regression_dataset, build_classification_dataset
from xgpr_tpu.fitting.engine import Engine
from xgpr_tpu.fitting.cg import cg_fit
from xgpr_tpu.parallel import (ShardedEngine, StreamingShardedEngine,
                               data_mesh)
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    (trx, tr_y), _ = tabular_data(n_train=1700)  # odd chunk tail on purpose
    dset = build_regression_dataset(trx, tr_y, chunk_size=150)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    kernel = model.kernel
    single = Engine(kernel, dset, mode="streaming")
    mesh = data_mesh(8)
    stacked = ShardedEngine(kernel, dset, mesh)
    streaming = StreamingShardedEngine(kernel, dset, mesh,
                                       batches_per_step=2)
    return single, stacked, streaming, kernel, dset


def test_no_device_resident_stack(setup):
    _, _, streaming, _, _ = setup
    assert streaming._x is None and streaming._y is None


def test_ztzv_matches(setup):
    single, stacked, streaming, kernel, _ = setup
    rng = np.random.default_rng(0)
    v = rng.standard_normal((kernel.get_num_rffs(), 3))
    a = np.asarray(single.ztzv(v))
    b = np.asarray(streaming.ztzv(v))
    c = np.asarray(stacked.ztzv(v))
    assert np.allclose(a, b, rtol=1e-9, atol=1e-9)
    assert np.allclose(b, c, rtol=1e-9, atol=1e-9)


def test_design_mat_and_zty_match(setup):
    single, _, streaming, _, _ = setup
    a1, b1, c1 = single.design_mat()
    a2, b2, c2 = streaming.design_mat()
    assert np.allclose(np.asarray(a1), np.asarray(a2), rtol=1e-9)
    assert np.allclose(np.asarray(b1), np.asarray(b2), rtol=1e-9)
    assert abs(c1 - c2) < 1e-6 * abs(c1)
    z1, y1 = single.zty()
    z2, y2 = streaming.zty()
    assert np.allclose(np.asarray(z1), np.asarray(z2), rtol=1e-9)
    assert abs(y1 - y2) < 1e-6 * abs(y1)


def test_sketch_and_var_design_match(setup):
    single, _, streaming, kernel, _ = setup
    from xgpr_tpu.utils.rng import srht_state
    radem, idx = srht_state(42, kernel.get_num_rffs(), 128, np.float64)
    a, zty_a, yty_a = single.sketch(radem, idx, with_zty=True)
    b, zty_b, yty_b = streaming.sketch(radem, idx, with_zty=True)
    assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-9)
    assert np.allclose(np.asarray(zty_a), np.asarray(zty_b), rtol=1e-9)
    v1 = np.asarray(single.var_design_mat(16))
    v2 = np.asarray(streaming.var_design_mat(16))
    assert np.allclose(v1, v2, rtol=1e-9)


def test_gradient_terms_match(setup):
    single, _, streaming, _, _ = setup
    a = single.gradient_terms()
    b = streaming.gradient_terms()
    for t1, t2 in zip(a[:5], b[:5]):
        assert np.allclose(np.asarray(t1), np.asarray(t2),
                           rtol=1e-9, atol=1e-9)
    assert a[5] == b[5]


def test_streamed_cg_fit_matches(setup):
    """Preconditioner build + per-iteration re-streamed PCG through the
    streaming engine equals the single-device fit."""
    single, _, streaming, _, _ = setup
    p1 = NystromPreconditioner(single, 128, random_state=123,
                               method="srht")
    p2 = NystromPreconditioner(streaming, 128, random_state=123,
                               method="srht")
    w1, n1, _ = cg_fit(single, p1, tol=1e-7, verbose=False)
    w2, n2, _ = cg_fit(streaming, p2, tol=1e-7, verbose=False)
    assert n1 == n2
    assert np.allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6,
                       atol=1e-8)


def test_model_fit_routes_streaming_when_too_big(monkeypatch):
    """A dataset whose element count exceeds the stacked limit must route
    through StreamingShardedEngine transparently and produce the same
    model as a single-device fit."""
    from xgpr_tpu import config as xcfg
    from xgpr_tpu.models import baseclass as bc
    import xgpr_tpu.fitting.engine as eng

    (trx, tr_y), (tex, _) = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)

    def run_fit():
        model = GPRegression(num_rffs=256, kernel_choice="RBF",
                             verbose=False)
        model.set_hyperparams(HPARAMS, dset)
        model.fit(dset, max_rank=128, min_rank=64)
        return model

    xcfg.set_engine_mode("single")
    try:
        ref_model = run_fit()
        # Force the "too big to stack" branch on the mesh.
        monkeypatch.setattr(xcfg, "_STACKED_ELEMENT_LIMIT", 1)
        monkeypatch.setattr(bc, "Engine", eng.Engine)
        xcfg.set_engine_mode("sharded")
        model = run_fit()
        engine = next(iter(model._engines.values()))
        assert isinstance(engine, StreamingShardedEngine)
    finally:
        xcfg.set_engine_mode("auto")
    p1 = ref_model.predict(tex[:200])
    p2 = model.predict(tex[:200])
    assert np.allclose(p1, p2, rtol=1e-5, atol=1e-7)


def test_streaming_from_disk_matches(tmp_path, setup):
    """Disk-backed (OfflineDataset) chunks stream through the mesh and
    produce the same reductions as an in-memory single-device engine --
    the reference's out-of-core npy-file story
    (offline_data_handling.py:73-108) on a mesh."""
    single, _, _, kernel, _ = setup
    (trx, tr_y), _ = tabular_data(n_train=1700)
    xfiles, yfiles = [], []
    for i in range(0, 1700, 340):
        xf = tmp_path / f"x{i}.npy"
        yf = tmp_path / f"y{i}.npy"
        np.save(xf, trx[i:i + 340])
        np.save(yf, tr_y[i:i + 340])
        xfiles.append(str(xf))
        yfiles.append(str(yf))
    offline = build_regression_dataset(xfiles, yfiles, chunk_size=340)
    online = build_regression_dataset(trx, tr_y, chunk_size=340)
    mesh = data_mesh(8)
    s_disk = StreamingShardedEngine(kernel, offline, mesh,
                                    batches_per_step=2)
    s_mem = Engine(kernel, online, mode="streaming")
    rng = np.random.default_rng(4)
    v = rng.standard_normal((kernel.get_num_rffs(), 2))
    a = np.asarray(s_mem.ztzv(v))
    b = np.asarray(s_disk.ztzv(v))
    # Offline files re-chunk at chunk_size boundaries differently from
    # the in-memory slices, so agreement is up to fp summation order.
    assert np.allclose(a, b, rtol=1e-8, atol=1e-10)
    z1, y1 = s_mem.zty()
    z2, y2 = s_disk.zty()
    assert np.allclose(np.asarray(z1), np.asarray(z2), rtol=1e-8)
    assert abs(y1 - y2) < 1e-6 * abs(y1)


def test_streaming_conv_kernel_matches(setup):
    """Sequence (conv) kernels stream too: lengths ride the superbatches."""
    from utils.synthetic import sequence_data
    (trx, tr_y, trl), _ = sequence_data(n_train=320)
    dset = build_regression_dataset(trx, tr_y, sequence_lengths=trl,
                                    chunk_size=40)
    model = GPRegression(num_rffs=128, kernel_choice="Conv1dRBF",
                         kernel_settings={"conv_width": 9}, verbose=False)
    model.set_hyperparams(np.array([-1.0, -1.5]), dset)
    single = Engine(model.kernel, dset, mode="streaming")
    streaming = StreamingShardedEngine(model.kernel, dset, data_mesh(8),
                                       batches_per_step=2)
    rng = np.random.default_rng(6)
    v = rng.standard_normal((128, 2))
    assert np.allclose(np.asarray(single.ztzv(v)),
                       np.asarray(streaming.ztzv(v)),
                       rtol=1e-9, atol=1e-9)


def test_streaming_classification(setup):
    """Softmax loss/grad and line-search reductions stream too."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((640, 12))
    w_true = rng.standard_normal((12, 3))
    y = np.argmax(x @ w_true + 0.1 * rng.standard_normal((640, 3)),
                  axis=1)
    dset = build_classification_dataset(x, y, chunk_size=100)
    model = GPClassification(num_rffs=128, kernel_choice="RBF",
                             verbose=False)
    model.set_hyperparams(np.array([-1.0, -1.0]), dset)
    mesh = data_mesh(8)
    single = Engine(model.kernel, dset, mode="streaming")
    streaming = StreamingShardedEngine(model.kernel, dset, mesh,
                                       batches_per_step=2)
    w = rng.standard_normal((128, 3))
    g1, l1 = single.classification_loss_grad(w, 0.1)
    g2, l2 = streaming.classification_loss_grad(w, 0.1)
    assert np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9,
                       atol=1e-9)
    assert abs(l1 - l2) < 1e-6 * abs(l1)
    d = rng.standard_normal((128, 3))
    steps = np.geomspace(1e-3, 1.0, 8)
    s1 = np.asarray(single.softmax_linesearch(w, d, steps, 0.1))
    s2 = np.asarray(streaming.softmax_linesearch(w, d, steps, 0.1))
    assert np.allclose(s1, s2, rtol=1e-9, atol=1e-9)


def test_single_device_out_of_core_routes_streaming(monkeypatch):
    """Without a multi-device mesh (simulated: should_shard False, mode
    "auto"), an out-of-core dataset must still get the superbatch +
    prefetch streaming engine on a 1-device mesh instead of the
    synchronous per-chunk loop, and the fit must match.  (engine_mode
    "single" is the explicit opt-out from this routing -- config
    promises it never builds shard_map programs; see
    api_tests/test_model_plumbing.py.)"""
    from xgpr_tpu import config as xcfg

    (trx, tr_y), (tex, _) = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)

    def run_fit():
        model = GPRegression(num_rffs=256, kernel_choice="RBF",
                             verbose=False)
        model.set_hyperparams(HPARAMS, dset)
        model.fit(dset, max_rank=128, min_rank=64)
        return model

    monkeypatch.setattr(xcfg, "should_shard", lambda: False)
    ref_model = run_fit()
    monkeypatch.setattr(xcfg, "_STACKED_ELEMENT_LIMIT", 1)
    model = run_fit()
    engine = next(iter(model._engines.values()))
    assert isinstance(engine, StreamingShardedEngine)
    assert engine.n_dev == 1
    p1 = ref_model.predict(tex[:200])
    p2 = model.predict(tex[:200])
    assert np.allclose(p1, p2, rtol=1e-5, atol=1e-7)
