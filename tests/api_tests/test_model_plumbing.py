"""Model / kernel state-machine contracts (reference:
model_baseclass.py property setters, kernel_baseclass bounds handling,
dataset_builder validation)."""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
from utils.synthetic import tabular_data

HPARAMS = np.array([-1.7908995, -3.9549678])


@pytest.fixture(scope="module")
def fitted():
    (trx, tr_y), _ = tabular_data(n_train=400)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    model.fit(dset, mode="exact", suppress_var=True)
    return model, dset


def test_num_rffs_change_invalidates_weights(fitted):
    model, dset = fitted
    model.fit(dset, mode="exact", suppress_var=True)
    assert model.weights is not None
    model.num_rffs = 256
    assert model.weights is None
    assert model.kernel.get_num_rffs() == 256
    # hyperparams survive the re-init
    assert np.allclose(model.get_hyperparams(), HPARAMS)


def test_seed_change_invalidates_weights(fitted):
    model, dset = fitted
    model.fit(dset, mode="exact", suppress_var=True)
    model.random_seed = 999
    assert model.weights is None


def test_kernel_settings_change_resets_kernel(fitted):
    model, dset = fitted
    model.fit(dset, mode="exact", suppress_var=True)
    model.kernel_spec_parms = {"intercept": False}
    assert model.kernel is None
    with pytest.raises(RuntimeError):
        model.kernel_spec_parms = "not a dict"


def test_bounds_roundtrip():
    k = KERNEL_NAME_TO_CLASS["RBF"]((10, 5), 64)
    b = k.get_bounds()            # log-space
    assert np.allclose(np.exp(b), k.get_bounds(logspace=False))
    new = np.log(np.asarray([[1e-2, 1.0], [1e-3, 1.0]]))
    k.set_bounds(new)
    assert np.allclose(k.get_bounds(), new)
    with pytest.raises(RuntimeError):
        k.set_bounds(np.zeros((3, 2)))


def test_hyperparams_logspace_roundtrip():
    k = KERNEL_NAME_TO_CLASS["Matern"]((10, 5), 64,
                                       kernel_spec_parms={
                                           "matern_nu": 1.5})
    k.set_hyperparams(np.array([-1.0, -2.0]))
    assert np.allclose(k.get_hyperparams(), [-1.0, -2.0])
    assert np.allclose(k.get_hyperparams(logspace=False),
                       np.exp([-1.0, -2.0]))
    assert abs(k.get_lambda() - np.exp(-1.0)) < 1e-12


def test_builder_rejects_bad_input():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 4))
    y = rng.standard_normal(50)
    with pytest.raises(RuntimeError):
        build_regression_dataset(x, y[:20])
    xb = x.copy()
    xb[3, 2] = np.nan
    with pytest.raises(RuntimeError):
        build_regression_dataset(xb, y)
    with pytest.raises(RuntimeError):
        build_regression_dataset(x, np.full(50, 2.0))  # zero std
    x3 = rng.standard_normal((50, 6, 4))
    with pytest.raises(RuntimeError):
        build_regression_dataset(x3, y)  # missing sequence_lengths
    bad_len = np.full(50, 7, dtype=np.int64)
    with pytest.raises(RuntimeError):
        build_regression_dataset(x3, y, sequence_lengths=bad_len)


def test_variance_rffs_cap():
    model = GPRegression(num_rffs=8192, kernel_choice="RBF",
                         verbose=False)
    with pytest.raises(RuntimeError):
        model.variance_rffs = 5000  # > MAX_VARIANCE_RFFS


def test_unfitted_predict_raises(fitted):
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    with pytest.raises(RuntimeError):
        model.predict(np.zeros((4, 84)))


def test_device_property(fitted):
    model, _ = fitted
    # CPU-only test env: 'cpu' accepted, accelerators raise, junk raises.
    model.device = "cpu"
    assert model.device == "cpu"
    with pytest.raises(RuntimeError):
        model.device = "tpu"
    with pytest.raises(RuntimeError):
        model.device = "nonsense"


def test_double_precision_fht_rebuilds_kernel():
    (trx, tr_y), _ = tabular_data(n_train=300)
    dset = build_regression_dataset(trx, tr_y, chunk_size=150)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    assert model.double_precision_fht is False
    hp_before = model.get_hyperparams()
    model.double_precision_fht = True
    assert model.kernel.double_precision
    assert np.allclose(model.get_hyperparams(), hp_before)
    model.fit(dset, mode="exact", suppress_var=True)
    assert model.weights is not None


def test_speed_presets_set_and_restore_knobs():
    """set_speed_preset must land every knob on its documented value
    (docs/speed_modes.md) and be fully reversible."""
    from xgpr_tpu import config as cfg
    try:
        cfg.set_speed_preset("max")
        assert cfg.sincos_mode() == "fast"
        assert cfg.feature_matmul_precision() in ("default", "highest")
        cfg.set_speed_preset("reference")
        assert cfg.sincos_mode() == "exact"
        assert cfg.feature_precision() in ("highest",)
        import pytest
        with pytest.raises(ValueError):
            cfg.set_speed_preset("warp9")
    finally:
        cfg.set_speed_preset("balanced")
    assert cfg.sincos_mode() == "auto"
    assert cfg.feature_precision() in ("high", "highest")


def test_stacked_limit_knob_controls_engine_storage():
    """config.set_stacked_limit decides device-resident vs out-of-core
    storage for the single-device Engine, and the model's engine cache
    must not reuse an engine of the old kind after the knob changes."""
    from xgpr_tpu import config as cfg
    from xgpr_tpu.fitting.engine import Engine

    (trx, tr_y), _ = tabular_data(n_train=300)
    dset = build_regression_dataset(trx, tr_y, chunk_size=150)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    try:
        assert Engine(model.kernel, dset).mode == "stacked"
        eng_before = model._engine(dset)
        cfg.set_stacked_limit(1)
        assert Engine(model.kernel, dset).mode == "streaming"
        eng_after = model._engine(dset)
        assert eng_after is not eng_before
        import pytest
        with pytest.raises(ValueError):
            cfg.set_stacked_limit(0)
    finally:
        cfg.set_stacked_limit(10 ** 9)


def test_engine_mode_single_never_routes_to_shard_map():
    """config documents that engine_mode 'single' always uses the
    single-device engine: an out-of-core dataset must then run through
    the plain Engine's streaming loop, not a 1-device-mesh shard_map
    program."""
    from xgpr_tpu import config as cfg
    from xgpr_tpu.fitting.engine import Engine

    (trx, tr_y), _ = tabular_data(n_train=300)
    dset = build_regression_dataset(trx, tr_y, chunk_size=150)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    try:
        cfg.set_engine_mode("single")
        cfg.set_stacked_limit(1)
        engine = model._engine(dset)
        assert isinstance(engine, Engine)
        assert engine.mode == "streaming"
    finally:
        cfg.set_engine_mode("auto")
        cfg.set_stacked_limit(10 ** 9)


def test_engine_cache_keys_on_kernel_uid_not_id():
    """Dropping and rebuilding a same-shape kernel must yield a fresh
    engine even if CPython recycles the old kernel's id() for the new
    object (the engine cache keys on a never-recycled kernel uid)."""
    import gc

    (trx, tr_y), _ = tabular_data(n_train=300)
    dset = build_regression_dataset(trx, tr_y, chunk_size=150)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(HPARAMS, dset)
    first_engine = model._engine(dset)
    first_uid = model.kernel.get_uid()

    # Drop the kernel entirely, then rebuild an identically-shaped one;
    # the uid must be fresh and the cached engine must not be reused.
    model.kernel = None
    gc.collect()
    model._initialize_kernel(dset)
    model.set_hyperparams(HPARAMS, dset)
    assert model.kernel.get_uid() != first_uid
    second_engine = model._engine(dset)
    assert second_engine is not first_engine
