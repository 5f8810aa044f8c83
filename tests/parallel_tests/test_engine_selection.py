"""Engine auto-selection: stacked-vs-streaming capacity is per-host.

The stacked ShardedEngine holds each host's data shard in that host's
LOCAL devices, so the capacity comparison must be
``elements / (limit * local_device_count) < 1`` (reduced with MAX
across hosts so every host makes the same choice) -- comparing against
the global device total would overestimate aggregate capacity by the
host count and route an oversized dataset to the stacked engine.
"""
import numpy as np
import pytest

from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu import config as xcfg
from xgpr_tpu.parallel.sharded import ShardedEngine
from xgpr_tpu.parallel.streaming import StreamingShardedEngine

N, D = 4096, 64
N_ELEMENTS = N * D


@pytest.fixture
def model_and_data():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, D)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    data = build_regression_dataset(x, y, chunk_size=512)
    model = GPRegression(num_rffs=512, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(np.log(np.array([0.1, 0.25])), data)
    xcfg.set_engine_mode("sharded")
    restore = xcfg.stacked_element_limit()
    yield model, data
    xcfg.set_engine_mode("auto")
    xcfg.set_stacked_limit(restore)


def test_capacity_is_per_host(model_and_data):
    import jax
    model, data = model_and_data
    n_local = jax.local_device_count()

    # Ample capacity: stacked.
    xcfg.set_stacked_limit(10 ** 9)
    assert type(model._engine(data)) is ShardedEngine

    # Dataset over the per-host device capacity: streaming, even though
    # limit * global_device_count would (wrongly) say it fits.
    xcfg.set_stacked_limit(N_ELEMENTS // (n_local * 2))
    assert type(model._engine(data)) is StreamingShardedEngine

    # Just inside per-host capacity: stacked again.
    xcfg.set_stacked_limit(N_ELEMENTS // n_local + 1)
    assert type(model._engine(data)) is ShardedEngine


def test_stale_engine_released_before_rebuild(model_and_data):
    """A capacity flip must leave exactly one cached engine, and the
    stale (device-resident) one must be dropped BEFORE the replacement
    is built so peak device memory is never doubled."""
    model, data = model_and_data
    xcfg.set_stacked_limit(10 ** 9)
    first = model._engine(data)
    xcfg.set_stacked_limit(N_ELEMENTS // (2 * 16))
    second = model._engine(data)
    assert second is not first
    assert list(model._engines.values()) == [second]
