"""GramEngine must reproduce the streaming estimator exactly.

The cached-Gram engine exists so the SLQ estimator can be scored in
float64 at dataset scale without re-streaming features every CG
iteration (see fitting/gram_engine.py).  That argument only holds if a
run through GramEngine is the same algorithm as a run through the
streaming Engine: same sketch, same preconditioner, same Lanczos
coefficients, same NMLL.  In fp64 the two should agree to roundoff.
"""
import numpy as np
import pytest

from xgpr_tpu import GPRegression, build_regression_dataset, constants
from xgpr_tpu.fitting.engine import Engine
from xgpr_tpu.fitting.gram_engine import GramEngine
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from xgpr_tpu.scoring.slq import slq_nmll_from_engine


def _setup(kernel_choice="RBF", n=3000, d=32, num_rffs=512, seed=5):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float64)
    y = np.sin(x[:, 0]) + 0.5 * x[:, 1] ** 2 \
        + 0.1 * rng.standard_normal(n)
    data = build_regression_dataset(x, y, chunk_size=500)
    model = GPRegression(num_rffs=num_rffs, kernel_choice=kernel_choice,
                         variance_rffs=64)
    model.set_hyperparams(np.log(np.array([0.3, 1.2])), data)
    return model, data


def test_gram_engine_matches_streaming_slq_nmll():
    model, data = _setup()
    rank, seed = 64, 123

    direct = model.approximate_nmll(
        model.get_hyperparams(), data,
        manual_settings={"max_rank": rank,
                         "preconditioner_mode": "srht_2"})

    engine = Engine(model.kernel, data)
    gram, zty, yty = engine.design_mat()
    gram_engine = GramEngine(np.asarray(gram), np.asarray(zty), yty,
                             model.kernel, data.get_ndatapoints())
    precond = NystromPreconditioner(gram_engine, rank,
                                    random_state=seed, method="srht_2")
    params = constants.DEFAULT_NMLL_PARAMS
    via_gram = slq_nmll_from_engine(
        gram_engine, precond, seed, params["nsamples"],
        params["nmll_iter"], params["nmll_tol"])

    assert abs(via_gram - direct) / abs(direct) < 1e-8


def test_gram_engine_sketch_matches_streaming_sketch():
    model, data = _setup(num_rffs=256)
    engine = Engine(model.kernel, data)
    gram, zty, yty = engine.design_mat()
    gram_engine = GramEngine(np.asarray(gram), np.asarray(zty), yty,
                             model.kernel, data.get_ndatapoints())

    from xgpr_tpu.utils import rng as state_rng
    radem, idx = state_rng.srht_state(123, engine.num_rffs, 32, np.float64)
    acc_stream, zty_s, yty_s = engine.sketch(radem, idx, with_zty=True)
    acc_gram, zty_g, yty_g = gram_engine.sketch(radem, idx, with_zty=True)
    np.testing.assert_allclose(np.asarray(acc_gram),
                               np.asarray(acc_stream), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(zty_g), np.asarray(zty_s),
                               rtol=1e-12, atol=1e-10)
    assert abs(yty_g - yty_s) / abs(yty_s) < 1e-12


def test_gram_engine_rejects_row_subsampling():
    model, data = _setup(num_rffs=256)
    engine = Engine(model.kernel, data)
    gram, zty, yty = engine.design_mat()
    gram_engine = GramEngine(np.asarray(gram), np.asarray(zty), yty,
                             model.kernel, data.get_ndatapoints())
    from xgpr_tpu.utils import rng as state_rng
    radem, idx = state_rng.srht_state(123, engine.num_rffs, 32, np.float64)
    with pytest.raises(RuntimeError):
        gram_engine.sketch(radem, idx, row_keep_prob=0.1)
