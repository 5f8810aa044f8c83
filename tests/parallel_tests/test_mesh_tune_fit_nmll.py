"""North-star pipeline on the mesh: NMLL hyperparameter tuning on the
STREAMED/SHARDED path (BASELINE config #5, scaled to fit this host),
then a fit at the tuned point and an SLQ-vs-exact NMLL verification.

Demonstrates "sharded across hosts with tuning" end-to-end rather than
composing the pieces: the tuner's every dataset reduction runs through
the StreamingShardedEngine's shard_map programs on the virtual 8-device
mesh (stacked limit forced tiny), and the tuned hyperparameters must
agree with the single-device tuner (the engines are built to be
numerically identical, so the whole tuning trajectory matches).
"""
import sys
import os
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu import config as xconfig


def _conv_problem(n=768, l=8, d=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, l, d)).astype(np.float64)
    lengths = rng.integers(3, l + 1, size=n).astype(np.int32)
    w = rng.standard_normal(d) / np.sqrt(d)
    y = np.tanh(x @ w).mean(axis=1) + 0.1 * rng.standard_normal(n)
    return x, y, lengths


def _tune_fit_nmll(x, y, lengths):
    dset = build_regression_dataset(x, y, sequence_lengths=lengths,
                                    chunk_size=96)
    model = GPRegression(num_rffs=256, kernel_choice="Conv1dRBF",
                         verbose=False,
                         kernel_settings={"conv_width": 3})
    hparams, _, score = model.tune_hyperparams_crude(dset,
                                                     max_bayes_iter=6)
    model.fit(dset, mode="cg", tol=1e-7, suppress_var=True)
    weights = np.asarray(model.weights)  # NMLL calls reset hyperparams,
    # which invalidates the fitted weights -- capture them first.
    approx = model.approximate_nmll(np.asarray(hparams), dset,
                                    manual_settings={"max_rank": 64})
    exact = model.exact_nmll(np.asarray(hparams), dset)
    return np.asarray(hparams), float(score), weights, \
        float(approx), float(exact)


def test_streamed_mesh_tuning_pipeline_matches_single():
    x, y, lengths = _conv_problem()
    try:
        # Streamed/sharded: every tuner reduction goes through the
        # StreamingShardedEngine's superbatched shard_map programs.
        xconfig.set_engine_mode("sharded")
        xconfig.set_stacked_limit(1)
        hp_mesh, score_mesh, w_mesh, approx_mesh, exact_mesh = \
            _tune_fit_nmll(x, y, lengths)

        xconfig.set_engine_mode("single")
        xconfig.set_stacked_limit(10 ** 9)
        hp_single, score_single, w_single, _, exact_single = \
            _tune_fit_nmll(x, y, lengths)
    finally:
        xconfig.set_engine_mode("auto")
        xconfig.set_stacked_limit(10 ** 9)

    # Tuned hyperparameters from the streamed mesh path must equal the
    # single-device tuner's (identical reductions -> identical search).
    assert np.allclose(hp_mesh, hp_single, atol=1e-6), \
        f"mesh {hp_mesh} vs single {hp_single}"
    assert np.isfinite(score_mesh)
    assert abs(score_mesh - score_single) <= 1e-6 * abs(score_single)

    # The fitted weights at the tuned point agree too.
    denom = float(np.linalg.norm(w_single))
    assert float(np.linalg.norm(w_mesh - w_single)) / denom < 1e-5

    # NMLL verification at the tuned point: SLQ on the streamed/sharded
    # path within the reference's 1% gate of the exact evaluation (the
    # 0.1% north-star check runs at the 1M shape in
    # scripts/million_point_tune_fit.py where SLQ has the N and probe
    # budget it was designed for).
    assert abs(approx_mesh - exact_mesh) / abs(exact_mesh) < 0.01
    assert abs(exact_mesh - exact_single) / abs(exact_single) < 1e-8
