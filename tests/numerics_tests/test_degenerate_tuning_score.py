"""fp32 crude-tuner scoring must never report spuriously NEGATIVE scores
at degenerate hyperparameters.

Observed on-chip: accelerator fp32 eigh of the near-singular jittered
Z^T Z at sigma -> 0 returns eigenpairs whose explained energy exceeds
y^T y; with the quadratic term clipped to zero the logdet made the score
~ -30000, and the tuner drove the hyperparameters to the bounds.  The
eigendecomposition now runs in host float64 and the score grid flags
impossible residuals as DEFAULT_SCORE_IF_PROBLEM.  Runs in a subprocess
so fp32 (x64 disabled) can be forced.
"""
import os
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)   # fp32, like TPU
import sys
sys.path.insert(0, {repo!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu.scoring.lb_optimizer import (shared_hparam_search,
                                           generate_scoregrid)
from xgpr_tpu.constants import DEFAULT_SCORE_IF_PROBLEM

rng = np.random.default_rng(0)
x = rng.standard_normal((2000, 32)).astype(np.float32)
y = np.sin(2 * x @ (rng.standard_normal(32) / np.sqrt(32))).astype(
    np.float32)
data = build_regression_dataset(x, y, chunk_size=1000)
model = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
model._run_pre_nmll_prep(data)

# Degenerate sigma: features numerically constant, Z^T Z numerically
# rank-1.  The telescoping score must be sane (the lambda-of-choice is
# the upper bound, score comparable to scoring pure noise) -- never
# very negative.
score, hp = shared_hparam_search(
    np.array([-9.31]), model.kernel, lambda: model._engine(data),
    model.kernel.get_bounds())
assert np.isfinite(score) or score == DEFAULT_SCORE_IF_PROBLEM
assert score > 0, score

# The score-grid guard: eigenpairs inconsistent enough that the
# explained energy exceeds y^T y must map to the sentinel.
eig = np.array([1.0, 0.5])
proj = np.array([10.0, 10.0])        # |proj|^2 / eig >> yty
grid = generate_scoregrid(4, eig, proj, np.array([0.1, 1.0]),
                          y_trans_y=1.0, ndatapoints=100)
assert np.all(grid == DEFAULT_SCORE_IF_PROBLEM), grid
print("DEGENERATE_SCORE_OK")
"""


def test_degenerate_tuning_score_never_negative():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    script = _SCRIPT.format(repo=repo)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DEGENERATE_SCORE_OK" in out.stdout
