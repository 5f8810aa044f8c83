"""fp32-never-NaN gate for preconditioner construction at degenerate
hyperparameters.

A crude tuner is free to propose extreme points (sigma -> 0 makes every
cos feature ~1, so the sketch is numerically rank-1).  The srht_2
whitening must degrade gracefully -- NaNs here livelock eigh on TPU and
crash the worker (observed on-chip; see ROUND_NOTES.md).  Runs in a
subprocess so fp32 (x64 disabled) can be forced.
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
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner

rng = np.random.default_rng(0)
rows, d = 8000, 32
x = rng.standard_normal((rows, d)).astype(np.float32)
y = (np.sin(2 * x @ (rng.standard_normal(d) / np.sqrt(d)))
     + 0.1 * rng.standard_normal(rows)).astype(np.float32)
data = build_regression_dataset(x, y, chunk_size=2000)

# sigma = e^-10: every projection argument ~0, sketch numerically rank-1.
for method in ("srht", "srht_2"):
    model = GPRegression(num_rffs=1024, kernel_choice="RBF",
                         verbose=False)
    model.set_hyperparams(np.array([-6.9, -10.0]), data)
    model._run_pre_fitting_prep(data)
    engine = model._engine(data)
    p = NystromPreconditioner(engine, 256, False, 123, method)
    for name, arr in (("u", p.u_mat), ("eig", p.eig)):
        assert not np.isnan(np.asarray(arr)).any(), (method, name)
    assert np.isfinite(p.achieved_ratio), method
print("DEGENERATE_OK")
"""


def test_degenerate_hyperparams_never_nan():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    script = _SCRIPT.format(repo=repo)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DEGENERATE_OK" in out.stdout
