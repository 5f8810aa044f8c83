"""End-to-end gate for the fused Pallas CG matvec: a CG fit with
matvec mode forced to "pallas" (interpret mode on CPU) must agree with
the XLA parts path to fp32 roundoff.  Exercises the fused_cg dispatch
branch, mask handling and accumulation inside the real solver.

fp32 is required (the kernel gates out fp64), so this runs in a
subprocess with x64 disabled.
"""
import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
import sys, json
sys.path.insert(0, {repo!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset, config

rng = np.random.default_rng(3)
x = rng.standard_normal((512, 16)).astype(np.float32)
y = np.sin(x[:, 0] * 2.0) + 0.5 * x[:, 1]
out = {{}}
for mode in ("xla", "pallas"):
    config.set_matvec_mode(mode)
    # Deliberately awkward shapes: chunk rows not a tile multiple and a
    # frequency count that is not a lane multiple (num_rffs=200 -> F=100,
    # padded to 128 inside the kernel) -- the configurations that used to
    # fall back to XLA silently.
    data = build_regression_dataset(x, y, chunk_size=200)
    model = GPRegression(num_rffs=200, kernel_choice="RBF",
                         verbose=False, random_seed=77)
    model.set_hyperparams(np.log(np.array([0.05, 1.0])), data)
    n_iter, _ = model.fit(data, mode="cg", tol=1e-6, max_iter=60,
                          suppress_var=True, run_diagnostics=True)
    preds = model.predict(x[:64])
    out[mode] = {{"niter": int(n_iter),
                  "preds": np.asarray(preds).tolist()}}
print(json.dumps(out))
"""


@pytest.mark.slow
def test_pallas_matvec_cg_fit_matches_xla():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    script = _SCRIPT.format(repo=repo)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    import numpy as np
    p_xla = np.asarray(out["xla"]["preds"])
    p_pl = np.asarray(out["pallas"]["preds"])
    scale = max(1.0, np.abs(p_xla).max())
    assert np.abs(p_xla - p_pl).max() / scale < 1e-4
    assert abs(out["xla"]["niter"] - out["pallas"]["niter"]) <= 2
