"""TPU-numerics validation: the full pipeline in float32 (x64 disabled)
must reproduce the float64 results within the reference's own fp32
tolerances (rtol/atol 1e-3, test_rbf_rfgen.py:104; NMLL within 0.1%).

x64 cannot be toggled after backend init, so the fp32 run happens in a
subprocess.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)   # fp32, like TPU
import sys, json
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset
from utils.synthetic import tabular_data, spearman

(trx, tr_y), (tex, te_y) = tabular_data(n_train=1200)
dset = build_regression_dataset(trx, tr_y, chunk_size=300)
model = GPRegression(num_rffs=1024, variance_rffs=64,
                     kernel_choice="RBF", verbose=False)
hp = np.array([-1.7908995, -3.9549678])
model.set_hyperparams(hp, dset)
precond, ratio = model.build_preconditioner(dset, max_rank=128,
                                            method="srht")
n_iter, _ = model.fit(dset, preconditioner=precond, mode="cg", tol=1e-5,
                      run_diagnostics=True)
preds, var = model.predict(tex, get_var=True)
nmll = model.exact_nmll(hp, dset)
print(json.dumps({{
    "spearman": spearman(preds, te_y),
    "n_iter": int(n_iter),
    "nmll": float(nmll),
    "ratio": float(ratio),
    "var_min": float(var.min()),
}}))
"""


@pytest.mark.slow
def test_fp32_pipeline_matches_fp64():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    script = _SCRIPT.format(repo=repo, tests=tests)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    fp32 = json.loads(out.stdout.strip().splitlines()[-1])

    # fp64 reference values computed in-process.
    sys.path.insert(0, tests)
    from xgpr_tpu import GPRegression, build_regression_dataset
    from utils.synthetic import tabular_data, spearman
    (trx, tr_y), (tex, te_y) = tabular_data(n_train=1200)
    dset = build_regression_dataset(trx, tr_y, chunk_size=300)
    model = GPRegression(num_rffs=1024, variance_rffs=64,
                         kernel_choice="RBF", verbose=False)
    hp = np.array([-1.7908995, -3.9549678])
    model.set_hyperparams(hp, dset)
    nmll64 = model.exact_nmll(hp, dset)
    model.fit(dset, mode="exact", suppress_var=True)
    rho64 = spearman(model.predict(tex), te_y)

    assert abs(fp32["nmll"] - nmll64) / abs(nmll64) < 1e-3
    assert abs(fp32["spearman"] - rho64) < 0.02
    assert fp32["n_iter"] < 25
    assert fp32["var_min"] >= 0
