"""Fast feature mode (bf16 projection + bf16 Z materialisation) must be
statistically indistinguishable from the full-precision path.  Runs in an
fp32 subprocess; the explicit bf16 operand rounding makes the CPU numbers
identical to the TPU fast path's."""
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
sys.path.insert(0, {tests!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu import config as cfg
from utils.synthetic import tabular_data, spearman

(trx, tr_y), (tex, te_y) = tabular_data(n_train=1200)
ds = build_regression_dataset(trx, tr_y, chunk_size=300)
hp = np.array([-1.7908995, -3.9549678])

def run():
    m = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    nmll = float(m.exact_nmll(hp, ds))
    m.set_hyperparams(hp, ds)
    pre, _ = m.build_preconditioner(ds, max_rank=128, method="srht")
    m.fit(ds, preconditioner=pre, mode="cg", tol=1e-5,
          suppress_var=True)
    return spearman(m.predict(tex), te_y), nmll

rho32, nmll32 = run()
cfg.set_fast_features(True)
rho16, nmll16 = run()
print(json.dumps({{"rho32": rho32, "nmll32": nmll32,
                   "rho16": rho16, "nmll16": nmll16}}))
"""


@pytest.mark.slow
def test_fast_features_statistically_equivalent():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo, tests=tests)],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(r["rho16"] - r["rho32"]) < 0.02
    assert abs(r["nmll16"] - r["nmll32"]) / abs(r["nmll32"]) < 1e-3


_SINCOS_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
import sys, json
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu import config as cfg
from utils.synthetic import tabular_data, spearman

(trx, tr_y), (tex, te_y) = tabular_data(n_train=1200)
ds = build_regression_dataset(trx, tr_y, chunk_size=300)
hp = np.array([-1.7908995, -3.9549678])

def run():
    m = GPRegression(num_rffs=1024, kernel_choice="RBF", verbose=False)
    nmll = float(m.exact_nmll(hp, ds))
    m.set_hyperparams(hp, ds)
    pre, _ = m.build_preconditioner(ds, max_rank=128, method="srht")
    m.fit(ds, preconditioner=pre, mode="cg", tol=1e-5,
          suppress_var=True)
    return spearman(m.predict(tex), te_y), nmll

rho_a, nmll_a = run()
cfg.set_sincos_mode("fast")
rho_f, nmll_f = run()
print(json.dumps({{"rho_a": rho_a, "nmll_a": nmll_a,
                   "rho_f": rho_f, "nmll_f": nmll_f}}))
"""


@pytest.mark.slow
def test_fast_sincos_statistically_equivalent():
    """set_sincos_mode("fast") (half-cost full-period polynomial pair,
    4.1e-5 max elementwise error) must leave fit quality and exact NMLL
    statistically unchanged end-to-end."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    out = subprocess.run(
        [sys.executable, "-c", _SINCOS_SCRIPT.format(repo=repo,
                                                     tests=tests)],
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    r = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(r["rho_f"] - r["rho_a"]) < 0.02
    assert abs(r["nmll_f"] - r["nmll_a"]) / abs(r["nmll_a"]) < 1e-3
