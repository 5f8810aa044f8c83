"""Unequal per-host file splits must not deadlock the streaming engine:
the short host pads its stream with masked empty superbatches and the
global reduction still matches a single-process computation (VERDICT r2
weak #5 / next #8)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
from xgpr_tpu import GPRegression, build_regression_dataset
from xgpr_tpu.parallel.streaming import StreamingShardedEngine
from xgpr_tpu.parallel.distributed import global_data_mesh
from utils.synthetic import tabular_data

(trx, tr_y), _ = tabular_data(n_train=800)
# UNEQUAL split: host 0 holds 600 rows (3 chunks), host 1 holds 200
# rows (1 chunk) -> different local superbatch counts.
lo, hi = (0, 600) if pid == 0 else (600, 800)
local = build_regression_dataset(trx[lo:hi], tr_y[lo:hi], chunk_size=200,
                                 normalize_y=False)

model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
model.set_hyperparams(np.array([-1.79, -3.95]), local)
engine = StreamingShardedEngine(model.kernel, local, global_data_mesh(),
                                batches_per_step=1)
assert engine.ndatapoints == 800, engine.ndatapoints
ztz, zty, yty = engine.design_mat()
if pid == 0:
    print("RESULT " + json.dumps({{
        "tr": float(np.trace(np.asarray(ztz))),
        "zty_norm": float(np.linalg.norm(np.asarray(zty))),
        "yty": float(yty),
    }}))
"""


@pytest.mark.slow
def test_unequal_split_streaming_matches_single(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    script = _WORKER.format(repo=repo, tests=tests, port=12391)
    wfile = tmp_path / "worker.py"
    wfile.write_text(script)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(wfile), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    result_line = [l for l in outs[0][0].splitlines()
                   if l.startswith("RESULT ")]
    assert result_line, outs[0][0]
    dist = json.loads(result_line[0][len("RESULT "):])

    sys.path.insert(0, tests)
    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu.fitting.engine import Engine
    from utils.synthetic import tabular_data
    (trx, tr_y), _ = tabular_data(n_train=800)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200,
                                    normalize_y=False)
    model = GPRegression(num_rffs=128, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(np.array([-1.79, -3.95]), dset)
    ztz, zty, yty = Engine(model.kernel, dset).design_mat()

    assert np.isclose(dist["tr"], float(np.trace(np.asarray(ztz))),
                      rtol=1e-8)
    assert np.isclose(dist["zty_norm"],
                      float(np.linalg.norm(np.asarray(zty))), rtol=1e-8)
    assert np.isclose(dist["yty"], float(yty), rtol=1e-8)
