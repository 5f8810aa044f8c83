"""True multi-host OUT-OF-CORE execution: two OS processes each stream
their local half of the dataset superbatch-by-superbatch through the
global 2-device mesh (data never stacked device-resident); the
preconditioned CG fit must match a single-process fit on the full data."""
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
from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
from xgpr_tpu.fitting.cg import cg_fit
from utils.synthetic import tabular_data

(trx, tr_y), _ = tabular_data(n_train=800)
lo, hi = (0, 400) if pid == 0 else (400, 800)
local = build_regression_dataset(trx[lo:hi], tr_y[lo:hi], chunk_size=200,
                                 normalize_y=False)

model = GPRegression(num_rffs=256, kernel_choice="RBF", verbose=False)
model.set_hyperparams(np.array([-1.79, -3.95]), local)
engine = StreamingShardedEngine(model.kernel, local, global_data_mesh(),
                                batches_per_step=1)
assert engine._x is None  # never device-resident
assert engine.ndatapoints == 800, engine.ndatapoints
precond = NystromPreconditioner(engine, 64, random_state=123,
                                method="srht")
weights, n_iter, _ = cg_fit(engine, precond, tol=1e-8, verbose=False)
if pid == 0:
    print("RESULT " + json.dumps({{
        "n_iter": int(n_iter),
        "w_head": [float(v) for v in np.asarray(weights)[:5]],
        "w_norm": float(np.linalg.norm(np.asarray(weights))),
    }}))
"""


@pytest.mark.slow
def test_two_process_streaming_fit_matches_single(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    script = _WORKER.format(repo=repo, tests=tests, port=12359)
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
    from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
    from xgpr_tpu.fitting.cg import cg_fit
    from utils.synthetic import tabular_data
    (trx, tr_y), _ = tabular_data(n_train=800)
    dset = build_regression_dataset(trx, tr_y, chunk_size=200,
                                    normalize_y=False)
    model = GPRegression(num_rffs=256, kernel_choice="RBF", verbose=False)
    model.set_hyperparams(np.array([-1.79, -3.95]), dset)
    engine = Engine(model.kernel, dset)
    precond = NystromPreconditioner(engine, 64, random_state=123,
                                    method="srht")
    weights, n_iter, _ = cg_fit(engine, precond, tol=1e-8, verbose=False)

    assert dist["n_iter"] == n_iter
    assert np.allclose(dist["w_head"], np.asarray(weights)[:5], rtol=1e-6)
    assert abs(dist["w_norm"]
               - float(np.linalg.norm(np.asarray(weights)))) < 1e-6 * \
        dist["w_norm"]
