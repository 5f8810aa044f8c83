"""Ragged corpora split across hosts: each host's LOCAL maximum sequence
axis differs, so hosts must agree on the global maximum before padding
(otherwise per-host batch shapes diverge and the global array assembly
fails).  Both the stacked and the streaming engine reconcile via one
metadata collective; reductions must match a single-process run on the
full, globally-padded data exactly."""
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
from xgpr_tpu.parallel.sharded import ShardedEngine
from xgpr_tpu.parallel.streaming import StreamingShardedEngine
from xgpr_tpu.parallel.distributed import global_data_mesh
from utils.synthetic import sequence_data

(trx, tr_y, trl), _ = sequence_data(n_train=400, max_len=24)
# Host 0: rows with length <= 16, x TRIMMED to its local max of 16.
# Host 1: the rest, local max 24.  The local datasets are therefore
# ragged ACROSS hosts: same channel width, different dim1.
short = trl <= 16
idx = np.where(short)[0] if pid == 0 else np.where(~short)[0]
# Equalize local chunk counts (2 chunks each) by capping rows; the row
# SPLIT stays unequal across hosts via chunk fill.
idx = idx[:160]
x_loc, y_loc, l_loc = trx[idx], tr_y[idx], trl[idx]
local_max = int(l_loc.max())
x_loc = x_loc[:, :local_max, :]
local = build_regression_dataset(x_loc, y_loc, sequence_lengths=l_loc,
                                 chunk_size=80, normalize_y=False)
assert local.get_xdim()[1] == local_max

model = GPRegression(num_rffs=128, kernel_choice="Conv1dRBF",
                     kernel_settings={{"conv_width": 9}}, verbose=False)
model.set_hyperparams(np.array([-1.0, -1.5]), local)

results = {{}}
for name, eng_cls in (("stacked", ShardedEngine),
                      ("streaming", StreamingShardedEngine)):
    engine = eng_cls(model.kernel, local, global_data_mesh())
    # Both hosts must have padded to the same (global max) dim1.
    assert local.padded_seq_len() == 24, local.padded_seq_len()
    ztz, zty, yty = engine.design_mat()
    results[name] = {{
        "tr": float(np.trace(np.asarray(ztz))),
        "zty_norm": float(np.linalg.norm(np.asarray(zty))),
        "yty": float(yty),
        "n": int(engine.ndatapoints),
    }}
if pid == 0:
    print("RESULT " + json.dumps(results))
"""


@pytest.mark.slow
def test_ragged_across_hosts_matches_single(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    tests = os.path.join(repo, "tests")
    script = _WORKER.format(repo=repo, tests=tests, port=12397)
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

    # Single-process reference: the same rows, globally padded to 24.
    sys.path.insert(0, tests)
    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu.fitting.engine import Engine
    from utils.synthetic import sequence_data
    (trx, tr_y, trl), _ = sequence_data(n_train=400, max_len=24)
    short = trl <= 16
    idx = np.concatenate([np.where(short)[0][:160],
                          np.where(~short)[0][:160]])
    dset = build_regression_dataset(trx[idx], tr_y[idx],
                                    sequence_lengths=trl[idx],
                                    chunk_size=80, normalize_y=False)
    model = GPRegression(num_rffs=128, kernel_choice="Conv1dRBF",
                         kernel_settings={"conv_width": 9}, verbose=False)
    model.set_hyperparams(np.array([-1.0, -1.5]), dset)
    ztz, zty, yty = Engine(model.kernel, dset).design_mat()
    want = {"tr": float(np.trace(np.asarray(ztz))),
            "zty_norm": float(np.linalg.norm(np.asarray(zty))),
            "yty": float(yty)}

    for name in ("stacked", "streaming"):
        got = dist[name]
        assert got["n"] == 320, got
        for key, val in want.items():
            assert np.isclose(got[key], val, rtol=1e-8), (name, key, got)
