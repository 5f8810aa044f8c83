"""global_host_reduce is the metadata collective every multi-host engine
trusts for stream geometry (row totals, superbatch counts, ragged dim1
maxima).  Exercise it directly with 2 processes x 4 virtual devices per
host — the sum path divides each host's value over its local devices, so
multi-device hosts are the case a 1-device-per-process test misses."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4 " \
    "--xla_cpu_collective_call_terminate_timeout_seconds=600"
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
sys.path.insert(0, {repo!r})
from xgpr_tpu.parallel.distributed import global_host_reduce

assert jax.local_device_count() == 4, jax.local_device_count()
# Host 0 contributes (600 rows, 3 steps, dim1 11); host 1 (200, 7, 24).
vals = (600.0, 3.0, 11.0) if pid == 0 else (200.0, 7.0, 24.0)
out = global_host_reduce(vals, ("sum", "max", "max"))
if pid == 0:
    print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_sum_and_max_across_multidevice_hosts(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    script = _WORKER.format(repo=repo, port=12399)
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
    got = json.loads(result_line[0][len("RESULT "):])
    assert np.allclose(got, [800.0, 7.0, 24.0]), got


def test_reduce_program_memoized():
    """Repeated engine constructions must reuse one compiled collective
    per (ops, mesh) pair instead of retracing a fresh closure each call
    (remote compiles cost minutes through the TPU relay)."""
    from jax.sharding import Mesh
    import jax
    from xgpr_tpu.parallel import distributed as dist

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    fn_a = dist._host_reduce_program(("sum", "max"), mesh)
    fn_b = dist._host_reduce_program(("sum", "max"), mesh)
    fn_c = dist._host_reduce_program(("max",), mesh)
    assert fn_a is fn_b
    assert fn_c is not fn_a
