"""The fused Pallas conv kernel must compose with the sharded
(shard_map + psum) engine: an 8-device conv CG fit with conv mode forced
to "pallas" (interpret mode on CPU) must match the single-device XLA
fit.  This is the combination that runs on a real TPU mesh.

fp32 is required (the kernel gates out fp64), so this runs in a
subprocess with x64 disabled and an 8-device virtual CPU mesh.
"""
import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
import sys, json
sys.path.insert(0, {repo!r})
import numpy as np
from xgpr_tpu import GPRegression, build_regression_dataset, config

rng = np.random.default_rng(4)
n, l, d, w = 256, 18, 6, 5
x = rng.standard_normal((n, l, d)).astype(np.float32)
sl = rng.integers(w, l + 1, size=n).astype(np.int32)
y = np.sin(x[:, 0, 0]) + x.mean(axis=(1, 2))
out = {{}}
for label, engine_mode, conv_mode in (
        ("single_xla", "single", "xla"),
        ("sharded_pallas", "sharded", "pallas")):
    config.set_engine_mode(engine_mode)
    config.set_conv_mode(conv_mode)
    data = build_regression_dataset(x, y, sequence_lengths=sl,
                                    chunk_size=64)
    model = GPRegression(num_rffs=256, kernel_choice="Conv1dRBF",
                         kernel_settings={{"conv_width": w}},
                         verbose=False, random_seed=31)
    model.set_hyperparams(np.log(np.array([0.05, 1.0])), data)
    model.fit(data, mode="cg", tol=1e-6, max_iter=60, suppress_var=True)
    preds = model.predict(x[:40], sequence_lengths=sl[:40])
    out[label] = np.asarray(preds).tolist()
config.set_engine_mode("auto")
config.set_conv_mode("auto")
print(json.dumps(out))
"""


@pytest.mark.slow
def test_sharded_pallas_conv_fit_matches_single_xla():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    script = _SCRIPT.format(repo=repo)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    import numpy as np
    a = np.asarray(out["single_xla"])
    b = np.asarray(out["sharded_pallas"])
    scale = max(1.0, np.abs(a).max())
    assert np.abs(a - b).max() / scale < 1e-4
