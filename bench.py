"""Headline benchmark: streamed CG matvec throughput (the hot loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The measured program is the framework's hot loop -- a batched-RHS CG matvec
Z^T (Z v): SORF random features are generated on-chip and immediately
consumed by the two matmuls, exactly as in fitting (cg_tools.py:26-53 in
the reference).  The output is a small (M, K) matrix whose value depends on
every chunk, so timing it forces full execution without the (very slow)
host-transfer path of this environment's TPU tunnel.

``value`` is random features generated+consumed per second per chip.
``vs_baseline`` is the ratio to the same program on XLA-CPU on this host
(the reference's own C++/OpenMP engine cannot be built here: its nanobind
submodule is empty and the container has no egress).
"""
import json
import time
from math import ceil

import numpy as np


def _matvec_rate(device, n_rows=262144, d=256, num_rffs=8192, chunk=8192,
                 n_rhs=8, repeats=5):
    import jax
    import jax.numpy as jnp
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS

    # The production feature path (auto-selects the dense MXU projection
    # and the cos/sin-parts contraction, exactly as the fused CG does).
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n_rows, d), num_rffs, 123)
    kernel.set_hyperparams(np.log(np.array([0.1, 1.0])))
    feature_fn = kernel.pure_feature_fn()
    parts_fn = kernel.pure_feature_parts_fn()
    # Fused Pallas matvec only on the accelerator target; the CPU baseline
    # run keeps the XLA path (Pallas has no compiled CPU backend).
    ztzv_fn = kernel.pure_ztzv_parts_fn() \
        if device.platform != "cpu" else None
    positions = kernel.feature_positions() if parts_fn else None
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), device)
    num_freqs = num_rffs // 2

    rng = np.random.default_rng(0)
    n_chunks = n_rows // chunk
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n_chunks, chunk, d)).astype(np.float32)),
        device)
    # A distinct RHS per repeat defeats any result caching in the runtime.
    vs = jax.device_put(jnp.asarray(rng.standard_normal(
        (repeats + 1, num_rffs, n_rhs)).astype(np.float32)), device)

    from xgpr_tpu import config as _cfg
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_cfg.feature_precision()]

    if positions is not None:
        cos_pos = jax.device_put(jnp.asarray(positions[0]), device)
        sin_pos = jax.device_put(jnp.asarray(positions[1]), device)

    def matvec(x, v, params):
        if positions is not None:
            v_c = jnp.take(v, cos_pos, axis=0)
            v_s = jnp.take(v, sin_pos, axis=0)

            ones = jnp.ones((chunk,), jnp.float32)

            def body(acc, xb):
                fused = None
                if ztzv_fn is not None:
                    fused = ztzv_fn(params, xb, None, ones, v_c, v_s)
                if fused is not None:
                    oc, os = fused
                else:
                    c, s = parts_fn(params, xb, None)
                    zv = jnp.matmul(c, v_c, precision=prec) + \
                        jnp.matmul(s, v_s, precision=prec)
                    oc = jnp.matmul(c.T, zv, precision=prec)
                    os = jnp.matmul(s.T, zv, precision=prec)
                return (acc[0] + oc, acc[1] + os), None
            init = (jnp.zeros((num_freqs, n_rhs), jnp.float32),
                    jnp.zeros((num_freqs, n_rhs), jnp.float32))
            (oc, os), _ = jax.lax.scan(body, init, x)
            out = jnp.zeros((num_rffs, n_rhs), jnp.float32)
            return out.at[cos_pos].set(oc).at[sin_pos].set(os)

        def body(acc, xb):
            z = feature_fn(params, xb, None)
            zv = jnp.matmul(z, v, precision=prec)
            return acc + jnp.matmul(z.T, zv, precision=prec), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((num_rffs, n_rhs), jnp.float32), x)
        return acc

    fn = jax.jit(matvec, device=device)
    np.asarray(fn(x, vs[0], params))  # compile + warmup

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        # Host-read of the small (M, K) output: the only completion signal
        # this environment's TPU tunnel reports faithfully.
        np.asarray(fn(x, vs[i + 1], params))
        times.append(time.perf_counter() - t0)
    return n_rows * num_rffs / float(np.median(times))


def main():
    import jax
    # Persistent compilation cache: remote compiles in this environment
    # can take many minutes; caching executables on disk makes repeat
    # bench runs (and the driver's end-of-round run) fast.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    accel = [dv for dv in jax.devices() if dv.platform != "cpu"]
    target = accel[0] if accel else jax.devices()[0]
    value = _matvec_rate(target)

    vs_baseline = 1.0
    if accel:
        cpu = jax.devices("cpu")[0]
        cpu_rate = _matvec_rate(cpu, n_rows=8192, chunk=2048, repeats=2)
        vs_baseline = value / cpu_rate

    print(json.dumps({
        "metric": "cg_matvec_rff_features_per_sec_per_chip",
        "value": float(value),
        "unit": "features/s",
        "vs_baseline": float(vs_baseline),
    }))


if __name__ == "__main__":
    main()
