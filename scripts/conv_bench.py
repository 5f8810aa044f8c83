"""Conv1dRBF feature throughput on the real chip.

Measures the k-mer conv-SORF feature map (dense path: the projection is
one lax.conv_general_dilated on the MXU, ops/conv.py) inside the same
streamed design-matrix reduction shape a fit uses.  Reports window-features
per second (rows x kmers x num_freqs / sec).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np



def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]

    n_rows, seq, d, width = 16384, 128, 21, 9
    num_rffs, chunk, reps = 4096, 2048, 5
    kernel = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n_rows, seq, d), num_rffs, 123,
        kernel_spec_parms={"conv_width": width, "averaging": "none"})
    kernel.set_hyperparams(np.log(np.array([0.1, 1.0])))
    fn = kernel.pure_feature_fn()
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), dev)

    rng = np.random.default_rng(0)
    nch = n_rows // chunk
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (nch, chunk, seq, d)).astype(np.float32)), dev)
    sl = jax.device_put(jnp.full((nch, chunk), seq, jnp.int32), dev)
    seeds = jax.device_put(jnp.asarray(rng.standard_normal(
        (reps + 1,)).astype(np.float32)), dev)

    def sweep(x, sl, seed, params):
        def body(acc, batch):
            xb, lb = batch
            z = fn(params, xb + seed, lb)
            return acc + jnp.sum(z, axis=0), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((num_rffs,), jnp.float32), (x, sl))
        return acc

    jf = jax.jit(sweep, device=dev)
    np.asarray(jf(x, sl, seeds[0], params))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(jf(x, sl, seeds[i + 1], params))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    kmers = seq - width + 1
    rate = n_rows * kmers * (num_rffs // 2) / t
    print(json.dumps({
        "metric": "conv1drbf_window_features_per_sec",
        "value": rate,
        "unit": "window-features/s",
        "sec_per_pass": t,
        "rows_per_sec": n_rows / t,
    }))


if __name__ == "__main__":
    main()
