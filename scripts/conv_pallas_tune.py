"""Tile/precision experiments for the fused conv kernel on the real chip.

Usage: python scripts/conv_pallas_tune.py VARIANT
  base        -- shipped tiles (RD16/BW16/FT2048), feature precision high
  prec_def    -- same tiles, 1-pass bf16 projection (isolates MXU share)
  rd32        -- RD32/BW16/FT1024
  bw32        -- RD16/BW32/FT1024
  rd8bw8      -- RD8/BW8/FT2048
  exact_sc    -- builtin sin/cos instead of the polynomial (isolates VPU)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np



def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    from xgpr_tpu import config
    from xgpr_tpu.ops.pallas import conv_pallas

    if variant == "prec_def":
        config.set_feature_precision("default")
    elif variant == "rd32":
        conv_pallas._RD, conv_pallas._BW, conv_pallas._FT = 32, 16, 1024
    elif variant == "bw32":
        conv_pallas._RD, conv_pallas._BW, conv_pallas._FT = 16, 32, 1024
    elif variant == "rd8bw8":
        conv_pallas._RD, conv_pallas._BW, conv_pallas._FT = 8, 8, 2048
    elif variant == "exact_sc":
        config.set_sincos_mode("exact")
    elif variant == "split":
        conv_pallas._SPLIT = True
    elif variant == "split_bw32":
        conv_pallas._SPLIT = True
        conv_pallas._RD, conv_pallas._BW = 16, 32
    elif variant.startswith("rd") and "bw" in variant and "ft" in variant:
        import re
        m = re.fullmatch(r"rd(\d+)bw(\d+)ft(\d+)", variant)
        conv_pallas._RD = int(m.group(1))
        conv_pallas._BW = int(m.group(2))
        conv_pallas._FT = int(m.group(3))

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]

    n_rows, seq, d, width = 32768, 128, 21, 9
    num_rffs, chunk, n_rhs, reps = 8192, 2048, 8, 5
    f = num_rffs // 2
    kernel = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n_rows, seq, d), num_rffs, 123,
        kernel_spec_parms={"conv_width": width, "averaging": "sqrt"})
    kernel.set_hyperparams(np.log(np.array([0.1, 1.0])))
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), dev)
    parts_fn = kernel.pure_feature_parts_fn()

    rng = np.random.default_rng(0)
    nch = n_rows // chunk
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (nch, chunk, seq, d)).astype(np.float32)), dev)
    sl = jax.device_put(jnp.full((nch, chunk), seq, jnp.int32), dev)
    seeds = jax.device_put(jnp.asarray(
        rng.standard_normal((reps + 1,)).astype(np.float32)), dev)
    vs = jax.device_put(jnp.asarray(rng.standard_normal(
        (reps + 1, f, n_rhs)).astype(np.float32)), dev)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[config.feature_precision()]

    def matvec(x, sl, seed, v, params):
        def body(acc, batch):
            xb, lb = batch
            c, s = parts_fn(params, xb + seed, lb)
            zv = jnp.matmul(c, v, precision=prec) + \
                jnp.matmul(s, v, precision=prec)
            return (acc[0] + jnp.matmul(c.T, zv, precision=prec),
                    acc[1] + jnp.matmul(s.T, zv, precision=prec)), None
        init = (jnp.zeros((f, n_rhs), jnp.float32),) * 2
        (a, b), _ = jax.lax.scan(body, init, (x, sl))
        return a + b

    jf = jax.jit(matvec, device=dev)
    np.asarray(jf(x, sl, seeds[0], vs[0], params))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(jf(x, sl, seeds[i + 1], vs[i + 1], params))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(json.dumps({"variant": variant, "sec": t,
                      "ms_per_chunk": t / nch * 1e3,
                      "rows_per_sec": n_rows / t}))


if __name__ == "__main__":
    main()
