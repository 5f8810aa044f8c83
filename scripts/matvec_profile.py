"""Component-level matvec profiling on the real chip.

Times (median over repeats, distinct inputs per repeat, host-read
completion) for the bench shapes:
  proj     -- projection matmul only (sum output)
  proj+sc  -- projection + poly sincos (sum output)
  xla      -- full Z^T(Zv) matvec, XLA parts path
  pallas   -- full Z^T(Zv) matvec, fused Pallas kernel
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
    from xgpr_tpu.ops.sincos import sincos
    from xgpr_tpu import config

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0] if accel else jax.devices()[0]

    n_rows, d, num_rffs, chunk, n_rhs, reps = 262144, 256, 8192, 8192, 8, 7
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n_rows, d), num_rffs, 123)
    kernel.set_hyperparams(np.log(np.array([0.1, 1.0])))
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), dev)
    f = num_rffs // 2
    rng = np.random.default_rng(0)
    nch = n_rows // chunk
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (nch, chunk, d)).astype(np.float32)), dev)
    seeds = jax.device_put(jnp.asarray(
        rng.standard_normal((reps + 1, d)).astype(np.float32)), dev)
    vs = jax.device_put(jnp.asarray(rng.standard_normal(
        (reps + 1, f, n_rhs)).astype(np.float32)), dev)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[config.feature_precision()]

    def proj_only(x, seed, params):
        def body(acc, xb):
            g = jnp.matmul(xb + seed[None, :], params["proj"],
                           precision=prec)
            return acc + jnp.sum(g, axis=0), None
        acc, _ = jax.lax.scan(body, jnp.zeros((f,), jnp.float32), x)
        return acc

    def proj_sincos(x, seed, params):
        def body(acc, xb):
            g = jnp.matmul(xb + seed[None, :], params["proj"],
                           precision=prec)
            c, s = sincos(g * params["sigma"])
            return acc + jnp.sum(c, axis=0) + jnp.sum(s, axis=0), None
        acc, _ = jax.lax.scan(body, jnp.zeros((f,), jnp.float32), x)
        return acc

    parts_fn = kernel.pure_feature_parts_fn()
    ztzv_fn = kernel.pure_ztzv_parts_fn()
    ones = jnp.ones((chunk,), jnp.float32)

    def matvec_xla(x, v, params):
        def body(acc, xb):
            c, s = parts_fn(params, xb, None)
            zv = jnp.matmul(c, v, precision=prec) + \
                jnp.matmul(s, v, precision=prec)
            return (acc[0] + jnp.matmul(c.T, zv, precision=prec),
                    acc[1] + jnp.matmul(s.T, zv, precision=prec)), None
        init = (jnp.zeros((f, n_rhs), jnp.float32),) * 2
        (a, b), _ = jax.lax.scan(body, init, x)
        return a + b

    def matvec_pallas(x, v, params):
        def body(acc, xb):
            oc, os = ztzv_fn(params, xb, None, ones, v, v)
            return (acc[0] + oc, acc[1] + os), None
        init = (jnp.zeros((f, n_rhs), jnp.float32),) * 2
        (a, b), _ = jax.lax.scan(body, init, x)
        return a + b

    def timeit(fn, args_fn):
        jf = jax.jit(fn, device=dev)
        np.asarray(jf(*args_fn(0)))
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            np.asarray(jf(*args_fn(i + 1)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    out = {}
    out["proj"] = timeit(proj_only, lambda i: (x, seeds[i], params))
    out["proj_sincos"] = timeit(proj_sincos, lambda i: (x, seeds[i],
                                                        params))
    out["xla"] = timeit(matvec_xla, lambda i: (x, vs[i], params))
    if ztzv_fn is not None:
        out["pallas"] = timeit(matvec_pallas, lambda i: (x, vs[i],
                                                         params))
    out = {k: {"sec": v, "ms_per_chunk": v / nch * 1e3}
           for k, v in out.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
