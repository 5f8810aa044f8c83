"""Conv1dRBF CG-matvec component profiling on the real chip.

Times (median over repeats, distinct inputs per repeat, host-read
completion) for a 1M-point-fit-like chunk shape:
  proj     -- conv projection only (lax.conv_general_dilated, sum output)
  proj_sc  -- projection + poly sincos + masked window reduce
  parts    -- full Z^T(Zv) matvec via the layout-free parts path
  feats    -- full Z^T(Zv) via canonical features (assembled layout)
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
    from xgpr_tpu import config

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
    config.set_conv_mode("xla")
    feature_fn = kernel.pure_feature_fn()
    parts_fn = kernel.pure_feature_parts_fn()
    config.set_conv_mode("auto")
    parts_fn_fused = kernel.pure_feature_parts_fn() \
        if dev.platform != "cpu" else None

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

    from xgpr_tpu.ops.conv import _conv_project

    def proj_only(x, seed, params):
        def body(acc, xb):
            xf = (xb + seed).reshape(chunk, seq * d)
            g = _conv_project(xf, jnp.int32(0), seq - width + 1, width, d,
                              params["proj"])
            return acc + jnp.sum(g, axis=(0, 1)), None
        acc, _ = jax.lax.scan(body, jnp.zeros((f,), jnp.float32), x)
        return acc

    def proj_sc(x, seed, params):
        from xgpr_tpu.ops.sincos import sincos
        def body(acc, xb):
            xf = (xb + seed).reshape(chunk, seq * d)
            g = _conv_project(xf, jnp.int32(0), seq - width + 1, width, d,
                              params["proj"])
            c, s = sincos(g * params["sigma"])
            return acc + jnp.sum(c, axis=(0, 1)) + jnp.sum(s, axis=(0, 1)), \
                None
        acc, _ = jax.lax.scan(body, jnp.zeros((f,), jnp.float32), x)
        return acc

    def _make_matvec(pfn):
        def matvec_parts(x, sl, seed, v, params):
            def body(acc, batch):
                xb, lb = batch
                c, s = pfn(params, xb + seed, lb)
                zv = jnp.matmul(c, v, precision=prec) + \
                    jnp.matmul(s, v, precision=prec)
                return (acc[0] + jnp.matmul(c.T, zv, precision=prec),
                        acc[1] + jnp.matmul(s.T, zv, precision=prec)), None
            init = (jnp.zeros((f, n_rhs), jnp.float32),) * 2
            (a, b), _ = jax.lax.scan(body, init, (x, sl))
            return a + b
        return matvec_parts

    matvec_parts = _make_matvec(parts_fn)

    def matvec_feats(x, sl, seed, v, params):
        def body(acc, batch):
            xb, lb = batch
            z = feature_fn(params, xb + seed, lb)
            zv = jnp.matmul(z, jnp.concatenate([v, v]), precision=prec)
            return acc + jnp.matmul(z.T, zv, precision=prec), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((num_rffs, n_rhs), jnp.float32), (x, sl))
        return acc

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
    if parts_fn_fused is not None:
        out["parts_pallas"] = timeit(
            _make_matvec(parts_fn_fused),
            lambda i: (x, sl, seeds[i], vs[i], params))
    out["proj"] = timeit(proj_only, lambda i: (x, seeds[i], params))
    out["proj_sc"] = timeit(proj_sc, lambda i: (x, seeds[i], params))
    out["parts"] = timeit(matvec_parts,
                          lambda i: (x, sl, seeds[i], vs[i], params))
    out["feats"] = timeit(matvec_feats,
                          lambda i: (x, sl, seeds[i], vs[i], params))
    kmers = seq - width + 1
    out = {k: {"sec": v, "ms_per_chunk": v / nch * 1e3,
               "rows_per_sec": n_rows / v}
           for k, v in out.items()}
    out["_shape"] = {"rows": n_rows, "seq": seq, "d": d, "width": width,
                     "num_rffs": num_rffs, "chunk": chunk,
                     "kmers": kmers, "n_rhs": n_rhs}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
