"""Scaling harness: features/sec and CG iterations/sec at 1..N devices.

Reports the scaling efficiency numbers BASELINE.json asks for.  On this
environment's single-TPU-chip + virtual-CPU setup, run it with:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scale_bench.py --backend cpu --devices 1 2 4 8

On a real pod slice, run it unmodified (defaults to all local devices).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="cpu to force the host platform")
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--rows-per-device", type=int, default=32768)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--num-rffs", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import numpy as np
    import jax.numpy as jnp
    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu.parallel import ShardedEngine, data_mesh
    from xgpr_tpu.fitting.cg import ConjugateGrad
    from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner

    n_avail = len(jax.devices())
    counts = args.devices or sorted({1, min(2, n_avail), min(4, n_avail),
                                     n_avail})
    results = []
    base_rate = None
    for ndev in counts:
        if ndev > n_avail:
            continue
        n_rows = args.rows_per_device * ndev
        rng = np.random.default_rng(0)
        x = rng.standard_normal((n_rows, args.dim)).astype(np.float32)
        y = np.sin(x[:, 0]) + 0.1 * rng.standard_normal(n_rows)
        y = y.astype(np.float64)
        dataset = build_regression_dataset(x, y, chunk_size=args.chunk)
        model = GPRegression(num_rffs=args.num_rffs, kernel_choice="RBF",
                             verbose=False)
        model.set_hyperparams(np.log(np.array([0.2, 0.3])), dataset)
        mesh = data_mesh(ndev)
        engine = ShardedEngine(model.kernel, dataset, mesh)

        v = jnp.asarray(rng.standard_normal(
            (args.num_rffs, 8)).astype(np.float32))
        np.asarray(engine.ztzv(v))  # compile + warmup
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(engine.ztzv(v))
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        feats_per_sec = n_rows * args.num_rffs / t
        iters_per_sec = 1.0 / t

        eff = 1.0
        if base_rate is None:
            base_rate = feats_per_sec
        else:
            eff = feats_per_sec / (base_rate * ndev)
        results.append({
            "n_devices": ndev,
            "rows": n_rows,
            "matvec_sec": t,
            "features_per_sec": feats_per_sec,
            "cg_iters_per_sec": iters_per_sec,
            "scaling_efficiency": eff,
        })
        print(json.dumps(results[-1]))

    return results


if __name__ == "__main__":
    main()
