"""On-chip out-of-core streaming fit: >= 1M points through the
StreamingShardedEngine (data never device-resident; every reduction and
every CG iteration re-streams prefetched superbatches host->device).

    python scripts/streaming_fit_bench.py --rows 1000000

Through this environment's relay (~16 MB/s host->device) each full
dataset pass is transfer-bound; on real TPU hosts (PCIe) the same path
runs at memory speed.  The point of the measurement is that the fit
COMPLETES correctly with the dataset outside device memory and to record
pass/iteration wall times.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--num-rffs", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--rank", type=int, default=512)
    ap.add_argument("--batches-per-step", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu.parallel import StreamingShardedEngine, data_mesh
    from xgpr_tpu.preconditioners.nystrom import NystromPreconditioner
    from xgpr_tpu.fitting.cg import cg_fit

    rng = np.random.default_rng(0)
    w = rng.standard_normal(args.dim) / np.sqrt(args.dim)
    x = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    y = (np.sin(2 * x @ w) + 0.1 * rng.standard_normal(args.rows)) \
        .astype(np.float32)
    dset = build_regression_dataset(x, y, chunk_size=args.chunk)

    model = GPRegression(num_rffs=args.num_rffs, kernel_choice="RBF",
                         verbose=False)
    model.set_hyperparams(np.log(np.array([0.1, 0.25])), dset)
    mesh = data_mesh()  # all visible accelerator devices (1 here)
    engine = StreamingShardedEngine(model.kernel, dset, mesh,
                                    batches_per_step=args.batches_per_step)
    assert engine._x is None  # never device-resident

    t0 = time.time()
    precond = NystromPreconditioner(engine, args.rank, verbose=False,
                                    random_state=123, method="srht_2")
    t_precond = time.time() - t0
    print(f"preconditioner (srht_2, rank {args.rank}): {t_precond:.1f}s "
          f"ratio={precond.achieved_ratio:.3f}", flush=True)

    t0 = time.time()
    weights, n_iter, _ = cg_fit(engine, precond, tol=1e-6, max_iter=100,
                                verbose=False)
    t_cg = time.time() - t0
    weights = np.asarray(weights)
    assert np.all(np.isfinite(weights))
    print(json.dumps({
        "rows": args.rows, "num_rffs": args.num_rffs,
        "streaming": True, "precond_sec": t_precond,
        "cg_sec": t_cg, "cg_iters": n_iter,
        "row_iterations_per_sec": args.rows * n_iter / t_cg,
        "sec_per_dataset_pass": t_cg / max(n_iter, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
