"""1M+ datapoint streaming fit (the BASELINE north-star workload shape).

Generates a synthetic 1M x 64 regression problem, fits a Conv-free RBF
model (or Conv1dRBF with --conv) end to end with the Nystrom-
preconditioned CG path, and reports wall-clock per phase and final NMLL /
train RMSE.  On a single chip this exercises the streaming engine; on a
pod slice the sharded engine picks up automatically.

    python scripts/million_point_fit.py --rows 1000000 --num-rffs 8192
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--num-rffs", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--max-rank", type=int, default=512)
    ap.add_argument("--conv", action="store_true",
                    help="use Conv1dRBF on synthetic sequences")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--stacked", action="store_true",
                    help="raise the stacked limit so the dataset is "
                         "held device-resident (needs the HBM headroom)")
    args = ap.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import numpy as np
    from xgpr_tpu import GPRegression, build_regression_dataset
    if args.stacked:
        from xgpr_tpu import config as xcfg
        xcfg.set_stacked_limit(4 * 10 ** 9)

    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.conv:
        L, D = 16, args.dim
        x = rng.standard_normal((args.rows, L, D)).astype(np.float32)
        lengths = rng.integers(9, L + 1,
                               size=(args.rows,)).astype(np.int32)
        w = rng.standard_normal(D) / np.sqrt(D)
        y = np.tanh((x @ w)).mean(axis=1) + \
            0.1 * rng.standard_normal(args.rows)
        data = build_regression_dataset(x, y, sequence_lengths=lengths,
                                        chunk_size=args.chunk)
        kernel, settings = "Conv1dRBF", {"conv_width": 9}
    else:
        x = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
        w1 = rng.standard_normal(args.dim) / np.sqrt(args.dim)
        w2 = rng.standard_normal(args.dim) / np.sqrt(args.dim)
        y = np.sin(2 * x @ w1) + (x @ w2) + \
            0.1 * rng.standard_normal(args.rows)
        data = build_regression_dataset(x, y, chunk_size=args.chunk)
        kernel, settings = "RBF", {}
    print(f"data generated in {time.time()-t0:.1f}s "
          f"({x.nbytes/1e9:.2f} GB)")

    model = GPRegression(num_rffs=args.num_rffs, variance_rffs=512,
                         kernel_choice=kernel, kernel_settings=settings,
                         verbose=True)
    sigma0 = 1.0 / np.sqrt(args.dim)
    model.set_hyperparams(np.log(np.array([0.15, sigma0])), data)

    t0 = time.time()
    precond, ratio = model.build_preconditioner(
        data, max_rank=args.max_rank, method="srht_2")
    t_pre = time.time() - t0
    print(f"preconditioner rank {args.max_rank}: ratio={ratio:.3f} "
          f"({t_pre:.1f}s)")

    t0 = time.time()
    n_iter, losses = model.fit(data, preconditioner=precond, tol=1e-6,
                               mode="cg", suppress_var=True,
                               run_diagnostics=True)
    t_fit = time.time() - t0
    print(f"CG fit: {n_iter} iterations in {t_fit:.1f}s "
          f"({args.rows * n_iter / t_fit:.3g} row-iters/s)")

    idx = rng.choice(args.rows, 20000, replace=False)
    if args.conv:
        preds = model.predict(x[idx], sequence_lengths=lengths[idx])
    else:
        preds = model.predict(x[idx])
    rmse = float(np.sqrt(np.mean((preds - y[idx]) ** 2)))
    print(f"train-sample RMSE: {rmse:.4f} (noise floor 0.1)")


if __name__ == "__main__":
    main()
