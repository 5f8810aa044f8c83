"""End-to-end SLQ NMLL wall-clock vs probe count (VERDICT r4 item 3).

The recorded K-sweep (BENCH_r04 matvec_k_sweep) shows the fused matvec's
effective TFLOP/s RISING with RHS count -- K=64 harvested ~+40% over
K=8 even in a degraded window, because more simultaneous RHS deepens
the two K-contractions the shallow-k roofline analysis identified as
the efficiency cap.  The approximate-NMLL workload dispatches K =
nsamples + 1 RHS through exactly that matvec (reference runs 25 probes,
xgp_regression.py:342-362), so if the sweep holds, raising the probe
count toward the K that saturates the MXU buys lower SLQ variance at
near-zero marginal wall-clock.

This script measures the real tuning path: model.approximate_nmll at
nsamples = 25 vs 63 on a chip-sized stacked RBF problem, fixed
preconditioner rank so both evaluations run the same passes.  Distinct
hyperparameters per call defeat the NMLL cache; the second repeat of
each count is the warm number.

    python scripts/nmll_probe_sweep.py          # writes one JSON line
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from xgpr_tpu import GPRegression, build_regression_dataset
    from xgpr_tpu import config as xcfg
    xcfg.set_stacked_limit(4 * 10 ** 9)
    # The relay worker dies on fresh fused-while_loop compiles (see
    # ROUND_NOTES round 5); the looped lowering measures the same
    # per-probe marginal cost through scan-sized programs.
    xcfg.set_cg_mode("looped")

    n, d, num_rffs, rank = 262144, 256, 8192, 512
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, d)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.25 * x[:, 1] * x[:, 2]
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    data = build_regression_dataset(x, y, chunk_size=8192)
    model = GPRegression(num_rffs=num_rffs, kernel_choice="RBF",
                         verbose=False)
    base = np.log(np.array([0.1, 1.0]))
    model.set_hyperparams(base, data)

    out = {"rows": n, "dim": d, "num_rffs": num_rffs, "max_rank": rank,
           "sweep": {}}
    for nsamples in (25, 63):
        times, vals = [], []
        for rep in range(3):
            hp = base + 1e-4 * (rep + 1)  # distinct point per call
            t0 = time.time()
            val = model.approximate_nmll(
                hp, data, manual_settings={
                    "max_rank": rank, "preconditioner_mode": "srht_2",
                    "nsamples": nsamples})
            times.append(time.time() - t0)
            vals.append(float(val))
        out["sweep"][f"probes{nsamples}"] = {
            "nmll_values": vals,
            "first_call_sec": times[0],
            "warm_sec": float(np.median(times[1:]))}
        print(f"nsamples={nsamples}: warm "
              f"{out['sweep'][f'probes{nsamples}']['warm_sec']:.1f}s "
              f"(first {times[0]:.1f}s)", flush=True)
    w25 = out["sweep"]["probes25"]["warm_sec"]
    w63 = out["sweep"]["probes63"]["warm_sec"]
    out["warm_ratio_63_over_25"] = w63 / w25
    print(json.dumps(out))
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "PROBESWEEP_r05.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
