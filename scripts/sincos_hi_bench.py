"""On-chip A/B for the "hi" full-period sincos (deg 13/14, ~6e-7 err).

The quadrant-folded cephes default costs ~33 VPU ops per (cos, sin)
pair (int casts, bitmasks, 4 selects); the hi evaluator keeps
near-builtin accuracy at ~21 ops by fitting the whole period.  Candidate
to replace the default fp32 path -- this measures what that buys on:

  - the headline CG matvec (bench._matvec_rate; MXU-leaning)
  - the conv design-matrix pass (bench._conv_design_rate; VPU-bound)

for sincos modes auto (cephes), hi, fast.
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import bench
    from xgpr_tpu import config as cfg

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        raise SystemExit("no accelerator visible")
    dev = accel[0]

    out = {}
    for mode in ("auto", "hi", "fast"):
        cfg.set_sincos_mode(mode)
        rate = bench._matvec_rate(dev, repeats=7)
        ms = 8192 * 8192 / rate * 1e3  # per 8192-row chunk, 8192 RFFs
        out[f"matvec sincos={mode}"] = {"features_per_sec": rate,
                                        "chunk_ms": ms}
        print(f"matvec sincos={mode}: {rate:.3e} f/s ({ms:.3f} ms/chunk)",
              flush=True)
        conv = bench._conv_design_rate(dev)
        out[f"conv sincos={mode}"] = conv
        print(f"conv sincos={mode}: {conv}", flush=True)
    cfg.set_sincos_mode("auto")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
