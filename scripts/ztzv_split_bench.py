"""On-chip A/B for the fused ztzv matvec schedule and sincos mode.

Measures the headline CG-matvec rate (bench._matvec_rate, 262144 rows,
8192 x 256 chunks -> 4096 freqs, K=8) in four configurations:

  1. balanced preset, contiguous chain         (shipping default)
  2. balanced preset, split frequency halves   (_SPLIT="freqs")
  3. fast sincos,     contiguous chain
  4. fast sincos,     split frequency halves

Split variants give the Mosaic VLIW scheduler two independent MXU/VPU
chains per grid step; the roofline says ~0.45x of the sincos time is
un-hidden, which is exactly what interleaving can recover.  The "rows"
variant (half-row chains) was measured 19% WORSE (2026-08-20: halving
the matmul M dim costs more MXU efficiency than the overlap recovers);
"freqs" keeps M at the full tile.
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
    from xgpr_tpu.ops.pallas import ztzv_pallas as zp

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    if not accel:
        raise SystemExit("no accelerator visible")
    dev = accel[0]

    out = {}
    for sincos_mode in ("auto", "fast"):
        cfg.set_sincos_mode(sincos_mode)
        for split in ("none", "freqs"):
            zp._SPLIT = split
            rate = bench._matvec_rate(dev, repeats=7)
            key = f"sincos={sincos_mode} split={split}"
            ms = 8192 * 8192 / rate * 1e3  # per 8192-row chunk, 8192 RFFs
            out[key] = {"features_per_sec": rate, "chunk_ms": ms}
            print(f"{key}: {rate:.3e} f/s  ({ms:.3f} ms/chunk)",
                  flush=True)
    cfg.set_sincos_mode("auto")
    zp._SPLIT = "none"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
