"""One-off: matvec throughput vs feature-projection precision on the TPU.

Sweeps the validated precision knobs (config.set_matmul_precision /
set_fast_features) over the headline bench's matvec program to pick
defaults.  Each variant is a new HLO (slow remote compile on first run;
cached afterwards).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from xgpr_tpu import config
    import bench

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    target = accel[0] if accel else jax.devices()[0]

    results = {}
    for name, setup in [
        ("highest", lambda: config.set_matmul_precision("highest")),
        ("high", lambda: config.set_matmul_precision("high")),
        ("fast_bf16", lambda: config.set_fast_features(True)),
    ]:
        config.set_fast_features(False)
        config.set_feature_dtype("float32")
        config.set_matmul_precision("highest")
        setup()
        rate = bench._matvec_rate(target)
        results[name] = rate
        print(json.dumps({"variant": name, "features_per_sec": rate}),
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
