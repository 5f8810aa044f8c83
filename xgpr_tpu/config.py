"""Global numerical configuration for xgpr_tpu.

The reference library (xGPR) computes features in fp32 or fp64 and always
accumulates linear algebra in fp64 (see /root/reference
src/xGPR/random_feature_generation/cpu_rf_gen/rbf_ops/rbf_ops.cpp:28 -- the
output array is always float64). TPUs have no fast fp64, so this build uses a
configurable precision policy instead:

- On CPU test/debug runs (``JAX_ENABLE_X64=true``) everything runs in float64,
  which reproduces the reference's numerical contract and lets the test-suite
  thresholds (ported from the reference's own suite) be applied directly.
- On TPU, features are generated in float32 and reductions accumulate in
  float32 with ``preferred_element_type`` pinned, validated against the
  reference's own fp32 tolerances (rtol=atol=1e-3,
  tests/fht_operations_tests/test_rbf_rfgen.py:104).
"""
import jax
import jax.numpy as jnp



# ----------------------------------------------------------------------
# Config epoch: bumped by every mode/precision setter.  Pure-fn caches on
# kernel objects include the epoch in their keys, so ANY config switch
# rebuilds traced programs instead of silently reusing ones compiled
# under the old settings.  (Engines snapshot their feature fn at
# construction; set modes before building models/engines.)
_CONFIG_EPOCH = 0


def _bump_epoch():
    global _CONFIG_EPOCH
    _CONFIG_EPOCH += 1


def config_epoch() -> int:
    return _CONFIG_EPOCH


def x64_enabled() -> bool:
    """True when JAX is running with 64-bit types enabled."""
    return bool(jax.config.jax_enable_x64)


def fp_dtype():
    """The working floating-point dtype for feature generation and solves."""
    return jnp.float64 if x64_enabled() else jnp.float32


def acc_dtype():
    """Accumulator dtype for Z^T Z / Z^T y style reductions."""
    return jnp.float64 if x64_enabled() else jnp.float32


def default_backend() -> str:
    return jax.default_backend()


# ----------------------------------------------------------------------
# Matmul precision for the compute path.  TPU's DEFAULT silently rounds
# operands to bfloat16 (breaking the 1e-3 feature contract); "highest" is
# full fp32 via 6 bf16 passes; "high" is the 3-pass bf16 scheme (~1e-6
# relative error -- still far inside the contract, ~2x faster).
# NOTE: read at trace time -- set it before building engines/models.
_MATMUL_PRECISION = "highest"


def set_matmul_precision(p: str):
    _bump_epoch()
    global _MATMUL_PRECISION
    if p not in ("highest", "high", "default"):
        raise ValueError("matmul precision must be highest/high/default")
    _MATMUL_PRECISION = p


def matmul_precision() -> str:
    return _MATMUL_PRECISION


# ----------------------------------------------------------------------
# Precision for the FEATURE-PATH matmuls only: the SORF projection and
# the CG-matvec contractions (Zv, Z^T(Zv)).  Measured on-chip these are
# the whole hot loop, and "high" (3-pass bf16, ~5e-7 relative error --
# three orders inside the 1e-3 fp32 feature contract) halves their MXU
# cost vs "highest" (6-pass).  Solve-path reductions (design matrix,
# Cholesky/eig inputs) stay on set_matmul_precision ("highest") where
# conditioning actually matters.  Read at trace time.
_FEATURE_PRECISION = "high"


def set_feature_precision(p: str):
    _bump_epoch()
    global _FEATURE_PRECISION
    if p not in ("highest", "high", "default"):
        raise ValueError("feature precision must be highest/high/default")
    _FEATURE_PRECISION = p


def feature_precision() -> str:
    if x64_enabled():
        return "highest"  # fp64 runs reproduce the reference contract
    return _FEATURE_PRECISION


# ----------------------------------------------------------------------
# Feature materialisation dtype for the CG matvec.  The (chunk, num_rffs)
# feature matrix Z is the dominant HBM traffic of a fit; storing it as
# bfloat16 halves that traffic.  Rounding is deterministic, so bf16 mode
# solves a fixed, slightly-perturbed random-feature model -- statistically
# indistinguishable from a different random seed.  Off by default.
_FEATURE_DTYPE = "float32"


def set_feature_dtype(d: str):
    _bump_epoch()
    global _FEATURE_DTYPE
    if d not in ("float32", "bfloat16"):
        raise ValueError("feature dtype must be float32 or bfloat16")
    _FEATURE_DTYPE = d


def feature_dtype():
    import jax.numpy as _jnp
    if _FEATURE_DTYPE == "bfloat16" and not x64_enabled():
        return _jnp.bfloat16
    return None  # keep the working dtype


# ----------------------------------------------------------------------
# Fast feature mode: run the SORF projection matmuls at the TPU's native
# bf16 precision.  The resulting phase error (~1e-2 relative) is of the
# same order as the intrinsic O(1/sqrt(F)) random-feature approximation
# error, and the rounding is deterministic, so this is equivalent to a
# slightly different -- but fixed -- random feature draw.  Off by
# default; enable for throughput-critical fits.
_FAST_FEATURES = False


def set_fast_features(enabled: bool):
    _bump_epoch()
    global _FAST_FEATURES
    _FAST_FEATURES = bool(enabled)
    if enabled:
        set_feature_dtype("bfloat16")


def feature_matmul_precision() -> str:
    if _FAST_FEATURES and not x64_enabled():
        return "default"
    return feature_precision()


# ----------------------------------------------------------------------
# Speed presets: one call that sets the (orthogonal) throughput knobs to
# a documented operating point.  See docs/speed_modes.md for measured
# accuracy/throughput tradeoffs of each preset on TPU.
_SPEED_PRESETS = {
    # The reference's numerical contract: fp32-exact matmuls everywhere
    # and builtin sin/cos.
    "reference": dict(feature_precision="highest", sincos="exact",
                      fast_features=False),
    # Default: 3-pass bf16 feature matmuls (~5e-7 relative) + the
    # full-period deg-13/14 polynomial sincos ("hi", ~6e-7 end-to-end).
    "balanced": dict(feature_precision="high", sincos="auto",
                     fast_features=False),
    # Maximum throughput: 1-pass bf16 projection + bf16 feature
    # materialisation (a fixed, slightly-perturbed random-feature draw)
    # + the half-cost full-period polynomial sincos (~4.1e-5).
    "max": dict(feature_precision="high", sincos="fast",
                fast_features=True),
}


def set_speed_preset(name: str):
    """Set all throughput knobs to a named operating point
    ("reference" / "balanced" / "max"); see _SPEED_PRESETS."""
    preset = _SPEED_PRESETS.get(name)
    if preset is None:
        raise ValueError(
            f"speed preset must be one of {sorted(_SPEED_PRESETS)}")
    set_feature_precision(preset["feature_precision"])
    set_sincos_mode(preset["sincos"])
    set_fast_features(preset["fast_features"])
    if not preset["fast_features"]:
        set_feature_dtype("float32")


# ----------------------------------------------------------------------
# CG matvec implementation (see ops/pallas/ztzv_pallas.py).  "auto"
# (default) uses the fused Pallas chunk kernel on TPU for supported
# dense-projection kernels and the XLA parts path elsewhere; "xla"
# forces the XLA path; "pallas" forces the kernel (interpret-mode on
# CPU -- slow, for testing).  Read at trace time.
_MATVEC_MODE = "auto"


def set_matvec_mode(mode: str):
    _bump_epoch()
    global _MATVEC_MODE
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError("matvec mode must be auto, xla or pallas")
    _MATVEC_MODE = mode


def matvec_mode() -> str:
    return _MATVEC_MODE


# ----------------------------------------------------------------------
# Conv feature-map implementation (see ops/pallas/conv_pallas.py).
# "auto" (default) uses the fused Pallas window-loop kernel on TPU for
# supported shapes and the XLA scan elsewhere; "xla" forces the scan;
# "pallas" forces the kernel (interpret-mode on CPU -- slow, for
# testing).  Read at trace time.
_CONV_MODE = "auto"


def set_conv_mode(mode: str):
    _bump_epoch()
    global _CONV_MODE
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError("conv mode must be auto, xla or pallas")
    _CONV_MODE = mode


def conv_mode() -> str:
    return _CONV_MODE


# ----------------------------------------------------------------------
# Dense RBF feature-map implementation (see ops/pallas/sorf_pallas.py).
# "auto" (default) fuses projection + sincos + block layout into one
# Pallas kernel on TPU for supported shapes (measured 1.69x the XLA path
# on the predict step); "xla" forces the unfused path; "pallas" forces
# the kernel (interpret mode on CPU -- slow, for testing).  Read at
# trace time.
_FEATURE_MAP_MODE = "auto"


def set_feature_map_mode(mode: str):
    _bump_epoch()
    global _FEATURE_MAP_MODE
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError("feature map mode must be auto, xla or pallas")
    _FEATURE_MAP_MODE = mode


def feature_map_mode() -> str:
    return _FEATURE_MAP_MODE


# ----------------------------------------------------------------------
# sin/cos evaluation in the feature maps (see ops/sincos.py).  "auto"
# (default, alias "hi") uses the full-period deg-13/14 polynomial pair
# for float32 (max err ~6e-7, no quadrant logic) and the exact builtin
# for float64; "exact" forces the builtin; "poly" keeps the legacy
# quadrant-folded cephes evaluator; "fast" uses the half-cost low-degree
# pair (max err 4.1e-5 -- inside the 1e-3 fp32 feature contract) for
# throughput-critical float32 fits.  Read at trace time.
_SINCOS_MODE = "auto"


def set_sincos_mode(mode: str):
    _bump_epoch()
    global _SINCOS_MODE
    if mode not in ("auto", "exact", "poly", "hi", "fast"):
        raise ValueError("sincos mode must be auto, exact, poly, hi or fast")
    _SINCOS_MODE = mode


def sincos_mode() -> str:
    return _SINCOS_MODE


# ----------------------------------------------------------------------
# CG solver lowering.  "fused" (default) runs the whole PCG as ONE
# while_loop program over device-resident data -- minimum dispatch
# latency, but the largest single program the framework compiles.
# "looped" keeps the iteration in Python, dispatching one matvec
# reduction per CG step: many small dispatches instead of one big
# compile.  The looped form is the right choice behind device relays
# whose workers crash on long fresh compiles (each matvec program is a
# fraction of the fused program's size and is shared with every other
# reduction pass), at the cost of per-iteration dispatch latency.
_CG_MODE = "fused"


def set_cg_mode(mode: str):
    _bump_epoch()
    global _CG_MODE
    if mode not in ("fused", "looped"):
        raise ValueError("cg mode must be fused or looped")
    _CG_MODE = mode


def cg_mode() -> str:
    return _CG_MODE


# ----------------------------------------------------------------------
# M-dimension sharding for the fused sharded CG (fitting/fused_cg.py
# fused_cg_solve_msharded).  At num_rffs >~ 32k the replicated CG state
# and (M, rank) Nystrom factor stop fitting one chip; sharding them over
# the mesh turns the matvec accumulation into a reduce-scatter and the
# preconditioner inner product into a psum.  "auto" enables it when
# num_rffs >= the threshold and divides the mesh size; "on"/"off" force.
_M_SHARDING = "auto"
_M_SHARDING_THRESHOLD = 32768


def set_m_sharding(mode: str, threshold: int = None):
    _bump_epoch()
    global _M_SHARDING, _M_SHARDING_THRESHOLD
    if mode not in ("auto", "on", "off"):
        raise ValueError("m_sharding must be auto, on or off")
    _M_SHARDING = mode
    if threshold is not None:
        _M_SHARDING_THRESHOLD = int(threshold)


def use_m_sharding(num_rffs: int, n_dev: int) -> bool:
    if _M_SHARDING == "off" or n_dev <= 1 or num_rffs % n_dev != 0:
        if _M_SHARDING == "on":
            # The user forced M-sharding (usually to dodge replicated
            # state OOM) but the run cannot honor it; falling back
            # silently would hide the memory cliff they tried to avoid.
            import warnings
            reason = "only one device is visible" if n_dev <= 1 else \
                f"num_rffs={num_rffs} is not divisible by {n_dev} devices"
            warnings.warn(
                f"M-sharding was forced on but {reason}; running the "
                "replicated solver instead.", UserWarning)
        return False
    if _M_SHARDING == "on":
        return True
    return num_rffs >= _M_SHARDING_THRESHOLD


# ----------------------------------------------------------------------
# Device-resident ("stacked") vs out-of-core ("streaming") dataset
# storage.  Stacked mode keeps the raw data in HBM and runs every
# reduction as one scanned device program -- the fast path; streaming
# re-feeds superbatches from host per dataset pass.  The default limit
# (1e9 fp32 elements = 4 GB raw, per device) leaves room for the
# (chunk, num_rffs) feature workspace on a 16 GB chip; hosts with more
# HBM per chip (or small num_rffs) can raise it so datasets a little
# over the line avoid per-pass host transfer entirely.
_STACKED_ELEMENT_LIMIT = 10 ** 9


def set_stacked_limit(n_elements: int):
    """Max raw x-elements per device stored device-resident; datasets
    above it stream from host with prefetch."""
    _bump_epoch()
    global _STACKED_ELEMENT_LIMIT
    n_elements = int(n_elements)
    if n_elements <= 0:
        raise ValueError("stacked limit must be a positive element count")
    _STACKED_ELEMENT_LIMIT = n_elements


def stacked_element_limit() -> int:
    return _STACKED_ELEMENT_LIMIT


# ----------------------------------------------------------------------
# Engine selection: "auto" uses the sharded (shard_map + psum) engine when
# more than one accelerator device is visible; "single" always uses the
# single-device engine; "sharded" forces the sharded engine (useful for
# testing multi-device paths on a virtual CPU mesh).
_ENGINE_MODE = "auto"


def set_engine_mode(mode: str):
    _bump_epoch()
    global _ENGINE_MODE
    if mode not in ("auto", "single", "sharded"):
        raise ValueError("engine mode must be auto, single or sharded")
    _ENGINE_MODE = mode


def engine_mode() -> str:
    return _ENGINE_MODE


def should_shard() -> bool:
    if _ENGINE_MODE == "sharded":
        return len(jax.devices()) > 1
    if _ENGINE_MODE == "single":
        return False
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    return len(accel) > 1
