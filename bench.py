"""Headline benchmark: streamed CG matvec throughput (the hot loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "configs": {...}, "roofline": {...}}

The measured program is the framework's hot loop -- a batched-RHS CG matvec
Z^T (Z v): SORF random features are generated on-chip and immediately
consumed by the two matmuls, exactly as in fitting (cg_tools.py:26-53 in
the reference).  The output is a small (M, K) matrix whose value depends on
every chunk, so timing it forces full execution without the (very slow)
host-transfer path of this environment's TPU tunnel.

``value`` is random features generated+consumed per second per chip.
``vs_baseline`` is the ratio to the same program on XLA-CPU on this host
(the reference's own C++/OpenMP engine cannot be built here: its nanobind
submodule is empty and the container has no egress).

``configs`` adds BASELINE.json configs #2 and #3 on the accelerator:
  - matern_100k_cg: fused preconditionerless CG on 100k x 64 rows with a
    Matern kernel at 4096 RFFs -- row-iterations/second.
  - conv1d_protein: Conv1dRBF design-matrix pass on protein-shaped
    variable-length sequences -- window-features/second and rows/second.

``roofline`` measures the headline matvec's two hardware bounds in
isolation at the same shapes -- the MXU matmul sequence and the VPU
sincos -- and reports measured time against max(MXU, VPU), the
lower bound for any schedule of this computation on this chip.
"""
import json
import time
from math import ceil

import numpy as np

# Expected healthy-environment bands, from driver-recorded runs and
# session logs on this chip (BENCH_r03 + round-3/4 ROUND_NOTES).  The
# relay between this host and the TPU degrades unpredictably (r04's
# recorded run measured HBM-streaming programs 8-20x slow while
# compute-resident programs were fine), so every recorded artifact
# carries these bands plus probe evidence: a reader (or the recorded
# JSON itself) can tell "slow code" from "sick relay".
EXPECTED_BANDS = {
    # XLA matmul at the matvec's own shallow-k projection shape; r03
    # recorded 36.2 TFLOP/s, sessions 30-49.  The r04 degraded window
    # read 2.43 -- 10x below band.
    "shallow_probe_tflops": (25.0, 80.0),
    # Deep 4096^3 contraction; r03 67.3, r04 80.3 (stable even in the
    # degraded window -- compute-resident programs were unaffected).
    "deep_probe_tflops": (55.0, 115.0),
    # Host->device transfer through the relay; nominal ~16 MB/s (upper
    # bound is just "finite" -- faster transfers are never degradation).
    "transfer_mb_per_sec": (6.0, 1.0e9),
    # Headline matvec; r03 recorded 3.23e10, session band 2.77-3.23e10.
    "headline_features_per_sec": (2.4e10, 5.5e10),
    # measured/bound for the fused matvec; documented band 0.78-0.88,
    # recorded floor 0.780.  >1 is physically impossible when the
    # bound probes are healthy, so it flags probe degradation.
    "matvec_fraction_of_bound": (0.70, 1.0),
}


def _env_health(device, repeats=3):
    """Measure the relay/chip health signals against EXPECTED_BANDS.

    Probes reuse the roofline's exact shapes so their executables come
    from the persistent compile cache (a fresh remote compile is itself
    the relay's least reliable operation)."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu import config as _cfg
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_cfg.feature_precision()]
    passes = {"highest": 6, "high": 3, "default": 1}[
        _cfg.feature_precision()]
    n_chunks, chunk, d, f = 32, 8192, 256, 4096
    rng = np.random.default_rng(3)  # roofline's seed -> same arrays
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (n_chunks, chunk, d)).astype(np.float32)), device)
    proj = jax.device_put(jnp.asarray(rng.standard_normal(
        (d, f)).astype(np.float32)), device)

    # Host->device transfer rate (no compile involved).
    host_buf = np.asarray(rng.standard_normal(
        (4, 1024, 1024)), dtype=np.float32)
    tts = []
    for i in range(max(2, repeats - 1)):
        buf = host_buf + np.float32(i)  # distinct content per repeat
        t0 = time.perf_counter()
        jax.device_put(buf, device).block_until_ready()
        tts.append(time.perf_counter() - t0)
    transfer = host_buf.nbytes / 1e6 / float(np.median(tts))

    def probe_shallow(s, x, proj):
        proj = proj * s
        def body(acc, xb):
            return acc + jnp.sum(
                jnp.matmul(xb, proj, precision=prec) * 1e-4), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    deep = 4096 if device.platform != "cpu" else 512
    sq = jax.device_put(jnp.asarray(rng.standard_normal(
        (2, deep, deep)).astype(np.float32)), device)

    def probe_deep(s, sq):
        def body(acc, _):
            return jnp.matmul(acc, sq[1], precision=prec), None
        acc, _ = jax.lax.scan(body, sq[0] * s, None, length=8)
        return jnp.sum(acc * 1e-30)

    def timed(fn, args):
        jfn = jax.jit(fn, device=device)
        np.asarray(jfn(np.float32(1.0), *args))
        ts = []
        for i in range(repeats):
            s = np.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(jfn(s, *args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_shallow = timed(probe_shallow, (x, proj))
    t_deep = timed(probe_deep, (sq,))
    shallow_tflops = 2.0 * n_chunks * chunk * d * f * passes \
        / t_shallow / 1e12
    deep_tflops = 2.0 * (deep ** 3) * 8 * passes / t_deep / 1e12

    checks = {"shallow_probe_tflops": shallow_tflops,
              "deep_probe_tflops": deep_tflops,
              "transfer_mb_per_sec": transfer}
    out_of_band = [name for name, val in checks.items()
                   if not (EXPECTED_BANDS[name][0] <= val
                           <= EXPECTED_BANDS[name][1])]
    checks["out_of_band"] = out_of_band
    checks["healthy"] = not out_of_band
    return checks


def _matvec_rate(device, n_rows=262144, d=256, num_rffs=8192, chunk=8192,
                 n_rhs=8, repeats=5):
    import jax
    import jax.numpy as jnp
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS

    # The production feature path (auto-selects the dense MXU projection
    # and the cos/sin-parts contraction, exactly as the fused CG does).
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n_rows, d), num_rffs, 123)
    kernel.set_hyperparams(np.log(np.array([0.1, 1.0])))
    feature_fn = kernel.pure_feature_fn()
    parts_fn = kernel.pure_feature_parts_fn()
    # Fused Pallas matvec only on the accelerator target; the CPU baseline
    # run keeps the XLA path (Pallas has no compiled CPU backend).
    ztzv_fn = kernel.pure_ztzv_parts_fn() \
        if device.platform != "cpu" else None
    positions = kernel.feature_positions() if parts_fn else None
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), device)
    num_freqs = num_rffs // 2

    rng = np.random.default_rng(0)
    n_chunks = n_rows // chunk
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n_chunks, chunk, d)).astype(np.float32)),
        device)
    # A distinct RHS per repeat defeats any result caching in the runtime.
    vs = jax.device_put(jnp.asarray(rng.standard_normal(
        (repeats + 1, num_rffs, n_rhs)).astype(np.float32)), device)

    from xgpr_tpu import config as _cfg
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_cfg.feature_precision()]

    if positions is not None:
        cos_pos = jax.device_put(jnp.asarray(positions[0]), device)
        sin_pos = jax.device_put(jnp.asarray(positions[1]), device)

    def matvec(x, v, params):
        if positions is not None:
            v_c = jnp.take(v, cos_pos, axis=0)
            v_s = jnp.take(v, sin_pos, axis=0)

            ones = jnp.ones((chunk,), jnp.float32)

            def body(acc, xb):
                fused = None
                if ztzv_fn is not None:
                    fused = ztzv_fn(params, xb, None, ones, v_c, v_s)
                if fused is not None:
                    oc, os = fused
                else:
                    c, s = parts_fn(params, xb, None)
                    zv = jnp.matmul(c, v_c, precision=prec) + \
                        jnp.matmul(s, v_s, precision=prec)
                    oc = jnp.matmul(c.T, zv, precision=prec)
                    os = jnp.matmul(s.T, zv, precision=prec)
                return (acc[0] + oc, acc[1] + os), None
            init = (jnp.zeros((num_freqs, n_rhs), jnp.float32),
                    jnp.zeros((num_freqs, n_rhs), jnp.float32))
            (oc, os), _ = jax.lax.scan(body, init, x)
            out = jnp.zeros((num_rffs, n_rhs), jnp.float32)
            return out.at[cos_pos].set(oc).at[sin_pos].set(os)

        def body(acc, xb):
            z = feature_fn(params, xb, None)
            zv = jnp.matmul(z, v, precision=prec)
            return acc + jnp.matmul(z.T, zv, precision=prec), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((num_rffs, n_rhs), jnp.float32), x)
        return acc

    fn = jax.jit(matvec, device=device)
    np.asarray(fn(x, vs[0], params))  # compile + warmup

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        # Host-read of the small (M, K) output: the only completion signal
        # this environment's TPU tunnel reports faithfully.
        np.asarray(fn(x, vs[i + 1], params))
        times.append(time.perf_counter() - t0)
    return n_rows * num_rffs / float(np.median(times))


def _matern_cg_rate(device, n_rows=102400, d=64, num_rffs=4096,
                    chunk=8192, iters=10, repeats=3):
    """BASELINE config #2 proxy: fused-CG iteration throughput at 100k
    rows with a Matern kernel (tol=0 pins the iteration count, so the
    measurement is exactly `iters` full-dataset matvecs + vector ops)."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu import build_regression_dataset
    from xgpr_tpu.fitting.engine import Engine
    from xgpr_tpu.fitting.fused_cg import fused_cg_solve_stacked

    rng = np.random.default_rng(1)
    x = rng.standard_normal((n_rows, d)).astype(np.float32)
    y = x[:, 0].astype(np.float32)
    dset = build_regression_dataset(x, y, chunk_size=chunk)
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    kernel = KERNEL_NAME_TO_CLASS["Matern"](
        (n_rows, d), num_rffs, 123,
        kernel_spec_parms={"matern_nu": 2.5})
    kernel.set_hyperparams(np.log(np.array([0.1, 0.25])))
    engine = Engine(kernel, dset, mode="stacked")
    lam = kernel.get_lambda()
    rhs = [jnp.asarray(rng.standard_normal(
        (num_rffs, 1)).astype(np.float32)) for _ in range(repeats + 1)]

    def run(r):
        out = fused_cg_solve_stacked(engine, r, lam, None,
                                     max_iter=iters, tol=0.0)
        return np.asarray(out[0])

    run(rhs[0])  # compile + warmup
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        run(rhs[i + 1])
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    return {"row_iterations_per_sec": n_rows * iters / t,
            "cg_iters_per_sec": iters / t,
            "rows": n_rows, "num_rffs": num_rffs}


def _conv_design_rate(device, n=16384, l=128, d=21, width=9,
                      num_rffs=4096, chunk=2048, repeats=3):
    """BASELINE config #3: Conv1dRBF design-matrix pass on protein-shaped
    variable-length sequences (the sketch / exact-fit hot loop)."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS

    kernel = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n, l, d), num_rffs, 123,
        kernel_spec_parms={"conv_width": width})
    kernel.set_hyperparams(np.log(np.array([0.1, 0.25])))
    fn = kernel.pure_feature_fn()
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), device)
    rng = np.random.default_rng(2)
    n_chunks = n // chunk
    xs = [jax.device_put(jnp.asarray(rng.standard_normal(
        (n_chunks, chunk, l, d)).astype(np.float32)), device)
        for _ in range(2)]
    slen = jax.device_put(jnp.asarray(
        rng.integers(width, l + 1, (n_chunks, chunk)).astype(np.int32)),
        device)

    def design(x, slen, params):
        def body(acc, batch):
            xb, lb = batch
            z = fn(params, xb, lb)
            return acc + jnp.matmul(
                z.T, z, precision=jax.lax.Precision.HIGH), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((num_rffs, num_rffs), jnp.float32),
            (x, slen))
        return jnp.sum(acc)

    run = jax.jit(design, device=device)
    np.asarray(run(xs[0], slen, params))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(xs[(i + 1) % 2], slen, params))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    nw = l - width + 1
    return {"window_features_per_sec": n * nw * (num_rffs // 2) / t,
            "rows_per_sec": n / t, "rows": n, "seq_len": l,
            "num_rffs": num_rffs}


def _roofline(device, chunk=8192, d=256, num_rffs=8192, n_rhs=8,
              n_chunks=32, repeats=7):
    """Empirical component bounds for the headline matvec at its own
    shapes: the MXU work (projection + both contractions as plain
    matmuls) and the VPU work (paired sincos) timed in isolation.
    max(MXU, VPU) lower-bounds any schedule of the fused computation, so
    measured/bound says how close the hot loop is to this chip's
    speed of light.

    Also reports the XLA-achievable matmul rate at the matvec's OWN
    projection shape (`matmul_probe_tflops`) next to the chip's
    deep-shape rate (`matmul_probe_deep_tflops`): the projection's
    shallow contraction depth (k = d = 256) caps the MXU well below
    its 4096^3 peak, and that shape property -- not kernel scheduling
    -- is what any residual measured/bound gap beyond ~0.9 sits on.
    Every number is a median over ``repeats`` runs (round-2's 3-repeat
    readings swung 48-81% through the relay; 7 medians stabilise it)."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu.ops.sincos import kernel_sincos
    f = num_rffs // 2
    rng = np.random.default_rng(3)
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (n_chunks, chunk, d)).astype(np.float32)), device)
    proj = jax.device_put(jnp.asarray(rng.standard_normal(
        (d, f)).astype(np.float32)), device)
    v_c = jax.device_put(jnp.asarray(rng.standard_normal(
        (f, n_rhs)).astype(np.float32)), device)
    v_s = jax.device_put(jnp.asarray(rng.standard_normal(
        (f, n_rhs)).astype(np.float32)), device)

    from xgpr_tpu import config as _cfg
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_cfg.feature_precision()]

    def mxu_only(s, x, proj, v_c, v_s):
        # Same matmul sequence as the matvec, transcendentals replaced by
        # reuse of the projection output (pure MXU + minimal VPU).
        proj = proj * s
        def body(acc, xb):
            arg = jnp.matmul(xb, proj, precision=prec)
            zv = jnp.matmul(arg, v_c, precision=prec) + \
                jnp.matmul(arg, v_s, precision=prec)
            return (acc[0] + jnp.matmul(arg.T, zv, precision=prec),
                    acc[1] + jnp.matmul(arg.T, zv, precision=prec)), None
        init = (jnp.zeros((f, n_rhs), jnp.float32),
                jnp.zeros((f, n_rhs), jnp.float32))
        (a, b), _ = jax.lax.scan(body, init, x)
        return a + b

    def vpu_only(s, x, proj):
        # One cheap matmul to produce the arg, then the sincos pair and
        # the elementwise mask/scale work of the real kernel.
        proj = proj * s
        def body(acc, xb):
            arg = jnp.matmul(xb, proj, precision=jax.lax.Precision.DEFAULT)
            c, s_ = kernel_sincos(jnp.float32)(arg)
            return acc + jnp.sum(c * 0.01) + jnp.sum(s_ * 0.01), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    def timed(fn, args):
        # Distinct scalar input per repeat (CLAUDE.md: the relay
        # misreports completion on repeated identical dispatches); the
        # 1e-6 perturbation folds into one elementwise multiply that is
        # negligible next to the timed matmul/transcendental work.
        jfn = jax.jit(fn, device=device)
        np.asarray(jfn(np.float32(1.0), *args))
        ts = []
        for i in range(repeats):
            s = np.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(jfn(s, *args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / n_chunks

    t_mxu = timed(mxu_only, (x, proj, v_c, v_s))
    t_vpu = timed(vpu_only, (x, proj))

    # XLA-achievable matmul probes: the projection's own shallow-k shape
    # vs a deep 4096^3 contraction, both scanned over the same chunks so
    # the dispatch/readback overheads match the bound measurements.
    def probe_shallow(s, x, proj):
        proj = proj * s
        def body(acc, xb):
            return acc + jnp.sum(
                jnp.matmul(xb, proj, precision=prec) * 1e-4), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    deep = 4096 if device.platform != "cpu" else 512
    sq = jax.device_put(jnp.asarray(rng.standard_normal(
        (2, deep, deep)).astype(np.float32)), device)

    def probe_deep(s, sq):
        def body(acc, _):
            return jnp.matmul(acc, sq[1], precision=prec), None
        acc, _ = jax.lax.scan(body, sq[0] * s, None, length=8)
        return jnp.sum(acc * 1e-30)

    passes = {"highest": 6, "high": 3, "default": 1}[
        _cfg.feature_precision()]
    t_shallow = timed(probe_shallow, (x, proj))
    flops_shallow = 2.0 * chunk * d * f * passes
    t_deep_total = timed(probe_deep, (sq,)) * n_chunks  # undo /n_chunks
    flops_deep = 2.0 * (deep ** 3) * 8 * passes

    # Measured full matvec per chunk at the same shapes.
    rate = _matvec_rate(device, n_rows=n_chunks * chunk, d=d,
                        num_rffs=num_rffs, chunk=chunk, n_rhs=n_rhs,
                        repeats=repeats)
    t_meas = chunk * num_rffs / rate
    bound = max(t_mxu, t_vpu)
    matvec_flops = 2.0 * chunk * f * (d + 4 * n_rhs) * passes
    return {"measured_chunk_ms": 1e3 * t_meas,
            "mxu_chunk_ms": 1e3 * t_mxu,
            "vpu_sincos_chunk_ms": 1e3 * t_vpu,
            "bound_chunk_ms": 1e3 * bound,
            "fraction_of_bound": bound / t_meas,
            "bound_kind": "mxu" if t_mxu >= t_vpu else "vpu",
            "repeats": repeats,
            "matmul_probe_tflops": flops_shallow / t_shallow / 1e12,
            "matmul_probe_deep_tflops": flops_deep / t_deep_total / 1e12,
            "kernel_effective_tflops": matvec_flops / t_meas / 1e12}


def _conv_roofline(device, chunk=2048, l=128, d=21, width=9,
                   num_rffs=4096, n_chunks=4, repeats=3):
    """Empirical component bounds for the fused conv window loop at the
    protein-shaped config, vs the production conv feature-parts path.

    The recorded bound is max(MXU im2col+projection, PURE sincos rate):
    the VPU term times the transcendental evaluator alone on a
    VMEM-resident block scaled to the conv's per-chunk pair count, NOT
    an XLA proxy that pays HBM traffic the fused kernel deletes (the
    r03-recorded proxy made fraction_of_bound 1.17 — unfalsifiable).
    The XLA proxy is still reported as ``vpu_xla_proxy_chunk_ms`` for
    context, but never used as the bound."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    from xgpr_tpu.ops.sincos import kernel_sincos

    f = num_rffs // 2
    nw = l - width + 1
    wd = width * d
    kernel = KERNEL_NAME_TO_CLASS["Conv1dRBF"](
        (n_chunks * chunk, l, d), num_rffs, 123,
        kernel_spec_parms={"conv_width": width})
    kernel.set_hyperparams(np.log(np.array([0.1, 0.25])))
    parts_fn = kernel.pure_feature_parts_fn()
    params = jax.device_put(
        jax.tree.map(lambda a: a.astype(jnp.float32)
                     if a.dtype.kind == "f" else a,
                     kernel.feature_params()), device)
    rng = np.random.default_rng(4)
    x = jax.device_put(jnp.asarray(rng.standard_normal(
        (n_chunks, chunk, l, d)).astype(np.float32)), device)
    slen = jax.device_put(jnp.asarray(
        np.full((n_chunks, chunk), l, dtype=np.int32)), device)
    proj = jax.device_put(jnp.asarray(rng.standard_normal(
        (wd, f)).astype(np.float32)), device)

    from xgpr_tpu import config as _cfg
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[_cfg.feature_precision()]

    def patches(xb):
        return jax.lax.conv_general_dilated_patches(
            xb, filter_shape=(width,), window_strides=(1,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))

    def mxu_only(s, x, proj):
        proj = proj * s
        def body(acc, xb):
            xw = patches(xb).reshape(chunk * nw, wd)
            arg = jnp.matmul(xw, proj, precision=prec)
            return acc + jnp.sum(arg * 0.01), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    def vpu_only(s, x, proj):
        proj = proj * s
        def body(acc, xb):
            xw = patches(xb).reshape(chunk * nw, wd)
            arg = jnp.matmul(xw, proj,
                             precision=jax.lax.Precision.DEFAULT)
            c, s_ = kernel_sincos(jnp.float32)(arg)
            cs = jnp.sum(c.reshape(chunk, nw, f), axis=1)
            ss = jnp.sum(s_.reshape(chunk, nw, f), axis=1)
            return acc + jnp.sum(cs * 0.01) + jnp.sum(ss * 0.01), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    # Pure transcendental rate: the sincos pair evaluated on one small
    # resident block, iterated until the per-chunk pair count is covered.
    # The block never leaves on-chip memory, so this is the rate the VPU
    # can sustain when a fused kernel feeds it from VMEM — the honest
    # speed-of-light for the conv window loop's dominant work.
    blk_rows = 512
    pairs_per_chunk = chunk * nw * f
    sincos_iters = max(1, ceil(pairs_per_chunk / (blk_rows * f)))
    seed_blk_host = rng.standard_normal((blk_rows, f)).astype(np.float32)
    seed_blk = jax.device_put(jnp.asarray(seed_blk_host), device)

    def sincos_pure(s, blk):
        def body(acc, i):
            arg = blk * (s + 1e-6 * i)
            c, s_ = kernel_sincos(jnp.float32)(arg)
            return acc + jnp.sum(c * 0.01) + jnp.sum(s_ * 0.01), None
        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(sincos_iters * n_chunks, dtype=jnp.float32))
        return acc

    def measured(s, x, slen, params):
        x = x * s
        def body(acc, batch):
            xb, lb = batch
            c, s_ = parts_fn(params, xb, lb)
            return acc + jnp.sum(c * 0.01) + jnp.sum(s_ * 0.01), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              (x, slen))
        return acc

    def timed(fn, args):
        # Distinct scalar per repeat -- see the matvec roofline's timed().
        jfn = jax.jit(fn, device=device)
        np.asarray(jfn(np.float32(1.0), *args))
        ts = []
        for i in range(repeats):
            s = np.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(jfn(s, *args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / n_chunks

    t_mxu = timed(mxu_only, (x, proj))
    t_vpu_proxy = timed(vpu_only, (x, proj))
    t_vpu = timed(sincos_pure, (seed_blk,))
    t_meas = timed(measured, (x, slen, params))
    bound = max(t_mxu, t_vpu)
    return {"measured_chunk_ms": 1e3 * t_meas,
            "mxu_chunk_ms": 1e3 * t_mxu,
            "vpu_sincos_chunk_ms": 1e3 * t_vpu,
            "vpu_xla_proxy_chunk_ms": 1e3 * t_vpu_proxy,
            "bound_chunk_ms": 1e3 * bound,
            "fraction_of_bound": bound / t_meas,
            "bound_kind": "mxu" if t_mxu >= t_vpu else "vpu",
            "sincos_pairs_per_chunk": pairs_per_chunk}


def _shardmap_pallas_check(device, n_rows=16384, d=84, num_rffs=2048,
                           chunk=2048, iters=8):
    """VERDICT r2 item 7: run the fused Pallas matvec INSIDE shard_map on
    real hardware (a 1-device mesh exercises the production multi-chip
    lowering: Pallas call under shard_map with psum'd accumulators) and
    check the solve agrees with the plain single-device fused CG."""
    import jax
    import jax.numpy as jnp
    from xgpr_tpu import build_regression_dataset
    from xgpr_tpu.kernels import KERNEL_NAME_TO_CLASS
    from xgpr_tpu.fitting.engine import Engine
    from xgpr_tpu.fitting.fused_cg import (fused_cg_solve_stacked,
                                           fused_cg_solve_sharded)
    from xgpr_tpu.parallel.sharded import ShardedEngine
    from jax.sharding import Mesh

    rng = np.random.default_rng(5)
    x = rng.standard_normal((n_rows, d)).astype(np.float32)
    y = x[:, 0].astype(np.float32)
    dset = build_regression_dataset(x, y, chunk_size=chunk)
    kernel = KERNEL_NAME_TO_CLASS["RBF"]((n_rows, d), num_rffs, 123)
    kernel.set_hyperparams(np.log(np.array([0.1, 0.25])))
    lam = kernel.get_lambda()
    rhs = jnp.asarray(rng.standard_normal(
        (num_rffs, 1)).astype(np.float32))

    engine = Engine(kernel, dset, mode="stacked")
    w_single = np.asarray(fused_cg_solve_stacked(
        engine, rhs, lam, None, max_iter=iters, tol=0.0)[0])

    mesh = Mesh(np.asarray([device]), ("data",))
    sharded = ShardedEngine(kernel, dset, mesh)
    t0 = time.perf_counter()
    w_mesh = np.asarray(fused_cg_solve_sharded(
        sharded, rhs, lam, None, max_iter=iters, tol=0.0)[0])
    t = time.perf_counter() - t0
    scale = float(np.abs(w_single).max()) or 1.0
    delta = float(np.abs(w_mesh - w_single).max()) / scale
    return {"max_rel_weight_delta": delta,
            "agrees": bool(delta < 1e-4),
            "mesh_solve_seconds": t,
            "rows": n_rows, "num_rffs": num_rffs, "cg_iters": iters}


def health_only():
    """Print one JSON line of _env_health measurements and exit 0 iff
    healthy -- lets retry drivers gate chip work on the same bands the
    recorded benchmark uses (``python bench.py --health``)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    accel = [dv for dv in jax.devices() if dv.platform != "cpu"]
    if not accel:
        print(json.dumps({"healthy": True, "note": "no accelerator"}))
        return 0
    health = _env_health(accel[0])
    health["expected_bands"] = {
        k: list(v) for k, v in EXPECTED_BANDS.items()
        if k in health}
    print(json.dumps(health))
    return 0 if health["healthy"] else 1


def main():
    import jax
    # Persistent compilation cache: remote compiles in this environment
    # can take many minutes; caching executables on disk makes repeat
    # bench runs (and the driver's end-of-round run) fast.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    accel = [dv for dv in jax.devices() if dv.platform != "cpu"]
    target = accel[0] if accel else jax.devices()[0]

    # Health gate: measure the relay/chip against the recorded healthy
    # bands BEFORE benchmarking, retrying through transient degradation.
    # r04's driver-recorded artifact was captured in a degraded window
    # (headline 12x low, shallow probe 15x low, fraction_of_bound > 1)
    # with nothing in the JSON to say so; this run stamps the evidence.
    health = None
    evidence = []
    if accel:
        for attempt in range(3):
            try:
                health = _env_health(target)
            except Exception as e:
                health = {"error": str(e)[:200], "healthy": False,
                          "out_of_band": ["probe_error"]}
            if health.get("healthy"):
                break
            time.sleep(90)
        if not health.get("healthy"):
            evidence.append({"check": "env_health_probes",
                             "detail": health.get("out_of_band")})

    # The headline also self-checks against its recorded band: a relay
    # that degrades between the gate and the measurement still gets
    # caught, with one bounded re-measure before flagging.
    band = EXPECTED_BANDS["headline_features_per_sec"]
    value = _matvec_rate(target)
    if accel and not band[0] <= value <= band[1]:
        time.sleep(60)
        value = max(value, _matvec_rate(target))
        if not band[0] <= value <= band[1]:
            evidence.append({"check": "headline_features_per_sec",
                             "measured": float(value),
                             "expected_band": list(band)})

    vs_baseline = 1.0
    if accel:
        cpu = jax.devices("cpu")[0]
        cpu_rate = _matvec_rate(cpu, n_rows=8192, chunk=2048, repeats=2)
        vs_baseline = value / cpu_rate

    out = {
        "metric": "cg_matvec_rff_features_per_sec_per_chip",
        "value": float(value),
        "unit": "features/s",
        "vs_baseline": float(vs_baseline),
    }
    if accel:
        out["environment"] = health
        out["expected_bands"] = {
            k: list(v) for k, v in EXPECTED_BANDS.items()}
    if accel:
        from xgpr_tpu import config as _cfg
        configs = {}
        try:
            configs["matern_100k_cg"] = _matern_cg_rate(target)
        except Exception as e:  # never lose the headline metric
            configs["matern_100k_cg"] = {"error": str(e)[:200]}
        try:
            configs["conv1d_protein"] = _conv_design_rate(target)
        except Exception as e:
            configs["conv1d_protein"] = {"error": str(e)[:200]}
        # The documented "max" speed preset (docs/speed_modes.md): 1-pass
        # bf16 projection + bf16 Z + half-cost full-period sincos.  Same
        # programs as the default-preset rows above for direct ratios.
        try:
            _cfg.set_speed_preset("max")
            rate_max = float(_matvec_rate(target))
            configs["matvec_max_preset"] = {
                "features_per_sec": rate_max,
                "ratio_vs_default": rate_max / float(value)}
            configs["conv1d_protein_max"] = _conv_design_rate(target)
        except Exception as e:
            configs["matvec_max_preset"] = {"error": str(e)[:200]}
        finally:
            _cfg.set_speed_preset("balanced")
        # The approximate-NMLL CG runs 26 simultaneous RHS (reference
        # xgp_regression.py:342-362: 25 probes + Z^T y); measure the
        # fused matvec at that K and at a probe-batched K=64 next to the
        # headline K=8, with effective TFLOP/s, so the shallow-k
        # roofline analysis covers the K the real tuning workload uses.
        try:
            sweep = {}
            n_rows_s, d_s, rffs_s, chunk_s = 262144, 256, 8192, 8192
            passes_s = {"highest": 6, "high": 3, "default": 1}[
                _cfg.feature_precision()]
            f_s = rffs_s // 2
            for k in (8, 26, 64):
                r = float(value) if k == 8 else float(_matvec_rate(
                    target, n_rows=n_rows_s, d=d_s, num_rffs=rffs_s,
                    chunk=chunk_s, n_rhs=k))
                t_total = n_rows_s * rffs_s / r
                flops = 2.0 * n_rows_s * f_s * (d_s + 4 * k) * passes_s
                sweep[f"k{k}"] = {
                    "features_per_sec": r,
                    "effective_tflops": flops / t_total / 1e12}
            configs["matvec_k_sweep"] = sweep
        except Exception as e:
            configs["matvec_k_sweep"] = {"error": str(e)[:200]}
        try:
            configs["shardmap_pallas"] = _shardmap_pallas_check(target)
        except Exception as e:
            configs["shardmap_pallas"] = {"error": str(e)[:200]}
        out["configs"] = configs
        frac_band = EXPECTED_BANDS["matvec_fraction_of_bound"]
        try:
            roof = _roofline(target)
            # fraction > 1 means the BOUND probe degraded mid-run (the
            # kernel cannot beat its own components); re-measure once.
            if not frac_band[0] <= roof["fraction_of_bound"] <= frac_band[1]:
                time.sleep(60)
                roof = _roofline(target)
            roof["fraction_expected_band"] = list(frac_band)
            if not frac_band[0] <= roof["fraction_of_bound"] <= frac_band[1]:
                evidence.append({
                    "check": "matvec_fraction_of_bound",
                    "measured": roof["fraction_of_bound"],
                    "expected_band": list(frac_band)})
            out["roofline"] = roof
        except Exception as e:
            out["roofline"] = {"error": str(e)[:200]}
        try:
            conv_roof = _conv_roofline(target)
            if conv_roof["fraction_of_bound"] > 1.0:
                time.sleep(60)
                conv_roof = _conv_roofline(target)
            if conv_roof["fraction_of_bound"] > 1.0:
                evidence.append({
                    "check": "conv_fraction_of_bound",
                    "measured": conv_roof["fraction_of_bound"],
                    "expected_band": [0.0, 1.0]})
            out["conv_roofline"] = conv_roof
        except Exception as e:
            out["conv_roofline"] = {"error": str(e)[:200]}
        out["degraded_environment"] = bool(evidence)
        if evidence:
            out["degradation_evidence"] = evidence
    print(json.dumps(out))


if __name__ == "__main__":
    import sys
    if "--health" in sys.argv[1:]:
        sys.exit(health_only())
    main()
