"""Fast paired sin/cos for the random-feature maps.

Every feature map in this library evaluates cos(arg) AND sin(arg) of the
same (N, F) projection (the reference's post-process writes the
interleaved pair, shared_rfgen_ops.cpp:91-114).  On TPU these
transcendentals run on the VPU and dominate the CG matvec once the
projection matmuls are on the MXU (measured: ~4-5 ms of a ~5.6 ms chunk,
see ROUND_NOTES.md) -- XLA's builtin sine/cosine each perform their own
wide-range argument reduction and a high-degree polynomial.

``sincos`` instead does ONE shared Cody-Waite reduction by whole periods
and two minimax polynomials fitted over the full period (deg 13 sin /
deg 14 cos; end-to-end fp32 error ~6e-7 -- a few ULP of a
unit-magnitude result, i.e. no worse than the builtin for this use, and
>1000x inside the 1e-3 feature contract).  No quadrant bookkeeping at
all: measured on chip the full-period pair beats the quadrant-folded
cephes evaluator by 3-5% end-to-end (scripts/sincos_hi_bench.py).  It is
pure elementwise jnp, so XLA fuses it into the surrounding feature-map
program; no Pallas needed.

Validity: exact Cody-Waite products require |arg| < ~2^13 (n*DP1 exact in
fp32).  Feature-map arguments are sigma-scaled SORF projections of
standardised data -- O(1)..O(100) in practice.  ``sincos`` guards this at
runtime: in "auto" mode a scalar max-|arg| check switches the whole array
to the exact builtin when any element exceeds the reduction's validity
range (a large sigma on un-standardised data), so accuracy never silently
degrades.  Explicit "poly" mode skips the guard.  The fused feature maps
guard the same way at their dispatch sites (a conservative norm-product
bound + lax.cond around the Pallas call: dense in kernels/basic.py, conv
parts in kernels/conv1d.py) -- predict-time inputs are arbitrary.  Only
the fused ztzv matvec kernel (training-only: its arguments are
projections of the training data the hyperparameters were tuned on)
keeps the unguarded polynomial; beyond |arg| ~ 2^13 an fp32 argument's
own quantisation already destroys the phase (ULP > 0.05 rad), so no
evaluation scheme is meaningful there and the solver stays deterministic
and finite either way.

Mode selection: float64 inputs (CPU test runs reproducing the reference's
fp64 contract) always use the exact builtin; float32 uses the full-period
polynomial unless ``config.set_sincos_mode("exact")``.
``set_sincos_mode("fast")`` swaps in the half-cost low-degree pair (max
error 4.1e-5, still inside the library's 1e-3 fp32 feature contract; see
the "fast" section below) for throughput-critical fits;
``set_sincos_mode("poly")`` keeps the legacy quadrant-folded cephes
evaluator (max error ~1.2e-7, ~50% more VPU ops than "auto").
"""
import numpy as np
import jax.numpy as jnp

from ..config import sincos_mode


def resolved_sincos_mode() -> str:
    """The config sincos mode with aliases canonicalized ("auto" -> the
    evaluator it currently selects).  Pallas wrappers key their jit
    caches on this so an alias and its target are trace-identical."""
    mode = sincos_mode()
    return "hi" if mode == "auto" else mode


# Cody-Waite split of pi/2 (2x the cephes pi/4 DP constants).
_DP1 = 1.5703125
_DP2 = 4.837512969970703125e-4
_DP3 = 7.54978995489188216e-8

# cephes sinf/cosf minimax coefficients, valid on |r| <= pi/4.
_S1 = -1.9515295891e-4
_S2 = 8.3321608736e-3
_S3 = -1.6666654611e-1
_C1 = 2.443315711809948e-5
_C2 = -1.388731625493765e-3
_C3 = 4.166664568298827e-2


def _poly_sincos(x: jnp.ndarray):
    """(cos x, sin x) via shared quadrant reduction + short polynomials."""
    dt = x.dtype
    two_over_pi = np.asarray(2.0 / np.pi, dtype=dt)
    n = jnp.round(x * two_over_pi)
    # r = x - n*pi/2, computed in exact fp32 pieces (catastrophic
    # cancellation is intended and exact while n*DP1 fits the mantissa).
    r = x - n * np.asarray(_DP1, dt)
    r = r - n * np.asarray(_DP2, dt)
    r = r - n * np.asarray(_DP3, dt)
    z = r * r
    sin_r = ((np.asarray(_S1, dt) * z + np.asarray(_S2, dt)) * z
             + np.asarray(_S3, dt)) * z * r + r
    cos_r = (((np.asarray(_C1, dt) * z + np.asarray(_C2, dt)) * z
              + np.asarray(_C3, dt)) * z * z
             - np.asarray(0.5, dt) * z + np.asarray(1.0, dt))
    q = n.astype(jnp.int32) & 3
    swap = (q & 1).astype(bool)
    sin_v = jnp.where(swap, cos_r, sin_r)
    cos_v = jnp.where(swap, sin_r, cos_r)
    sin_neg = (q & 2).astype(bool)
    cos_neg = (((q + 1) & 2)).astype(bool)
    sin_v = jnp.where(sin_neg, -sin_v, sin_v)
    cos_v = jnp.where(cos_neg, -cos_v, cos_v)
    return cos_v, sin_v


# ----------------------------------------------------------------------
# "fast" mode: one full-period reduction + two short minimax polynomials
# fitted over the WHOLE period [-pi, pi] (scripts/fit_fast_sincos.py), so
# the quadrant bookkeeping (int conversion, bitmasks, swap/negate
# selects -- ~12 VPU ops per element pair) disappears entirely.  Max
# error 4.1e-5 (cos) / 6.4e-6 (sin) across the validity range, flat in
# |x| -- an order below the library's fp32 feature contract (1e-3, the
# reference's own gate in test_fht_operations/test_rbf_rfgen.py) and far
# below the Monte-Carlo error of the random features themselves.  Costs
# ~14 VPU ops per (cos, sin) pair vs ~26 for the cephes path above;
# feature maps are VPU-bound on the conv kernels, so this is the lever
# VERDICT r2 item 5 names.

# 2-term Cody-Waite split of 2*pi: _TP1 carries 11 explicit mantissa
# bits, so n*_TP1 is exact while |n| = |round(x/2pi)| < 2^13 -- the same
# |x| ~ 2^13 validity range as the quadrant reduction above.
_TP1 = 6.28125
_TP2 = 1.9353071795864769e-3

# Minimax coefficients on r in [-pi, pi] (ascending odd/even powers).
_FS = (9.99979391e-01, -1.66624389e-01, 8.30898665e-03,
       -1.92650222e-04, 2.14788592e-06)
_FC = (9.99959802e-01, -4.99793151e-01, 4.14960343e-02,
       -1.33926855e-03, 1.87919992e-05)


def _fast_sincos(x: jnp.ndarray, w=None):
    """(cos x, sin x) via full-period reduction, no quadrant logic.

    When ``w`` is given (a broadcastable per-row multiplier, e.g.
    scale * row_mask), the outputs arrive pre-multiplied by it: the sin
    polynomial's trailing ``* r`` becomes ``* (r * w)`` and the cos
    result takes the one multiply the caller would have spent anyway --
    folding scale AND mask into the evaluation at zero extra cost.
    """
    dt = x.dtype
    n = jnp.round(x * np.asarray(1.0 / (2.0 * np.pi), dt))
    r = x - n * np.asarray(_TP1, dt)
    r = r - n * np.asarray(_TP2, dt)
    z = r * r
    s0, s1, s2, s3, s4 = (np.asarray(v, dt) for v in _FS)
    c0, c1, c2, c3, c4 = (np.asarray(v, dt) for v in _FC)
    sp = (((s4 * z + s3) * z + s2) * z + s1) * z + s0
    cp = (((c4 * z + c3) * z + c2) * z + c1) * z + c0
    if w is None:
        return cp, sp * r
    return cp * w, sp * (r * w)


# ----------------------------------------------------------------------
# "hi" evaluator: the fast path's full-period structure (no quadrant
# bookkeeping at all) at near-builtin accuracy, via higher-degree
# polynomials (deg 13 sin / deg 14 cos, minimax error ~1e-9).  In fp32
# the Horner evaluation's own rounding floors the end-to-end error at
# ~4.2e-7 (cos) / ~6.2e-7 (sin) -- measured over |x| < 8192, flat in
# degree from 11 up (scripts/fit_fast_sincos.py --hi) -- i.e. a few fp32
# ULP of a unit-magnitude result and >1000x inside the 1e-3 feature
# contract.  Cost: ~21 VPU ops per (cos, sin) pair vs ~33 for the
# quadrant-folded cephes path (the int casts, bitmasks and 4 selects all
# disappear), which matters on the VPU-bound conv kernels.

_HS = (1.3451442737455466e-10, -2.4676957366409624e-08,
       2.752945192696643e-06, -0.0001984015543712303,
       0.00833331048488617, -0.166666641831398, 1.0)
_HC = (-9.758583698060708e-12, 2.061550263832146e-09,
       -2.753634191776655e-07, 2.480065268173348e-05,
       -0.0013888865942135453, 0.0416666641831398, -0.5, 1.0)


def _hi_sincos(x: jnp.ndarray, w=None):
    """(cos x, sin x): full-period reduction + deg-13/14 minimax, no
    quadrant logic.  ``w`` folds a per-row multiplier like _fast_sincos."""
    dt = x.dtype
    n = jnp.round(x * np.asarray(1.0 / (2.0 * np.pi), dt))
    r = x - n * np.asarray(_TP1, dt)
    r = r - n * np.asarray(_TP2, dt)
    z = r * r
    sp = np.asarray(_HS[0], dt)
    for c in _HS[1:]:
        sp = sp * z + np.asarray(c, dt)
    cp = np.asarray(_HC[0], dt)
    for c in _HC[1:]:
        cp = cp * z + np.asarray(c, dt)
    if w is None:
        return cp, sp * r
    return cp * w, sp * (r * w)


# Cody-Waite reduction is exact while n = round(2x/pi) fits DP1's 12-bit
# mantissa; beyond |x| ~ 2^13 the n*DP1 product rounds and r drifts.
_POLY_ARG_LIMIT = 8192.0


def _guarded_poly_sincos(x: jnp.ndarray, poly=_poly_sincos):
    """Polynomial path with a runtime validity guard: if any |x| exceeds
    the Cody-Waite range, the whole array falls back to the exact builtin
    (one scalar reduction + a branch; only the taken side executes)."""
    import jax

    def exact(v):
        return jnp.cos(v), jnp.sin(v)

    big = jnp.max(jnp.abs(x)) > jnp.asarray(_POLY_ARG_LIMIT, x.dtype)
    return jax.lax.cond(big, exact, poly, x)


def kernel_sincos(dtype=jnp.float32, mode=None):
    """The unguarded (cos, sin) pair evaluator for a sincos mode
    (default: the current config mode) -- what the fused Pallas kernels
    embed (a lax.cond guard does not belong in a kernel body; callers
    gate extreme-argument workloads onto the XLA path instead).  The
    returned fn takes an optional ``w`` multiplier (see _fast_sincos);
    the exact and cephes paths apply it with one multiply per output.

    Pallas wrappers must pass ``mode`` explicitly as a jit-static
    argument: a module-level jit caches traces by shape, so a mode read
    from config inside the traced body would be silently frozen at
    first-trace time for every later same-shape call.
    """
    if mode is None:
        mode = sincos_mode()
    if mode == "fast" and dtype == jnp.float32:
        return _fast_sincos

    if mode == "exact" or dtype != jnp.float32:
        def pair(x, w=None):
            c, s = jnp.cos(x), jnp.sin(x)
            return (c, s) if w is None else (c * w, s * w)
        return pair

    if mode == "poly":
        # Legacy quadrant-folded cephes evaluator (explicit opt-in).
        def pair(x, w=None):
            c, s = _poly_sincos(x)
            return (c, s) if w is None else (c * w, s * w)
        return pair

    # "auto" / "hi": the full-period deg-13/14 pair -- measured on chip
    # (scripts/sincos_hi_bench.py, 2026-08-20) +2.8% on the fused matvec
    # and +4.9% on the conv design pass over the quadrant path, at the
    # same order of accuracy.
    return _hi_sincos


def sincos(x: jnp.ndarray):
    """Return (cos(x), sin(x)), fast-polynomial for float32 feature paths.

    float64 (and the explicit "exact" mode) use the builtin so CPU fp64
    runs keep the reference's numerical contract bit-for-bit.
    """
    mode = sincos_mode()
    if mode == "poly":
        return _poly_sincos(x)
    if x.dtype == jnp.float32:
        if mode in ("auto", "hi"):
            return _guarded_poly_sincos(x, _hi_sincos)
        if mode == "fast":
            return _guarded_poly_sincos(x, _fast_sincos)
    return jnp.cos(x), jnp.sin(x)
