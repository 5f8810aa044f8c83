"""Fast paired sin/cos for the random-feature maps.

Every feature map in this library evaluates cos(arg) AND sin(arg) of the
same (N, F) projection (the reference's post-process writes the
interleaved pair, shared_rfgen_ops.cpp:91-114).  On TPU these
transcendentals run on the VPU and dominate the CG matvec once the
projection matmuls are on the MXU (measured: ~4-5 ms of a ~5.6 ms chunk,
see ROUND_NOTES.md) -- XLA's builtin sine/cosine each perform their own
wide-range argument reduction and a high-degree polynomial.

``sincos`` instead does ONE shared Cody-Waite quadrant reduction and two
short minimax polynomials (cephes sinf/cosf coefficients, max error
~1.2e-7 over the reduced interval -- the same order as fp32 ULP, i.e. no
worse than the builtin for this use).  It is pure elementwise jnp, so XLA
fuses it into the surrounding feature-map program; no Pallas needed.

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
fp64 contract) always use the exact builtin; float32 uses the polynomial
unless ``config.set_sincos_mode("exact")``.
"""
import numpy as np
import jax.numpy as jnp

from ..config import sincos_mode

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


# Cody-Waite reduction is exact while n = round(2x/pi) fits DP1's 12-bit
# mantissa; beyond |x| ~ 2^13 the n*DP1 product rounds and r drifts.
_POLY_ARG_LIMIT = 8192.0


def _guarded_poly_sincos(x: jnp.ndarray):
    """Polynomial path with a runtime validity guard: if any |x| exceeds
    the Cody-Waite range, the whole array falls back to the exact builtin
    (one scalar reduction + a branch; only the taken side executes)."""
    import jax

    def exact(v):
        return jnp.cos(v), jnp.sin(v)

    big = jnp.max(jnp.abs(x)) > jnp.asarray(_POLY_ARG_LIMIT, x.dtype)
    return jax.lax.cond(big, exact, _poly_sincos, x)


def sincos(x: jnp.ndarray):
    """Return (cos(x), sin(x)), fast-polynomial for float32 feature paths.

    float64 (and the explicit "exact" mode) use the builtin so CPU fp64
    runs keep the reference's numerical contract bit-for-bit.
    """
    mode = sincos_mode()
    if mode == "poly":
        return _poly_sincos(x)
    if mode == "auto" and x.dtype == jnp.float32:
        return _guarded_poly_sincos(x)
    return jnp.cos(x), jnp.sin(x)
