"""Fit the "fast" full-period sincos coefficients (ops/sincos.py _FS/_FC).

The fast mode replaces the quadrant-folded cephes evaluation with two
minimax polynomials fitted over ONE whole period r in [-pi, pi] (after a
2-term Cody-Waite reduction by whole multiples of 2*pi), which deletes
the quadrant bookkeeping (int conversion, bitmasks, 4 selects, 2
negations) from the VPU inner loop entirely.

Fitting: weighted least squares on a dense grid with Remez-style error
reweighting -- converges to within a few percent of the true minimax
error, which is all the margin analysis needs.  Degrees 9 (sin, odd) and
8 (cos, even) give max errors 5.9e-6 / 4.0e-5: ~25x inside the library's
1e-3 fp32 feature contract (the reference's own rfgen gate).

With --hi, fits the deg-13/14 pair instead (ops/sincos.py _HS/_HC, the
"auto" default): minimax error ~1e-9, but fp32 Horner rounding floors
the end-to-end error at ~6e-7 -- raising the degree past 13/14 measures
flat, so those degrees are where accuracy saturates.

Run: python scripts/fit_fast_sincos.py [--hi]
Prints the coefficient tuples and an end-to-end simulated-fp32 error
sweep across the validity range |x| < 8192.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np


def fit_poly(f, parity, degree, lo=0.0, hi=np.pi, n=40001, iters=200):
    u = np.linspace(lo, hi, n)
    y = f(u)
    powers = (np.arange(1, degree + 1, 2) if parity == "odd"
              else np.arange(0, degree + 1, 2))
    A = u[:, None] ** powers[None, :]
    w = np.ones(n)
    best = None
    for _ in range(iters):
        c, *_ = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)
        e = np.abs(A @ c - y)
        if best is None or e.max() < best[1]:
            best = (c, e.max())
        w *= 1 + e / (e.max() + 1e-30)
        w /= w.mean()
    return powers, best[0], best[1]


def main(hi=False):
    f32 = np.float32
    sdeg, cdeg = (13, 14) if hi else (9, 8)
    _, cs, es = fit_poly(np.sin, "odd", sdeg)
    _, cc, ec = fit_poly(np.cos, "even", cdeg)
    print(f"sin (odd powers to {sdeg}): {tuple(cs)}  max_err {es:.3e}")
    print(f"cos (even powers to {cdeg}): {tuple(cc)}  max_err {ec:.3e}")

    two_pi = 2 * np.pi
    p1 = f32(np.float64(int(two_pi * 2 ** 9)) / 2 ** 9)   # 11 mantissa bits
    p2 = f32(two_pi - np.float64(p1))
    print(f"2pi split: P1={p1!r} P2={p2!r}")

    scoef = [f32(v) for v in cs[::-1]]
    ccoef = [f32(v) for v in cc[::-1]]
    inv = f32(1.0 / two_pi)

    def fullperiod_sincos(x):
        x = f32(x)
        n = np.float32(np.round(x * inv))
        r = f32(f32(x - f32(n * p1)) - f32(n * p2))
        z = f32(r * r)
        sp = scoef[0] * np.ones_like(z)
        for cf in scoef[1:]:
            sp = f32(sp * z + cf)
        cp = ccoef[0] * np.ones_like(z)
        for cf in ccoef[1:]:
            cp = f32(cp * z + cf)
        return cp, f32(sp * r)

    rng = np.random.default_rng(0)
    for scale in (3.0, 30.0, 300.0, 3000.0, 8000.0):
        x = rng.uniform(-scale, scale, 200000).astype(np.float32)
        c, s = fullperiod_sincos(x)
        x64 = x.astype(np.float64)
        print(f"|x|<{scale}: cos err {np.abs(c - np.cos(x64)).max():.2e}"
              f", sin err {np.abs(s - np.sin(x64)).max():.2e}")


if __name__ == "__main__":
    import sys
    main(hi="--hi" in sys.argv)
