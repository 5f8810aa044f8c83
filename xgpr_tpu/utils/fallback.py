"""One-time diagnostics when a hot Pallas path falls back to XLA.

The fused kernels gate on shape/dtype support at trace time and fall
back silently otherwise; a silent fallback on a hot path (the CG matvec,
the conv window loop) can cost 1.5-6x throughput with no visible sign.
``note_fallback`` warns once per (op, reason) pair per process so the
drop is observable without spamming every retrace.
"""
import warnings

_SEEN = set()


def note_fallback(op: str, reason: str):
    key = (op, reason)
    if key in _SEEN:
        return
    _SEEN.add(key)
    warnings.warn(
        f"xgpr_tpu: fused {op} kernel unavailable ({reason}); using the "
        "slower XLA path for this configuration.", RuntimeWarning,
        stacklevel=3)


def reset():
    """Testing hook."""
    _SEEN.clear()
