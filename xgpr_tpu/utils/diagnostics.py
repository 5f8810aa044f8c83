"""Tracing / profiling / timing utilities.

The reference ships only standalone timeit scripts and removed its CUDA
profiler hooks (HISTORY.md:156-159); SURVEY.md section 5 prescribes
jax.profiler traces + per-phase timing for the TPU build.  ``phase_timer``
wraps any fit/tune phase; ``trace`` wraps a region in a jax.profiler trace
whose output can be opened in TensorBoard / Perfetto.
"""
import contextlib
import time

import jax


class PhaseTimes(dict):
    """Accumulated wall-clock seconds per named phase."""

    def report(self):
        width = max((len(k) for k in self), default=0)
        return "\n".join(f"{k.ljust(width)}  {v:.4f}s"
                         for k, v in self.items())


@contextlib.contextmanager
def phase_timer(times: PhaseTimes, name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        times[name] = times.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace over the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block on every array in a pytree (for honest phase timing)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
