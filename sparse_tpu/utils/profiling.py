"""Profiling helpers: jax.profiler tracing plus honest op timing.

SURVEY.md §5.1: the reference has no profiling hooks; ours are jax.profiler
traces plus roofline accounting (utils/stats.py).  ``timed_op`` implements
the dependency-chained timing protocol from docs/performance.md — on
remote/async backends naive ``block_until_ready`` timing reports impossible
numbers, and loop-invariant operands let XLA hoist the work out entirely.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "timed_op"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_op(step, v0, *operands, iters: int = 10, reps: int = 3) -> float:
    """Seconds per application of ``step(v, *operands)`` (jit-able, with the
    output feedable back as ``v``), measured as ``iters`` dependency-chained
    applications inside one jit, best of ``reps``; the scalar fetch forces
    full execution.

    Pass the sparse matrix / plan / any large array through ``operands`` —
    as jit *arguments* — rather than closing over them: closure constants
    are embedded in the compile payload, which on remote backends overflows
    the upload limit (HTTP 413) or stretches compiles to minutes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, *ops):
        def body(_, v):
            w = step(v, *ops)
            return w / (jnp.max(jnp.abs(w)) + 1.0)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, v))

    float(run(v0, *operands))  # compile + first run
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(v0, *operands))
        best = min(best, time.perf_counter() - t0)
    return best / iters
