"""Profiling helpers: the analogue of the reference's PETSc log events.

The reference brackets its hot paths with PetscLogEvent (MULTICOL_SOR,
VecSetRandN; src/parmgmc.c:118-127) surfaced by ``-log_view``.  Here the
equivalents are jax.profiler traces viewable in TensorBoard/XProf plus
``jax.named_scope`` annotations on the sweep/cycle code, and a simple
wall-clock section timer for benchmark drivers (the barrier-fenced TIME
macro of examples/benchmark/main.cc:177-188).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "section", "named_scope"]

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: `with profiling.trace('/tmp/prof'): ...`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def section(name: str, results: dict | None = None):
    """Wall-clock a host-side section (forces nothing; fence first)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    else:
        print(f"[{name}] {dt * 1000:.2f} ms")
