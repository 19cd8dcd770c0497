"""Profiling helpers: fenced timers, rays/s meters, jax profiler traces.

The reference's only profiling is an FPS counter in the window title
(engine.cpp:2107-2117); here we provide proper device-fenced timing (the
axon/TPU dispatch is asynchronous — block_until_ready alone can return
before remote execution finishes, so meters pull a scalar to the host).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional


def fence(*pytrees) -> float:
    """Force completion of all computations producing the given arrays."""
    import jax
    import jax.numpy as jnp

    total = 0.0
    for tree in pytrees:
        total += sum(float(jnp.sum(x)) for x in jax.tree.leaves(tree)
                     if hasattr(x, "dtype"))
    return total


@contextlib.contextmanager
def device_timer(label: str = "", result_holder: Optional[dict] = None):
    """Context manager timing a fenced device computation."""
    t0 = time.perf_counter()
    out = {}
    yield out
    if "result" in out:
        fence(out["result"])
    dt = time.perf_counter() - t0
    if result_holder is not None:
        result_holder[label or "elapsed"] = dt


class RaysPerSecondMeter:
    """Streaming rays/s counter for render loops."""

    def __init__(self):
        self.rays = 0
        self.t0 = time.perf_counter()

    def add(self, num_rays: int):
        self.rays += num_rays

    @property
    def rays_per_s(self) -> float:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return self.rays / dt

    def reset(self):
        self.rays = 0
        self.t0 = time.perf_counter()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (TensorBoard/Perfetto), best-effort."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
