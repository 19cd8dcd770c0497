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


def device_memory_stats(print_out: bool = False) -> list:
    """Per-device HBM usage/limit, MiB (the printGpuMemoryUsage analog,
    engine.cpp:17-47 — the reference prints VMA heap budgets after each init
    phase; call this around scene upload / binning to watch HBM).
    """
    import jax

    rows = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        used = s.get("bytes_in_use", 0) / 2**20
        limit = s.get("bytes_limit", 0) / 2**20
        rows.append(dict(device=str(d), used_mib=round(used, 1),
                         limit_mib=round(limit, 1),
                         peak_mib=round(s.get("peak_bytes_in_use", 0)
                                        / 2**20, 1)))
        if print_out:
            print(f"[mem] {d}: {used:.1f} / {limit:.1f} MiB "
                  f"(peak {rows[-1]['peak_mib']:.1f})")
    return rows


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
