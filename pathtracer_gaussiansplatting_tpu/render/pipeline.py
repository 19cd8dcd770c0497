"""Backend selection: wire scalable tracers into the path tracer.

The reference has one traversal backend (the hardware TLAS). Here three,
each trace_dense-compatible:
  * 'dense' — exact O(R*N) oracle (tests, small scenes)
  * 'grid'  — uniform-grid DDA (scales to millions of Gaussians)
  * 'auto'  — dense below a size threshold, else grid
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, RenderSettings
from pathtracer_gaussiansplatting_tpu.render import reference as ref

AUTO_DENSE_LIMIT = 50_000


def make_trace_backend(scene: GaussianScene, settings: RenderSettings,
                       backend: str = "auto",
                       grid_dims: Tuple[int, int, int] = (64, 64, 64),
                       max_per_cell: int = 64,
                       max_steps: int = 128,
                       accel=None):
    """Build (trace_fn, visibility_fn) for the chosen backend.

    trace_fn(scene, rays, settings) -> interaction dict;
    visibility_fn(origins, dirs, t_end) -> transmittance. Both close over
    any acceleration structure (built here, on the host, once).
    """
    if backend == "auto":
        backend = "dense" if scene.num_gaussians <= AUTO_DENSE_LIMIT \
            else "grid"
    if backend == "dense":
        trace_fn = ref.trace_dense
        vis_fn = lambda o, d, t: ref.visibility_dense(scene, o, d, t,
                                                      settings)
        return trace_fn, vis_fn
    if backend == "grid":
        from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
            build_grid_accel, trace_grid, visibility_grid,
        )

        if accel is None:
            accel = build_grid_accel(scene, dims=grid_dims,
                                     max_per_cell=max_per_cell)
        trace_fn = functools.partial(trace_grid, accel=accel,
                                     max_steps=max_steps)

        def vis_fn(o, d, t):
            return visibility_grid(scene, accel, o, d, t, settings,
                                   max_steps=max_steps)

        return (lambda s, r, st: trace_fn(s, r, st)), vis_fn
    if backend == "spatial":
        # Spatially partitioned scene (parallel/spatial.py): `scene` must be
        # the slab-partitioned output of partition_slabs, gauss-sharded on
        # `mesh`; ray batches must follow spatial_sharding's layout.
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            trace_spatial, visibility_spatial,
        )

        mesh = accel  # the mesh rides the accel slot
        if mesh is None:
            raise ValueError("backend='spatial' needs accel=<mesh>")
        trace_fn = lambda s, r, st: trace_spatial(scene, r, st, mesh)
        vis_fn = lambda o, d, t: visibility_spatial(scene, o, d, t,
                                                    settings, mesh)
        return trace_fn, vis_fn
    raise ValueError(f"unknown backend '{backend}'")
