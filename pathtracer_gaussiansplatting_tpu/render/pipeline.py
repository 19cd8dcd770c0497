"""Backend selection: wire scalable tracers into the path tracer.

The reference has one traversal backend (the hardware TLAS). Here three,
each trace_dense-compatible:
  * 'dense' — exact O(R*N) oracle (tests, small scenes)
  * 'grid'  — uniform-grid DDA (scales to millions of Gaussians)
  * 'auto'  — dense below a size threshold, else grid

Backends are returned as ``jax.tree_util.Partial`` pytrees: the bound
acceleration structure / scene arrays are pytree LEAVES, so callers can
(and should) pass trace_fn/visibility_fn straight through jit boundaries
as arguments. Capturing them in a closure instead bakes hundreds of MB of
constants into the HLO — the axon remote-compile service rejects such
modules (HTTP 413), and every scene update would force a retrace.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, RenderSettings
from pathtracer_gaussiansplatting_tpu.render import reference as ref

AUTO_DENSE_LIMIT = 50_000


def _dense_vis(settings, scene, o, d, t, active=None, return_frozen=False):
    vis = ref.visibility_dense(scene, o, d, t, settings)
    if active is not None:
        vis = jnp.where(active, vis, 1.0)
    if return_frozen:  # dense is exact: nothing ever freezes
        return vis, jnp.int32(0)
    return vis


def _grid_trace(max_steps, accel, scene, rays, settings, active=None):
    from pathtracer_gaussiansplatting_tpu.render.grid_trace import trace_grid

    return trace_grid(scene, rays, settings, accel=accel,
                      max_steps=max_steps, active=active)


def _grid_vis(max_steps, settings, accel, scene, o, d, t, active=None,
              return_frozen=False):
    from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
        visibility_grid,
    )

    return visibility_grid(scene, accel, o, d, t, settings,
                           max_steps=max_steps, active=active,
                           return_frozen=return_frozen)


def _spatial_trace(mesh, scene_slabbed, _scene, rays, settings,
                   active=None):
    del active  # slab compositor is dense per slab; masking gains nothing
    from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
        trace_spatial,
    )

    return trace_spatial(scene_slabbed, rays, settings, mesh)


def _spatial_vis(mesh, settings, scene_slabbed, o, d, t, active=None,
                 return_frozen=False):
    del active
    from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
        visibility_spatial,
    )

    vis = visibility_spatial(scene_slabbed, o, d, t, settings, mesh)
    if return_frozen:  # slab compositor is dense per slab: no freezing
        return vis, jnp.int32(0)
    return vis


def make_trace_backend(scene: GaussianScene, settings: RenderSettings,
                       backend: str = "auto",
                       grid_dims: Optional[Tuple[int, int, int]] = None,
                       max_per_cell: int = 32,
                       max_steps: int = 192,
                       accel=None):
    """Build (trace_fn, visibility_fn) for the chosen backend.

    trace_fn(scene, rays, settings) -> interaction dict;
    visibility_fn(origins, dirs, t_end) -> transmittance. Both are
    jax.tree_util.Partial pytrees binding any acceleration structure
    (built here, on the host, once) — pass them as jit ARGUMENTS.
    ``grid_dims=None`` auto-fits the grid to the scene (fit_grid).
    """
    if backend == "auto":
        backend = "dense" if scene.num_gaussians <= AUTO_DENSE_LIMIT \
            else "grid"
    if backend == "dense":
        trace_fn = jax.tree_util.Partial(ref.trace_dense)
        vis_fn = jax.tree_util.Partial(
            functools.partial(_dense_vis, settings), scene)
        return trace_fn, vis_fn
    if backend == "grid":
        from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
            build_grid_accel,
        )

        if accel is None:
            accel = build_grid_accel(scene, dims=grid_dims,
                                     max_per_cell=max_per_cell)
        trace_fn = jax.tree_util.Partial(
            functools.partial(_grid_trace, max_steps), accel)
        vis_fn = jax.tree_util.Partial(
            functools.partial(_grid_vis, max_steps, settings), accel, scene)
        return trace_fn, vis_fn
    if backend == "spatial":
        # Spatially partitioned scene (parallel/spatial.py): `scene` must be
        # the slab-partitioned output of partition_slabs, gauss-sharded on
        # `mesh`; ray batches must follow spatial_sharding's layout.
        mesh = accel  # the mesh rides the accel slot
        if mesh is None:
            raise ValueError("backend='spatial' needs accel=<mesh>")
        trace_fn = jax.tree_util.Partial(
            functools.partial(_spatial_trace, mesh), scene)
        vis_fn = jax.tree_util.Partial(
            functools.partial(_spatial_vis, mesh, settings), scene)
        return trace_fn, vis_fn
    raise ValueError(f"unknown backend '{backend}'")
