"""Toroidal ray sensor: the dataset-capture ray source.

Port of the reference's torus geometry (torus.h:58-109 generateMesh and the
parametric form in shaders/rt_datacollect/raygen.rgen:43-67): rays originate
on the torus surface and shoot OUTWARD along the surface normal, sweeping the
scene that surrounds/contains the torus. Defaults match the reference
(GeneralHeaders.h:280-283: R=16, r=1, h=8; engine.h:255: 1M rays).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core.types import Rays


@dataclasses.dataclass(frozen=True)
class TorusConfig:
    """Torus sensor parameters (GeneralHeaders.h TorusConfig + engine.h:255)."""

    major_radius: float = 16.0
    minor_radius: float = 1.0
    height: float = 8.0
    num_rays: int = 1_000_000
    major_segments: int = 500   # mesh resolution (visualization only)
    minor_segments: int = 32
    origin_offset: float = 0.05  # safe_origin offset (raygen.rgen:67)


def torus_point_normal(uv, config: TorusConfig):
    """Surface point + outward normal for (u, v) in [0,1]^2
    (raygen.rgen:43-60: u, v scaled by 2*pi; y-up with height offset)."""
    uv = jnp.asarray(uv, jnp.float32)
    u = uv[..., 0] * 2.0 * jnp.pi
    v = uv[..., 1] * 2.0 * jnp.pi
    big_r = config.major_radius
    r = config.minor_radius
    cx = (big_r + r * jnp.cos(v)) * jnp.cos(u)
    cy = r * jnp.sin(v) + config.height
    cz = (big_r + r * jnp.cos(v)) * jnp.sin(u)
    pos = jnp.stack([cx, cy, cz], -1)
    normal = jnp.stack([jnp.cos(v) * jnp.cos(u), jnp.sin(v),
                        jnp.cos(v) * jnp.sin(u)], -1)
    return pos, normal


def torus_rays(uv, config: TorusConfig) -> Rays:
    """Build outward rays from (N, 2) uv samples (raygen.rgen:62-68:
    direction = surface normal, origin nudged 0.05 along it)."""
    pos, normal = torus_point_normal(uv, config)
    origins = pos + normal * config.origin_offset
    return Rays(origins=origins, directions=normal)


def torus_mesh(config: TorusConfig):
    """Triangle mesh of the torus (torus.h:58-109) for visualization/export.

    Returns (vertices (V,3), normals (V,3), faces (F,3) int32).
    """
    import numpy as np

    nu, nv = config.major_segments, config.minor_segments
    u = np.arange(nu) / nu
    v = np.arange(nv) / nv
    uu, vv = np.meshgrid(u, v, indexing="ij")
    uv = np.stack([uu, vv], -1).reshape(-1, 2)
    pos, nrm = torus_point_normal(jnp.asarray(uv), config)
    faces = []
    for i in range(nu):
        for j in range(nv):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            c = ((i + 1) % nu) * nv + (j + 1) % nv
            d = i * nv + (j + 1) % nv
            faces.append([a, b, c])
            faces.append([a, c, d])
    return (np.asarray(pos), np.asarray(nrm),
            np.asarray(faces, dtype=np.int32))
