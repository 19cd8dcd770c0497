"""Point-cloud visualization: z-buffered point rasterizer.

Behavioral port of the reference's point-cloud overlay pass
(shaders/pointcloud/pointcloud.vert:50-89, .frag) — one point per captured
hit-buffer entry, misses discarded, two placement modes:
  * mode "world": points at their world-space hit positions (vert mode 0).
  * mode "torus": points reprojected onto the torus sensor surface at the
    (u, v) that generated their ray (vert mode 1) — visualizes sampling
    coverage of the sensor.

TPU mapping: there is no rasterizer hardware path — a point pass is a
scatter. Depth testing uses the packed-(depth, index) scatter-min trick:
min-reducing a single int32 whose high bits are quantized depth and low bits
the point id gives, per pixel, the nearest point's id in ONE deterministic
scatter (the TPU answer to the depth buffer). Point size in pixels is a
static splat of the scatter footprint (2px like the reference, .vert:88).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, view_matrix
from pathtracer_gaussiansplatting_tpu.core.torus import (
    TorusConfig, torus_point_normal,
)


def _project(points, camera: Camera):
    """World -> pixel coords + view depth. Returns (xy (N,2), depth (N,))."""
    w2c = view_matrix(camera)
    p_view = points @ w2c[:3, :3].T + w2c[:3, 3]
    depth = -p_view[:, 2]
    z = jnp.maximum(depth, 1e-6)
    fy = 0.5 * camera.height / jnp.tan(
        jnp.radians(camera.fov_y_deg) / 2.0)
    x = fy * (p_view[:, 0] / z) + 0.5 * camera.width
    y = fy * (-p_view[:, 1] / z) + 0.5 * camera.height
    return jnp.stack([x, y], -1), depth


@functools.partial(jax.jit, static_argnames=("point_size", "background"))
def rasterize_points(points, colors, valid, camera: Camera,
                     background=(0.0, 0.0, 0.0), point_size: int = 2):
    """Render points with nearest-depth wins. Returns (H, W, 3).

    Args:
      points: (N, 3) world positions; colors: (N, 3); valid: (N,) bool
        (the reference discards flag <= 0 entries, pointcloud.vert:61).
    """
    h, w = camera.height, camera.width
    xy, depth = _project(points, camera)
    n = points.shape[0]
    ix = jnp.floor(xy[:, 0]).astype(jnp.int32)
    iy = jnp.floor(xy[:, 1]).astype(jnp.int32)
    ok = valid & (depth > 1e-4) & (ix >= 0) & (iy >= 0) \
        & (ix < w) & (iy < h)

    # Packed (depth, id) scatter-min depth test. id needs ceil(log2 N) bits;
    # depth gets the rest, capped at 22 bits so the quantized value stays
    # exactly representable in float32 (2^22 < 2^24) and the packed int32
    # stays below the sentinel (depth_bits + id_bits <= 29 < 30).
    id_bits = max(1, math.ceil(math.log2(n + 1)))
    depth_bits = min(29 - id_bits, 22)
    assert depth_bits >= 4, f"too many points for the packed z-test: {n}"
    d_lo = jnp.min(jnp.where(ok, depth, jnp.inf))
    d_hi = jnp.max(jnp.where(ok, depth, -jnp.inf))
    scale = (2.0**depth_bits - 1.0) / jnp.maximum(d_hi - d_lo, 1e-6)
    dq = jnp.clip((depth - d_lo) * scale, 0, 2.0**depth_bits - 1.0)
    packed = dq.astype(jnp.int32) * jnp.int32(2**id_bits) \
        + jnp.arange(n, dtype=jnp.int32) % jnp.int32(2**id_bits)
    sentinel = jnp.int32(2**30)
    packed = jnp.where(ok, packed, sentinel)

    zbuf = jnp.full((h * w,), sentinel, jnp.int32)
    # point_size x point_size splat (reference gl_PointSize = 2, vert:88)
    for dy in range(point_size):
        for dx in range(point_size):
            px = jnp.clip(ix + dx, 0, w - 1)
            py = jnp.clip(iy + dy, 0, h - 1)
            zbuf = zbuf.at[py * w + px].min(packed, mode="drop")

    hit = zbuf < sentinel
    win_id = (zbuf % jnp.int32(2**id_bits)).astype(jnp.int32)
    img = jnp.where(hit[:, None], colors[win_id],
                    jnp.asarray(background, jnp.float32)[None])
    return img.reshape(h, w, 3)


def render_point_cloud(positions, colors, flags, camera: Camera,
                       mode: str = "world", uv=None,
                       torus: TorusConfig = None,
                       background=(0.0, 0.0, 0.0), point_size: int = 2):
    """Point-cloud view of capture output (pointcloud.vert modes 0/1).

    Args:
      positions/colors/flags: HitData arrays from the torus capture
        (data/capture or a loaded points3d.ply; flags > 0 means hit).
      mode: "world" = hit positions; "torus" = points placed on the torus
        surface at the generating (u, v) (requires ``uv`` and ``torus``).
    """
    positions = jnp.asarray(positions, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    valid = jnp.asarray(flags) > 0
    if mode == "torus":
        if uv is None or torus is None:
            raise ValueError("mode='torus' needs uv samples and TorusConfig")
        positions, _ = torus_point_normal(jnp.asarray(uv, jnp.float32),
                                          torus)
    elif mode != "world":
        raise ValueError(f"unknown mode {mode!r}")
    return rasterize_points(positions, colors, valid, camera,
                            background=background, point_size=point_size)
