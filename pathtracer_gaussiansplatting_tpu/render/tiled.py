"""Tile-binned primary-ray renderer (the scalable forward path).

The reference launches one GPU thread per pixel and lets RT cores walk a BVH
(engine.cpp:1971-1976). Here each 16x16 screen tile is one unit of work over
its K front-to-back Gaussians (ops/binning.py): responses are computed with
the exact ray-Gaussian math of the dense path, and composited in mean-depth
order — the same ordering approximation every 3DGS rasterizer makes; the
dense renderer (exact per-ray sort) is the accuracy oracle.

TPU mapping:
  * per-tile math is (P pixels x K Gaussians) batched VPU work, and the final
    feature compositing is a (P,K)x(K,F) matmul -> MXU.
  * tiles are processed in chunks with lax.map to bound HBM working-set;
    the Pallas kernel (kernels/tile_composite.py) fuses the whole per-tile
    pipeline into VMEM.
  * SH color is evaluated per Gaussian along the camera->mean direction
    (3DGS practice) rather than per pixel; with sh_degree 0 the two paths
    are identical.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.camera import Camera, generate_rays
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.binning import (
    BinningConfig, bin_gaussians, num_tiles, project_gaussians,
)
from pathtracer_gaussiansplatting_tpu.ops.composite import composite_weights
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize


def _packet_features(scene: GaussianScene, cam_pos, settings: RenderSettings):
    """Per-Gaussian feature rows composited by the tile kernel.

    Layout (F = 14): rgb(3) emission(3) metallic(1) roughness(1) normal(3)
    clearcoat(1) clearcoat_roughness(1) transmission(1).
    Color is SH evaluated along camera->mean (view-dependent, per Gaussian).
    Normal is the Gaussian's shortest principal axis, faced toward the camera
    (the surfel normal; cheap and stable, unlike the peak-point gradient
    which degenerates for rays through the center).
    """
    dirs = scene.means - cam_pos[None]
    dirs = safe_normalize(dirs)
    color = sh_mod.eval_sh(scene.sh_coeffs, dirs, settings.sh_degree)
    normal = gops.surfel_normal(scene.log_scales, scene.quats, view_dir=dirs)
    return jnp.concatenate([
        color, scene.emission, scene.metallic[:, None],
        scene.roughness[:, None], normal, scene.clearcoat[:, None],
        scene.clearcoat_roughness[:, None], scene.transmission[:, None],
    ], axis=-1)


def tile_composite_reference(origin, pixel_dirs, means, m_mats, opacities,
                             feats, mask, settings: RenderSettings):
    """Composite one tile: the semantic spec for the Pallas kernel.

    Args:
      origin:    (3,) shared ray origin (pinhole camera).
      pixel_dirs:(P, 3) unit ray directions for the tile's pixels.
      means:     (K, 3), m_mats: (K, 3, 3), opacities: (K,) gathered packet,
                 already sorted front-to-back (mean depth).
      feats:     (K, F) per-Gaussian features.
      mask:      (K,) bool valid entries.
    Returns:
      out:   (P, F) composited features.
      alpha_acc: (P,), depth: (P,).
    """
    og = jnp.einsum("kij,kj->ki", m_mats, origin[None] - means)  # (K,3)
    dg = jnp.einsum("kij,pj->pki", m_mats, pixel_dirs)          # (P,K,3)
    a = jnp.sum(dg * dg, -1)
    b = jnp.einsum("pki,ki->pk", dg, og)
    c = jnp.sum(og * og, -1)[None, :]
    a = jnp.maximum(a, 1e-12)
    t_peak = jnp.clip(-b / a, settings.t_min, settings.t_max)
    q = a * t_peak * t_peak + 2.0 * b * t_peak + c
    gval = jnp.exp(-0.5 * jnp.maximum(q, 0.0))
    alpha = gops.alpha_from_response(
        opacities[None, :], gval,
        settings.alpha_min, settings.alpha_max, settings.sigma_cut)
    alpha = jnp.where(mask[None, :], alpha, 0.0)
    weights, trans = composite_weights(alpha)                    # (P,K),(P,)
    out = weights @ feats                                        # MXU matmul
    alpha_acc = 1.0 - trans
    depth = jnp.sum(weights * t_peak, -1) / jnp.maximum(alpha_acc, 1e-8)
    return out, alpha_acc, depth


def _tile_dirs(camera: Camera, config: BinningConfig, jitter=None):
    """Per-tile pixel directions (T, P, 3) + an untile closure.

    ``jitter``: optional (H, W, 2) subpixel offsets (progressive AA,
    raygen_camera.rgen:25-29)."""
    ts = config.tile_size
    tiles_x, tiles_y = num_tiles(camera, config)
    pad_w, pad_h = tiles_x * ts, tiles_y * ts
    rays = generate_rays(camera, jitter=jitter)
    dirs = rays.directions.reshape(camera.height, camera.width, 3)
    dirs = jnp.pad(dirs, ((0, pad_h - camera.height),
                          (0, pad_w - camera.width), (0, 0)), mode="edge")
    dirs_t = dirs.reshape(tiles_y, ts, tiles_x, ts, 3)
    dirs_t = dirs_t.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tiles_x,
                                                     ts * ts, 3)

    def untile(x):
        ch = x.shape[-1]
        x = x.reshape(tiles_y, tiles_x, ts, ts, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(pad_h, pad_w, ch)
        return x[:camera.height, :camera.width]

    return dirs_t, untile


@functools.partial(jax.jit, static_argnames=("settings", "config"))
def prepare_tiles(scene: GaussianScene, camera: Camera,
                  settings: RenderSettings = RenderSettings(),
                  config: BinningConfig = BinningConfig()):
    """Per-(scene, pose) preprocessing: projection, binning, packet gathers.

    This is the expensive stage (sort + gathers). In the capture workload
    (engine.cpp:2684: accumulation_steps samples per pose) it runs ONCE per
    pose while :func:`render_prepared` runs per sample — the GPU analog is
    the static TLAS reused across accumulation frames (engine.cpp:1385).
    """
    from pathtracer_gaussiansplatting_tpu.kernels.tile_composite import (
        build_tile_packets,
    )

    if config.alpha_min != settings.alpha_min:
        # The binning footprint shrink assumes the kernel kills alpha below
        # the SAME cutoff; a mismatch silently desyncs footprints from the
        # compositor (splats vanish near tile edges) — fail loudly instead.
        raise ValueError(
            f"BinningConfig.alpha_min ({config.alpha_min}) must match "
            f"RenderSettings.alpha_min ({settings.alpha_min})")
    tiles_x, tiles_y = num_tiles(camera, config)
    proj = project_gaussians(scene, camera, config)
    tile_idx, tile_mask, _, stats = bin_gaussians(proj, tiles_x, tiles_y,
                                                  config)
    origin = camera.c2w[:3, 3]
    feats_all = _packet_features(scene, origin, settings)
    packets = build_tile_packets(scene, feats_all, origin, tile_idx,
                                 tile_mask)
    # Truncation observability (SURVEY's no-silent-caps rule): scalar
    # binning stats ride along as extra packet leaves; the kernels ignore
    # them, capture logs them (VERDICT r1 #8).
    for k, v in stats.items():
        packets["stat_" + k] = v
    return packets


ALL_OUTPUTS = ("color", "feats", "alpha_acc", "depth")


@functools.partial(
    jax.jit, static_argnames=("settings", "config", "interpret", "outputs"))
def render_prepared(packets, camera: Camera,
                    settings: RenderSettings = RenderSettings(),
                    config: BinningConfig = BinningConfig(),
                    interpret: bool = False, jitter=None,
                    outputs: tuple = ALL_OUTPUTS):
    """Composite one sample from prepared packets (optionally jittered rays).

    ``outputs`` (static) selects which channels to materialize — untiling a
    14-channel feature image costs several x the kernel itself, so callers
    that only need color (the accumulation loop) or only tile-major features
    (the path tracer, which re-flattens anyway) should ask for just those.
    Tile-major variants: "tile_feats" (T,P,F), "tile_alpha" (T,P),
    "tile_depth" (T,P) skip the untile transpose entirely.
    """
    from pathtracer_gaussiansplatting_tpu.kernels.tile_composite import (
        tile_composite,
    )

    dirs_t, untile = _tile_dirs(camera, config, jitter=jitter)
    out, alpha_acc, depth = tile_composite(packets, dirs_t, settings,
                                           interpret)
    res = {}
    if "tile_feats" in outputs:
        res["tile_feats"] = out
    if "tile_alpha" in outputs:
        res["tile_alpha"] = alpha_acc
    if "tile_depth" in outputs:
        res["tile_depth"] = depth
    if "tile_dirs" in outputs:
        res["tile_dirs"] = dirs_t
    need_alpha_img = ("alpha_acc" in outputs) or ("color" in outputs)
    alpha_img = (untile(alpha_acc[..., None])[..., 0]
                 if need_alpha_img else None)
    if "color" in outputs:
        bg = jnp.asarray(settings.background, jnp.float32)
        res["color"] = untile(out[..., :3]) \
            + (1.0 - alpha_img[..., None]) * bg
    if "feats" in outputs:
        res["feats"] = untile(out)
    if "alpha_acc" in outputs:
        res["alpha_acc"] = alpha_img
    if "depth" in outputs:
        res["depth"] = untile(depth[..., None])[..., 0]
    return res


@functools.partial(jax.jit, static_argnames=("config",))
def untile_image(x, camera: Camera, config: BinningConfig):
    """(T, P, C) tile-major -> (H, W, C) row-major image."""
    _, untile = _tile_dirs(camera, config)
    return untile(x)


def render_tiled_pallas(scene: GaussianScene, camera: Camera,
                        settings: RenderSettings = RenderSettings(),
                        config: BinningConfig = BinningConfig(),
                        interpret: bool = False):
    """render_tiled semantics through the fused Pallas kernel
    (kernels/tile_composite.py). Same outputs as :func:`render_tiled`."""
    packets = prepare_tiles(scene, camera, settings, config)
    return render_prepared(packets, camera, settings, config, interpret)


@functools.partial(
    jax.jit, static_argnames=("settings", "config", "chunk"))
def render_tiled(scene: GaussianScene, camera: Camera,
                 settings: RenderSettings = RenderSettings(),
                 config: BinningConfig = BinningConfig(),
                 chunk: int = 64):
    """Render primary rays through tile binning.

    Returns dict of full-image arrays (H, W, ...): color (with background),
    feats (F channels), alpha_acc, depth.
    """
    ts = config.tile_size
    tiles_x, tiles_y = num_tiles(camera, config)
    pad_w, pad_h = tiles_x * ts, tiles_y * ts

    proj = project_gaussians(scene, camera, config)
    tile_idx, tile_mask, _, _stats = bin_gaussians(proj, tiles_x, tiles_y,
                                                   config)

    pad_cam = Camera(c2w=camera.c2w, fov_y_deg=camera.fov_y_deg,
                     width=camera.width, height=camera.height)
    rays = generate_rays(pad_cam)
    dirs = rays.directions.reshape(camera.height, camera.width, 3)
    dirs = jnp.pad(dirs, ((0, pad_h - camera.height),
                          (0, pad_w - camera.width), (0, 0)),
                   mode="edge")
    # tile-major layout: (T, P, 3)
    dirs_t = dirs.reshape(tiles_y, ts, tiles_x, ts, 3)
    dirs_t = dirs_t.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tiles_x,
                                                     ts * ts, 3)

    origin = camera.c2w[:3, 3]
    m_all = gops.canonical_transforms(scene.log_scales, scene.quats)
    feats_all = _packet_features(scene, origin, settings)
    opac_all = scene.opacities

    def one_tile(args):
        idx, mask, pd = args
        return tile_composite_reference(
            origin, pd, scene.means[idx], m_all[idx], opac_all[idx],
            feats_all[idx], mask, settings)

    t_total = tiles_y * tiles_x
    # Chunked map over tiles bounds the gathered packet working set.
    n_chunks = -(-t_total // chunk)
    pad_t = n_chunks * chunk - t_total
    idx_p = jnp.pad(tile_idx, ((0, pad_t), (0, 0)))
    mask_p = jnp.pad(tile_mask, ((0, pad_t), (0, 0)))
    dirs_p = jnp.pad(dirs_t, ((0, pad_t), (0, 0), (0, 0)), mode="edge")

    def chunk_fn(args):
        return jax.vmap(one_tile)((args[0], args[1], args[2]))

    out, alpha_acc, depth = jax.lax.map(
        chunk_fn,
        (idx_p.reshape(n_chunks, chunk, -1),
         mask_p.reshape(n_chunks, chunk, -1),
         dirs_p.reshape(n_chunks, chunk, ts * ts, 3)),
    )
    f = out.shape[-1]
    out = out.reshape(t_total + pad_t, ts * ts, f)[:t_total]
    alpha_acc = alpha_acc.reshape(-1, ts * ts)[:t_total]
    depth = depth.reshape(-1, ts * ts)[:t_total]

    def untile(x, ch):
        x = x.reshape(tiles_y, tiles_x, ts, ts, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(pad_h, pad_w, ch)
        return x[:camera.height, :camera.width]

    out_img = untile(out, f)
    alpha_img = untile(alpha_acc[..., None], 1)[..., 0]
    depth_img = untile(depth[..., None], 1)[..., 0]
    bg = jnp.asarray(settings.background, jnp.float32)
    color = out_img[..., :3] + (1.0 - alpha_img[..., None]) * bg
    return dict(color=color, feats=out_img, alpha_acc=alpha_img,
                depth=depth_img)
