"""Dense pure-JAX reference renderer (ground truth for everything else).

Evaluates EVERY Gaussian against EVERY ray — O(R*N) — with exact per-ray
depth sorting. This is the oracle the tiled/Pallas/distributed paths are
`allclose`-tested against (the role the Vulkan renderer's visual output plays
for the reference, SURVEY.md §4), and it is differentiable end-to-end via the
analytic compositing VJP.

Scalability note: use only for tests and small scenes; the production paths
are render/tiled.py (binned primary rays) and the Pallas kernels.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, Rays, RenderSettings
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.composite import composite_weights
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize


def dense_topk(scene: GaussianScene, rays: Rays, settings: RenderSettings,
               sort_depths=None):
    """Top-K nearest contributing Gaussians per ray, sorted front-to-back.

    Args:
      sort_depths: optional (N,) per-Gaussian depths to order by instead of
        the exact per-ray peak t — pass view-space mean depths to reproduce
        the tiled/3DGS ordering approximation for apples-to-apples tests.

    Returns:
      idx:   (R, K) int32 Gaussian indices (arbitrary where invalid).
      t:     (R, K) peak depths, in compositing order.
      alpha: (R, K) contribution alphas (0 where invalid).
    """
    m = gops.canonical_transforms(scene.log_scales, scene.quats)  # (N,3,3)
    o = rays.origins[:, None, :]      # (R,1,3)
    d = rays.directions[:, None, :]
    t_peak, gval = gops.peak_response(
        o, d, scene.means[None], m[None], settings.t_min, settings.t_max
    )  # (R, N)
    alpha = gops.alpha_from_response(
        scene.opacities[None], gval,
        settings.alpha_min, settings.alpha_max, settings.sigma_cut,
    )
    order_key = t_peak if sort_depths is None else jnp.broadcast_to(
        sort_depths[None, :], t_peak.shape)
    key = jnp.where(alpha > 0.0, order_key, jnp.inf)
    k = min(settings.max_contribs, scene.num_gaussians)
    neg_key, idx = jax.lax.top_k(-key, k)     # ascending order key
    valid = jnp.isfinite(-neg_key)
    t_sel = jnp.take_along_axis(t_peak, idx, axis=1)
    alpha_sel = jnp.take_along_axis(alpha, idx, axis=1)
    alpha_sel = jnp.where(valid, alpha_sel, 0.0)
    t_sel = jnp.where(valid, t_sel, settings.t_max)
    return idx, t_sel, alpha_sel


def _gather_features(scene: GaussianScene, rays: Rays, idx, t, settings):
    """Per-contribution shading features at the peak points.

    Returns dict of (R, K, ...) arrays: color (SH-evaluated base color),
    emission, normal (viewer-facing), metallic, roughness.
    """
    d = rays.directions[:, None, :]                       # (R,1,3)
    x = rays.origins[:, None, :] + t[..., None] * d       # (R,K,3)
    means = scene.means[idx]                              # (R,K,3)
    m = gops.canonical_transforms(scene.log_scales[idx], scene.quats[idx])
    degree = settings.sh_degree
    color = sh_mod.eval_sh(scene.sh_coeffs[idx], jnp.broadcast_to(d, x.shape),
                           degree)
    normal = gops.surfel_normal(scene.log_scales[idx], scene.quats[idx],
                                view_dir=d)
    return dict(
        color=color,
        emission=scene.emission[idx],
        normal=normal,
        metallic=scene.metallic[idx],
        roughness=scene.roughness[idx],
        clearcoat=scene.clearcoat[idx],
        cc_roughness=scene.clearcoat_roughness[idx],
        transmission=scene.transmission[idx],
        position=x,
    )


def trace_dense(scene: GaussianScene, rays: Rays,
                settings: RenderSettings, sort_depths=None,
                active=None) -> Dict[str, Any]:
    """Trace rays against the whole scene; composite a surface interaction.

    The composited aggregate plays the role of the reference's closest-hit
    surface (closesthit.rchit main): expected position/normal/material along
    the ray, plus accumulated opacity (the 'did we hit' signal,
    rt_datacollect hit_flag analog).

    Returns a dict with (R, ...) arrays:
      radiance_emitted, albedo, normal, position, depth, metallic, roughness,
      alpha_acc, trans, hit (bool).
    """
    idx, t, alpha = dense_topk(scene, rays, settings, sort_depths)
    if active is not None:
        alpha = jnp.where(active[:, None], alpha, 0.0)
    feats = _gather_features(scene, rays, idx, t, settings)
    weights, trans = composite_weights(alpha)             # (R,K), (R,)
    alpha_acc = 1.0 - trans

    def wsum(f):
        return jnp.einsum("rk,rk...->r...", weights, f)

    denom = jnp.maximum(alpha_acc, 1e-8)[..., None]
    albedo = wsum(feats["color"])
    emitted = wsum(feats["emission"])
    position = wsum(feats["position"]) / denom
    depth = wsum(t) / denom[..., 0]
    normal = wsum(feats["normal"])
    normal = safe_normalize(normal)
    metallic = wsum(feats["metallic"]) / denom[..., 0]
    roughness = wsum(feats["roughness"]) / denom[..., 0]
    return dict(
        radiance_emitted=emitted,
        albedo=albedo,
        normal=normal,
        position=position,
        depth=depth,
        metallic=metallic,
        roughness=roughness,
        clearcoat=wsum(feats["clearcoat"]) / denom[..., 0],
        cc_roughness=wsum(feats["cc_roughness"]) / denom[..., 0],
        transmission=wsum(feats["transmission"]) / denom[..., 0],
        alpha_acc=alpha_acc,
        trans=trans,
        hit=alpha_acc > settings.hit_opacity_threshold,
    )


def render_radiance_dense(scene: GaussianScene, rays: Rays,
                          settings: RenderSettings, sort_depths=None):
    """Radiance-field rendering (3DGS-style): composited SH color + background.

    This is the mode used by the golden/gradient tests (BASELINE config #1)
    and by primary-ray dataset rendering when path tracing is disabled.
    Returns (R, 3) colors. ``sort_depths`` as in :func:`dense_topk`.
    """
    idx, t, alpha = dense_topk(scene, rays, settings, sort_depths)
    d = rays.directions[:, None, :]
    color = sh_mod.eval_sh(
        scene.sh_coeffs[idx],
        jnp.broadcast_to(d, (idx.shape[0], idx.shape[1], 3)),
        settings.sh_degree,
    ) + scene.emission[idx]
    weights, trans = composite_weights(alpha)
    bg = jnp.asarray(settings.background, jnp.float32)
    return jnp.einsum("rk,rkc->rc", weights, color) + trans[:, None] * bg


def visibility_dense(scene: GaussianScene, origins, directions, t_end,
                     settings: RenderSettings):
    """Transmittance from origins along directions up to t_end (soft shadows).

    Differentiable analog of traceShadow (closesthit.rchit:113-126): instead
    of a binary any-hit, returns prod(1 - alpha_i) over all Gaussians whose
    response intersects the segment.
    """
    m = gops.canonical_transforms(scene.log_scales, scene.quats)
    alpha = gops.segment_transmittance_alpha(
        origins[:, None, :], directions[:, None, :],
        scene.means[None], m[None], scene.opacities[None],
        settings.t_min, t_end[:, None],
        settings.alpha_min, settings.alpha_max,
    )
    return jnp.prod(1.0 - alpha, axis=-1)
