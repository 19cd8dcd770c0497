"""Sharded renderers: ray-parallel (DP) and Gaussian-sharded ring streaming.

Two production layouts (SURVEY.md §2.3 mapping):

  * **Ray sharding** (DP): rays split across the 'rays' mesh axis, scene
    replicated. Pure GSPMD: device_put with NamedShardings and jit — XLA
    partitions the dense/tiled renderer with zero code changes.

  * **Gaussian-sharded ring** ("TP/context-parallel" analog): the scene is
    sharded across the 'gauss' axis; each device streams every scene block
    through a `ppermute` ring (the path-tracing analog of ring attention:
    block = KV chunk, per-ray top-K candidate list = running softmax state).
    Each step merges the visiting block's contributions into the ray's
    top-K nearest candidate set — a streaming top-K, which is associative
    and order-independent, so the final composite equals the replicated
    renderer's. Communication rides the ICI ring and overlaps with the
    block evaluation.

Both paths are differentiable; the ring's backward re-streams blocks (the
transpose of ppermute is the reverse ppermute) and grads of gauss-sharded
params psum over the rays axis automatically via shard_map transposition.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, Rays, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.composite import composite_weights
from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
    GAUSS_AXIS, RAY_AXIS, gauss_sharding, ray_sharding, replicate_scene,
    shard_rays,
)
from pathtracer_gaussiansplatting_tpu.render.reference import render_radiance_dense


def render_dense_ray_sharded(scene: GaussianScene, rays: Rays,
                             settings: RenderSettings, mesh):
    """DP rendering: shard rays, replicate the scene, jit — GSPMD does the rest."""
    scene = replicate_scene(scene, mesh)
    rays = shard_rays(rays, mesh)
    fn = jax.jit(functools.partial(render_radiance_dense, settings=settings),
                 out_shardings=ray_sharding(mesh))
    return fn(scene, rays)


def _block_candidates(scene_block: GaussianScene, origins, dirs, settings):
    """Per-ray contributions of one scene block: (t, alpha, rgb) each (R, Nb)."""
    m = gops.canonical_transforms(scene_block.log_scales, scene_block.quats)
    o = origins[:, None, :]
    d = dirs[:, None, :]
    t_peak, gval = gops.peak_response(o, d, scene_block.means[None], m[None],
                                      settings.t_min, settings.t_max)
    alpha = gops.alpha_from_response(
        scene_block.opacities[None], gval,
        settings.alpha_min, settings.alpha_max, settings.sigma_cut)
    color = sh_mod.eval_sh(
        scene_block.sh_coeffs[None], d, settings.sh_degree
    ) + scene_block.emission[None]                     # (R, Nb, 3)
    return t_peak, alpha, color


def _merge_topk(state, cand, k):
    """Merge candidate contributions into the running per-ray top-K by depth.

    state/cand: (t, alpha, rgb) with K resp. Nb entries per ray. Invalid
    entries carry alpha=0 and t=+inf.
    """
    t = jnp.concatenate([state[0], cand[0]], axis=1)
    alpha = jnp.concatenate([state[1], cand[1]], axis=1)
    rgb = jnp.concatenate([state[2], cand[2]], axis=1)
    key = jnp.where(alpha > 0.0, t, jnp.inf)
    neg_key, idx = jax.lax.top_k(-key, k)              # K smallest depths
    t_m = jnp.take_along_axis(t, idx, axis=1)
    a_m = jnp.take_along_axis(alpha, idx, axis=1)
    a_m = jnp.where(jnp.isfinite(-neg_key), a_m, 0.0)
    c_m = jnp.take_along_axis(rgb, idx[..., None], axis=1)
    return (t_m, a_m, c_m)


def ring_topk_radiance(scene_sharded: GaussianScene, rays: Rays,
                       settings: RenderSettings, mesh):
    """Render radiance with the scene sharded over the 'gauss' mesh axis.

    ``scene_sharded`` must be padded to a multiple of the gauss axis size
    (parallel.mesh.pad_to_multiple) and device_put with gauss_sharding.
    Returns (R, 3) radiance sharded over the 'rays' axis.
    """
    n_gauss_shards = mesh.shape[GAUSS_AXIS]
    k = settings.max_contribs

    def kernel(scene_block, origins, dirs):
        r = origins.shape[0]
        init = (jnp.full((r, k), settings.t_max),
                jnp.zeros((r, k)),
                jnp.zeros((r, k, 3)))

        def step(i, carry):
            state, block = carry
            cand = _block_candidates(block, origins, dirs, settings)
            state = _merge_topk(state, cand, k)
            # Rotate blocks around the gauss ring (no-op transfer if S == 1).
            if n_gauss_shards > 1:
                perm = [(j, (j + 1) % n_gauss_shards)
                        for j in range(n_gauss_shards)]
                block = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, GAUSS_AXIS, perm), block)
            return state, block

        state, _ = jax.lax.fori_loop(
            0, n_gauss_shards, step, (init, scene_block))
        t_m, a_m, c_m = state
        weights, trans = composite_weights(a_m)
        bg = jnp.asarray(settings.background, jnp.float32)
        return jnp.einsum("rk,rkc->rc", weights, c_m) + trans[:, None] * bg

    scene_specs = jax.tree.map(lambda _: P(GAUSS_AXIS), scene_sharded)
    out = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(scene_specs, P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    ))(scene_sharded, rays.origins, rays.directions)
    return out
