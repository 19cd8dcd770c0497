"""Multi-bounce path tracer over Gaussian scenes (the hot loop).

Behavioral port of the reference's per-pixel bounce loop
(raygen_camera.rgen:38-78) + lighting kernel (closesthit.rchit main), built on
the aggregate-surfel interaction returned by the trace function:

  * Each trace composites the ray's Gaussians into ONE aggregate interaction
    (expected position/normal/material, accumulated opacity A, transmittance
    T = 1-A). The escaping fraction T picks up the sky immediately
    (miss.rmiss: sky = ambient.rgb * 2); the interacting fraction A continues
    the path. This "splitting" estimator is branch-free and differentiable —
    the TPU answer to per-ray closest-hit recursion.
  * NEE strategy mix: with prob p_emissive sample the emissive-Gaussian flux
    CDF, else the punctual CDF (closesthit.rchit:475-494), each weighted by
    1/p_strategy; MIS power-2 against the BSDF mixture pdf in both directions
    (emitter hit via BSDF: closesthit.rchit:455-465; NEE side: :305).
  * Russian roulette after rr_start_depth with p = clamp(max throughput,
    rr_min, rr_max) (raygen_camera.rgen:73-77); accumulated radiance clamped
    at firefly_clamp (=5.0) like raygen_camera.rgen:54.
  * Everything is masked full-width math — no warp compaction exists on TPU,
    so dead lanes just multiply by zero (SURVEY.md §7 'multi-bounce
    divergence').

The loop is a static Python unroll over settings.max_depth (typically 2-8),
entirely inside one jit.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core import rng as rng_mod
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, PunctualLights, Rays, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops import bsdf as bsdf_mod
from pathtracer_gaussiansplatting_tpu.render import lights as lights_mod
from pathtracer_gaussiansplatting_tpu.render import reference as ref
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_norm



def _accepts_active(fn) -> bool:
    """True if ``fn`` takes an ``active=`` keyword. Signature inspection
    (unwrapping jax.tree_util.Partial / functools.partial layers) — NOT
    try/except TypeError around the traced call, which would swallow a
    genuine TypeError raised inside the backend and silently re-trace it
    without the mask (ADVICE r3)."""
    import inspect

    seen = 0
    while hasattr(fn, "func") and seen < 8:   # Partial / partial layers
        if "active" in (getattr(fn, "keywords", None) or {}):
            return True
        fn = fn.func
        seen += 1
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    return "active" in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())


def _call_trace(trace_fn, scene, rays, settings, active):
    """Pass the active-ray mask to backends that accept it (the grid
    marcher pre-kills masked lanes and compacts them away)."""
    if _accepts_active(trace_fn):
        return trace_fn(scene, rays, settings, active=active)
    return trace_fn(scene, rays, settings)


def _call_vis(visibility_fn, origins, dirs, t_end, active,
              want_frozen: bool = False):
    """Returns (vis, frozen_count) — frozen_count is an int32 scalar, 0
    when the backend cannot report mid-march freezing."""
    kw = {}
    if _accepts_active(visibility_fn):
        kw["active"] = active
    if want_frozen and _accepts_kw(visibility_fn, "return_frozen"):
        out = visibility_fn(origins, dirs, t_end, return_frozen=True, **kw)
        return out[0], out[1]
    return visibility_fn(origins, dirs, t_end, **kw), jnp.int32(0)


def _accepts_kw(fn, name: str) -> bool:
    import inspect

    seen = 0
    while hasattr(fn, "func") and seen < 8:
        if name in (getattr(fn, "keywords", None) or {}):
            return True
        fn = fn.func
        seen += 1
    try:
        params = inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False
    return name in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())

def _nee(key, d, scene, tables, punctual, inter, view, settings,
         visibility_fn, use_nee=None, alive=None, want_frozen=False):
    """One next-event-estimation sample per ray. Returns ((R, 3) radiance,
    frozen int32: rays the shadow marches froze mid-march).

    ``use_nee`` (R,) bool gates the emissive-light strategy per ray —
    the reference skips NEE on glass / mirror-smooth hits
    (closesthit.rchit:449: use_nee = transmission==0 && roughness>0.001);
    punctual lights are still sampled but attenuated by (1 - transmission).
    """
    r = view.shape[0]
    pos = inter["position"]
    n = inter["normal"]
    alpha = jnp.maximum(inter["alpha_acc"], 1e-8)
    albedo = inter["albedo"] / alpha[:, None]
    metallic = inter["metallic"]
    rough = jnp.maximum(inter["roughness"], 1e-3)
    ambient_w = settings.ambient[3]

    u_strat = rng_mod.ray_uniform(key, r, 10)[:, 0]
    u_sel = rng_mod.ray_uniform(key, r, 7)[:, 0]
    u_disk = rng_mod.ray_uniform(key, r, 8, 2)
    take_emissive = u_strat < tables.p_emissive

    contrib = jnp.zeros((r, 3))

    # --- Emissive-Gaussian NEE (closesthit.rchit sampleLights) ---
    em = lights_mod.sample_emissive(u_sel, u_disk, scene, tables)
    to_l = em["position"] - pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-4)
    dist = jnp.sqrt(dist_sq)
    l_dir = to_l / dist[:, None]
    n_dot_l = jnp.sum(n * l_dir, -1)
    cos_light = jnp.abs(jnp.sum(-l_dir * em["normal"], -1))
    pdf_nee = lights_mod.pdf_nee_solid_angle(
        em["strength"], tables.emissive_flux, dist_sq, cos_light)
    pdf_b = bsdf_mod.mixture_pdf(n, view, l_dir, metallic, rough)
    mis = lights_mod.power2_mis(pdf_nee, pdf_b)
    brdf = bsdf_mod.eval_bsdf(n, view, l_dir, albedo, metallic, rough)
    eps = settings.shadow_eps
    ok = (n_dot_l > 1e-3) & (cos_light > 1e-3) & (pdf_nee > 1e-10)
    active_e = ok & take_emissive & (tables.emissive_flux > 0)
    if alive is not None:
        active_e = active_e & alive
    if use_nee is not None:
        active_e = active_e & use_nee
    vis, frozen = _call_vis(visibility_fn, pos + n * eps, l_dir,
                            dist - 2 * eps, active_e,
                            want_frozen=want_frozen)
    e_contrib = brdf * em["emission"] / jnp.maximum(pdf_nee, 1e-10)[:, None]
    e_contrib = e_contrib * (mis * vis)[:, None] * ambient_w
    e_contrib = jnp.where(ok[:, None], e_contrib, 0.0)
    e_contrib = e_contrib / jnp.maximum(tables.p_emissive, 1e-3)
    has_e = tables.emissive_flux > 0
    if use_nee is not None:
        e_contrib = jnp.where(use_nee[:, None], e_contrib, 0.0)
    contrib += jnp.where(take_emissive[:, None] & has_e, e_contrib, 0.0)

    # --- Punctual NEE (closesthit.rchit samplePunctualLights) ---
    if punctual is not None and punctual.num_lights > 0:
        pl = lights_mod.sample_punctual(u_sel, punctual, tables, pos)
        n_dot_lp = jnp.sum(n * pl["direction"], -1)
        brdf_p = bsdf_mod.eval_bsdf(n, view, pl["direction"], albedo,
                                    metallic, rough)
        active_p = (n_dot_lp > 1e-3) & ~take_emissive
        if alive is not None:
            active_p = active_p & alive
        vis_p, frozen_p = _call_vis(visibility_fn, pos + n * eps,
                                    pl["direction"], pl["dist"] - 2 * eps,
                                    active_p, want_frozen=want_frozen)
        frozen = frozen + frozen_p
        p_contrib = brdf_p * pl["radiance"] * (vis_p * pl["inv_prob"])[:, None]
        p_contrib = p_contrib * jnp.clip(
            1.0 - inter["transmission"], 0.0, 1.0)[:, None]
        p_contrib = jnp.where((n_dot_lp > 1e-3)[:, None], p_contrib, 0.0)
        p_punct = jnp.maximum(1.0 - tables.p_emissive, 1e-3)
        p_contrib = p_contrib / jnp.where(has_e, p_punct, 1.0)
        contrib += jnp.where(take_emissive[:, None], 0.0, p_contrib)
    return contrib, frozen


@partial(jax.jit, static_argnames=("settings", "trace_fn", "visibility_fn",
                                   "return_aux"))
def pathtrace(scene: GaussianScene, rays: Rays,
              settings: RenderSettings, key,
              tables: Optional[lights_mod.LightTables] = None,
              punctual: Optional[PunctualLights] = None,
              trace_fn: Optional[Callable] = None,
              visibility_fn: Optional[Callable] = None,
              primary_interaction=None, return_aux: bool = False):
    """Trace one sample-per-pixel of full path-traced radiance.

    Args:
      key: per-frame PRNG key (use rng.frame_key(base, frame)).
      trace_fn(scene, rays, settings) -> interaction dict (default dense).
      visibility_fn(origins, dirs, t_end) -> (R,) transmittance
        (default dense soft shadows).
      primary_interaction: optional precomputed depth-0 interaction (e.g.
        from the fused tile pipeline, see pathtrace_camera) — the camera
        trace is then skipped and bounces use trace_fn.
      return_aux: also return dict(frozen_alive=int32) summing the
        marcher's mid-march frozen-ray counts over every bounce trace and
        shadow march this sample (the no-silent-caps rule of
        grid_trace._march applied to production renders; a backend without
        the counter contributes 0).

    Returns (R, 3) linear radiance (with aux dict when ``return_aux``).
    """
    if trace_fn is None:
        trace_fn = ref.trace_dense
    if visibility_fn is None:
        visibility_fn = lambda o, d, t: ref.visibility_dense(
            scene, o, d, t, settings)
    if tables is None:
        tables = lights_mod.build_light_tables(scene, punctual)

    r = rays.num_rays
    sky = jnp.asarray(settings.ambient[:3], jnp.float32) * 2.0
    origins = rays.origins
    dirs = rays.directions
    throughput = jnp.ones((r, 3))
    radiance = jnp.zeros((r, 3))
    alive = jnp.ones((r,), bool)
    last_pdf = jnp.zeros((r,))
    glass_first = jnp.zeros((r,), bool)
    frozen_total = jnp.int32(0)

    for d in range(settings.max_depth):
        dkey = jax.random.fold_in(key, d)
        if d == 0 and primary_interaction is not None:
            inter = primary_interaction
        else:
            inter = _call_trace(trace_fn, scene, Rays(origins, dirs),
                                settings, None if d == 0 else alive)
        alpha = inter["alpha_acc"]
        trans = inter["trans"]
        if return_aux and "frozen_alive" in inter:
            frozen_total = frozen_total + inter["frozen_alive"]

        # Escaping fraction sees the sky (miss.rmiss: ambient * 2).
        radiance += jnp.where(alive[:, None],
                              throughput * trans[:, None] * sky, 0.0)

        # Emitted radiance with MIS against the previous BSDF pdf
        # (closesthit.rchit:451-466). Depth 0 / pure-BSDF hits add fully.
        # NEE applicability at this hit (closesthit.rchit:449): glass and
        # mirror-smooth surfaces never get light samples, so an emitter seen
        # through/after them adds fully (no MIS down-weight).
        use_nee_hit = (inter["transmission"] < 1e-3) \
            & (inter["roughness"] > 1e-3)
        if d == 0:
            # hit_flag = 2.0 GLASS analog (closesthit.rchit:504) drives the
            # adaptive depth cap (raygen_camera.rgen:59-64).
            glass_first = inter["transmission"] > 0.05

        emitted = inter["radiance_emitted"]
        strength = safe_norm(emitted, axis=-1) / jnp.maximum(alpha, 1e-6)
        cos_l = jnp.abs(jnp.sum(inter["normal"] * dirs, -1))
        dist_sq = inter["depth"] ** 2
        pdf_nee_hit = lights_mod.pdf_nee_solid_angle(
            strength, tables.emissive_flux, dist_sq, cos_l)
        pdf_nee_hit = pdf_nee_hit * jnp.where(
            tables.punctual_flux > 0, tables.p_emissive, 1.0)
        mis_e = jnp.where(
            (last_pdf > 0) & use_nee_hit & jnp.asarray(settings.nee),
            lights_mod.power2_mis(last_pdf, pdf_nee_hit), 1.0)
        radiance += jnp.where(alive[:, None],
                              throughput * emitted * mis_e[:, None], 0.0)

        # Direct lighting at the aggregate surface.
        view = -dirs
        if settings.nee:
            nee_li, nee_frozen = _nee(dkey, d, scene, tables, punctual,
                                      inter, view, settings, visibility_fn,
                                      use_nee=use_nee_hit, alive=alive,
                                      want_frozen=return_aux)
            frozen_total = frozen_total + nee_frozen
            radiance += jnp.where(alive[:, None],
                                  throughput * alpha[:, None] * nee_li, 0.0)

        radiance = jnp.minimum(radiance, settings.firefly_clamp)

        if d + 1 == settings.max_depth:
            break

        # Scatter: glass (Fresnel reflect/refract, closesthit.rchit:503-531)
        # vs opaque clearcoat-over-base (closesthit.rchit:540-620), selected
        # stochastically per ray — branch-free, all lobes evaluated.
        alpha_safe = jnp.maximum(alpha, 1e-8)
        albedo_hat = inter["albedo"] / alpha_safe[:, None]
        rough_hat = jnp.maximum(inter["roughness"], 1e-3)
        u_lobe = rng_mod.ray_uniform(dkey, r, 13)[:, 0]
        u_dir = rng_mod.ray_uniform(dkey, r, 14, 2)
        u_cc = rng_mod.ray_uniform(dkey, r, 12)[:, 0]
        u_glass = rng_mod.ray_uniform(dkey, r, 15)[:, 0]
        u_reflect = rng_mod.ray_uniform(dkey, r, 11)[:, 0]
        scat = bsdf_mod.sample_clearcoated(
            u_cc, u_lobe, u_dir, inter["normal"], view, albedo_hat,
            inter["metallic"], rough_hat, inter["clearcoat"],
            inter["cc_roughness"])
        glass = bsdf_mod.sample_glass(u_reflect, inter["normal"], view,
                                      albedo_hat, inter["metallic"],
                                      settings.glass_ior)
        # Detached-sampling selection: pick glass-vs-opaque with the detached
        # probability but reweight by the continuous transmission so its
        # pathwise gradient survives (forward value is unchanged: both
        # ratios are exactly 1).
        t_hat = jnp.clip(inter["transmission"], 0.0, 1.0)
        p_g = jax.lax.stop_gradient(t_hat)
        take_glass = u_glass < p_g
        tg = take_glass[:, None]
        direction = jnp.where(tg, glass["direction"], scat["direction"])
        w_glass = glass["weight"] * (t_hat / jnp.maximum(p_g, 1e-6))[:, None]
        w_base = scat["weight"] \
            * ((1.0 - t_hat) / jnp.maximum(1.0 - p_g, 1e-6))[:, None]
        weight = jnp.where(tg, w_glass, w_base)
        # Delta lobes carry no pdf (payload.last_bsdf_pdf = 0, rchit:530).
        last_pdf = jnp.where(take_glass, 0.0, scat["pdf"])
        valid = jnp.where(take_glass, True, scat["valid"])
        offset = jnp.where(take_glass, glass["offset_sign"], 1.0) \
            * settings.shadow_eps
        throughput = throughput * alpha[:, None] * weight
        origins = inter["position"] + inter["normal"] * offset[:, None]
        dirs = direction

        max_t = jnp.max(throughput, -1)
        alive = alive & valid & (alpha > 1e-4) \
            & (max_t > settings.min_throughput)
        if settings.opaque_depth and d + 1 >= settings.opaque_depth:
            # Opaque first hits stop at opaque_depth; glass paths keep going
            # to max_depth (raygen_camera.rgen:59-64 adaptive depth 12->4).
            alive = alive & glass_first

        # Russian roulette (raygen_camera.rgen:73-77).
        if d + 1 >= settings.rr_start_depth:
            p = jnp.clip(max_t, settings.rr_min, settings.rr_max)
            u_rr = rng_mod.ray_uniform(dkey, r, 20)[:, 0]
            survive = u_rr <= p
            throughput = jnp.where(survive[:, None], throughput / p[:, None],
                                   throughput)
            alive = alive & survive

        # Serialize bounce stages: the NEE visibility march and the next
        # bounce trace are otherwise independent subgraphs, and XLA
        # overlaps their multi-GB gather transients into an HBM OOM at
        # 1080p (each grid march bounds its own transients, but only
        # within the march).
        (radiance, throughput, origins, dirs, alive, last_pdf) = \
            jax.lax.optimization_barrier(
                (radiance, throughput, origins, dirs, alive, last_pdf))

    radiance = jnp.minimum(radiance, settings.firefly_clamp)
    if return_aux:
        return radiance, dict(frozen_alive=frozen_total)
    return radiance


def interaction_from_tiles(out, rays: Rays, settings: RenderSettings):
    """Convert render_prepared output into a trace_dense-style interaction.

    Tile feature channels (render/tiled._packet_features): rgb(3) emission(3)
    metallic(1) roughness(1) normal(3) clearcoat(1) cc_roughness(1)
    transmission(1), all alpha-weighted sums; intrinsic properties are
    re-normalized by accumulated alpha like trace_dense.
    """
    from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize

    h, w, f = out["feats"].shape
    feats = out["feats"].reshape(-1, f)
    alpha = out["alpha_acc"].reshape(-1)
    depth = out["depth"].reshape(-1)
    denom = jnp.maximum(alpha, 1e-8)
    normal = safe_normalize(feats[:, 8:11])
    position = rays.origins + depth[:, None] * rays.directions
    return dict(
        radiance_emitted=feats[:, 3:6],
        albedo=feats[:, 0:3],
        normal=normal,
        position=position,
        depth=depth,
        metallic=feats[:, 6] / denom,
        roughness=feats[:, 7] / denom,
        clearcoat=feats[:, 11] / denom,
        cc_roughness=feats[:, 12] / denom,
        transmission=feats[:, 13] / denom,
        alpha_acc=alpha,
        trans=1.0 - alpha,
        hit=alpha > settings.hit_opacity_threshold,
    )


def interaction_from_tile_arrays(out, origins, dirs, settings):
    """Build the primary interaction from tile-major kernel outputs.

    Skips the untile transpose altogether: the path tracer is order-agnostic,
    so bounces run in tile-major ray order and only the final radiance image
    is untiled (render/tiled.untile_image).
    """
    from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize

    feats = out["tile_feats"].reshape(-1, out["tile_feats"].shape[-1])
    alpha = out["tile_alpha"].reshape(-1)
    depth = out["tile_depth"].reshape(-1)
    denom = jnp.maximum(alpha, 1e-8)
    return dict(
        radiance_emitted=feats[:, 3:6],
        albedo=feats[:, 0:3],
        normal=safe_normalize(feats[:, 8:11]),
        position=origins + depth[:, None] * dirs,
        depth=depth,
        metallic=feats[:, 6] / denom,
        roughness=feats[:, 7] / denom,
        clearcoat=feats[:, 11] / denom,
        cc_roughness=feats[:, 12] / denom,
        transmission=feats[:, 13] / denom,
        alpha_acc=alpha,
        trans=1.0 - alpha,
        hit=alpha > settings.hit_opacity_threshold,
    )


def pathtrace_camera(scene: GaussianScene, camera, settings: RenderSettings,
                     key, packets=None, tables=None, punctual=None,
                     trace_fn=None, visibility_fn=None,
                     config=None, jitter=None, chunk=None,
                     return_aux: bool = False):
    """Production path tracing for a camera pose: fused tile pipeline for the
    primary hit (binning amortized via ``packets`` from prepare_tiles),
    grid/dense backend for bounces and shadows.

    The primary stage stays in tile-major order end-to-end (no 14-channel
    image transpose); only the final radiance is untiled back to row-major.
    The bounce continuation marches ALL pixels as one batch: the grid
    marcher bounds its own peak memory by phase-splitting internally
    (grid_trace._PHASE_MAX_RAYS) and compacts surviving rays globally.
    (A lax.map over fixed-size chunks — the round-2 structure —
    reproducibly crashed the v5e worker: scan-of-(while_loop + large
    gather) is the trigger, so ``chunk`` is accepted for API
    compatibility but ignored.) The whole function is jit-traceable, so
    callers can fori_loop it over spp. Returns (H*W, 3) radiance.
    """
    del chunk
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared, untile_image,
    )

    config = config or BinningConfig()
    if packets is None:
        packets = prepare_tiles(scene, camera, settings, config)
    out = render_prepared(
        packets, camera, settings, config, jitter=jitter,
        outputs=("tile_feats", "tile_alpha", "tile_depth", "tile_dirs"))
    t, p, _ = out["tile_dirs"].shape
    dirs = out["tile_dirs"].reshape(t * p, 3)
    origins = jnp.broadcast_to(camera.c2w[:3, 3][None], (t * p, 3))
    rays = Rays(origins, dirs)
    primary = interaction_from_tile_arrays(out, origins, dirs, settings)
    res = pathtrace(scene, rays, settings, key, tables=tables,
                    punctual=punctual, trace_fn=trace_fn,
                    visibility_fn=visibility_fn,
                    primary_interaction=primary, return_aux=return_aux)
    radiance, aux = res if return_aux else (res, None)
    img = untile_image(radiance.reshape(t, p, 3), camera, config)
    if return_aux:
        return img.reshape(-1, 3), aux
    return img.reshape(-1, 3)


@partial(jax.jit, static_argnames=("settings", "config", "outputs"))
def _primary_stage(scene, camera, settings, config, jitter=None,
                   outputs=("tile_feats", "tile_alpha", "tile_depth",
                            "tile_dirs"), packets=None):
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    if packets is None:
        packets = prepare_tiles(scene, camera, settings, config)
    out = render_prepared(packets, camera, settings, config, jitter=jitter,
                          outputs=outputs)
    t, p, _ = out["tile_dirs"].shape
    dirs = out["tile_dirs"].reshape(t * p, 3)
    origins = jnp.broadcast_to(camera.c2w[:3, 3][None], (t * p, 3))
    primary = interaction_from_tile_arrays(out, origins, dirs, settings)
    return origins, dirs, primary


@partial(jax.jit, static_argnames=("settings", "return_aux"))
def _chunk_pathtrace(scene, origins, dirs, tables, punctual, trace_fn,
                     visibility_fn, primary, key, settings,
                     return_aux):
    """Jit wrapper for one bounce-continuation chunk: the backend
    Partials ride as pytree ARGUMENTS (their accel tables would
    otherwise be baked into the HLO as constants via pathtrace's
    static trace_fn arg — the axon remote-compile service rejects
    such modules with HTTP 413; render/pipeline.py docstring)."""
    return pathtrace(scene, Rays(origins, dirs), settings, key,
                     tables=tables, punctual=punctual, trace_fn=trace_fn,
                     visibility_fn=visibility_fn,
                     primary_interaction=primary, return_aux=return_aux)


def pathtrace_camera_chunked(scene, camera, settings: RenderSettings, key,
                             n_chunks: int, packets=None, tables=None,
                             punctual=None, trace_fn=None,
                             visibility_fn=None, config=None, jitter=None,
                             return_aux: bool = False):
    """pathtrace_camera split into 1 + n_chunks separate device dispatches.

    For samples whose single-dispatch runtime would trip the worker's
    execution watchdog (~60 s on the v5e behind the axon tunnel — see
    DESIGN.md "dispatch watchdog"): depth-12 at 1080p is one such shape
    (raygen_camera.rgen:47-64 runs it per pixel on the GPU). The primary
    tile pass is one dispatch; the bounce continuation runs per ray chunk
    (tile-major contiguous slices), each its own dispatch. NOT jittable
    as a whole (that would defeat the purpose); numerics match
    pathtrace_camera exactly except the per-chunk RNG fold
    (jax.random.fold_in(key, chunk) — still deterministic).
    """
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import untile_image

    config = config or BinningConfig()
    origins, dirs, primary = _primary_stage(
        scene, camera, settings, config, jitter=jitter, packets=packets)
    r = origins.shape[0]
    psz = config.tile_size ** 2     # chunks stay tile-aligned
    chunk = -(-r // max(n_chunks, 1))
    chunk = -(-chunk // psz) * psz
    parts, frozen = [], jnp.int32(0)
    for ci, s in enumerate(range(0, r, chunk)):
        e = min(s + chunk, r)
        sl = lambda x, s=s, e=e: x[s:e]
        res = _chunk_pathtrace(scene, origins[s:e], dirs[s:e], tables,
                               punctual, trace_fn, visibility_fn,
                               jax.tree.map(sl, primary),
                               jax.random.fold_in(key, ci), settings,
                               return_aux)
        if return_aux:
            parts.append(res[0])
            frozen = frozen + res[1]["frozen_alive"]
        else:
            parts.append(res)
        parts[-1] = jax.block_until_ready(parts[-1])
    radiance = jnp.concatenate(parts, axis=0)
    img = untile_image(radiance.reshape(r // psz, psz, 3), camera, config)
    if return_aux:
        return img.reshape(-1, 3), dict(frozen_alive=frozen)
    return img.reshape(-1, 3)


def accumulate(prev, cur, frame):
    """Progressive accumulation: mix(prev, cur, 1/(frame+1))
    (raygen_camera.rgen:80-87). frame counts completed samples."""
    blend = 1.0 / (jnp.asarray(frame, jnp.float32) + 1.0)
    return prev + (cur - prev) * blend
