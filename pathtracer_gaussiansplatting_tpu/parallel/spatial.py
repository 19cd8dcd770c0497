"""Spatially-partitioned rendering: resident Gaussian slabs + a ray-carry ring.

BASELINE config #5 (SURVEY.md §7 step 6): at 2M+ Gaussians the scene should
be *partitioned* across devices, not replicated or streamed. Each device owns
one contiguous depth slab of space (its Gaussians never move — the big
tensors stay resident); per-ray carry state (transmittance, composited
features, the ray itself) rotates around a `lax.ppermute` ring instead. This
is the path-tracing analog of ring attention / context parallelism
(SURVEY.md §2.3): the "sequence" is the ray's front-to-back slab traversal,
and the carry is the running (T, C) composite.

Correctness notes:
  * The 'over' operator on (C, T) pairs — over(x, y) = (Cx + Tx*Cy, Tx*Ty) —
    is associative but NOT commutative, so ring rotation order matters. A ray
    chunk starting at slab c visits slabs c..S-1 (segment A) then wraps to
    0..c-1 (segment B); each segment folds internally in visit order, and
    the true front-to-back result for forward rays is B over A (slabs
    0..c-1 are nearer than c..S-1).
  * Rays whose direction opposes the slab axis see slabs back-to-front; each
    segment also keeps a reversed accumulator (folding 'new over acc'), and
    the per-ray direction sign selects which pair to merge. All branch-free.
  * Within a slab, contributions are composited in exact per-slab depth
    order (top-K by slab-projection depth). Gaussians are assigned to slabs
    by mean — the same mean-depth ordering approximation the tiled renderer
    makes (render/tiled.py).

Reference contrast: the reference has no distributed layer at all
(SURVEY.md §1: single GPU, hardware TLAS, engine.cpp:1385-1520); this module
is where the TPU build earns multi-host scale.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, Rays, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.composite import composite_weights
from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
    GAUSS_AXIS, RAY_AXIS, pad_to_multiple,
)


import dataclasses


@dataclasses.dataclass(frozen=True)
class SlabAccelMeta:
    """Static metadata shared by every slab accel (hashable; rides jit
    static args while the stacked tables ride as sharded arrays)."""

    dims: Tuple[int, int, int]
    jump_unit: float
    stats: tuple = ()

    @property
    def stats_dict(self) -> dict:
        return dict(self.stats)


def partition_slabs(scene: GaussianScene, n_slabs: int,
                    axis=(0.0, 0.0, 1.0)) -> Tuple[GaussianScene, np.ndarray]:
    """Sort Gaussians into ``n_slabs`` contiguous equal-count depth slabs.

    Returns (sorted+padded scene, axis as float32 (3,)). Shard the result
    over the 'gauss' mesh axis (parallel.mesh.shard_scene) so device d holds
    slab d. Padding Gaussians are fully transparent and land in the last
    slab (t = +inf).
    """
    axis = np.asarray(axis, np.float32)
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    t = np.asarray(scene.means) @ axis
    order = np.argsort(t, kind="stable")
    scene_sorted = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[order]),
                                scene)
    return pad_to_multiple(scene_sorted, n_slabs), axis


def _slab_composite(block: GaussianScene, origins, dirs, axis,
                    settings: RenderSettings):
    """Per-slab exact composite for a ray chunk: (feats (R,F), trans (R,)).

    Features: [rgb(3)] — SH color + emission (radiance-field channels, the
    same payload ring_topk_radiance carries). Contributions are ordered by
    slab-axis projection of the mean (consistent with the slab partition, so
    cross-slab order + in-slab order = one global order).
    """
    m = gops.canonical_transforms(block.log_scales, block.quats)
    o = origins[:, None, :]
    d = dirs[:, None, :]
    t_peak, gval = gops.peak_response(o, d, block.means[None], m[None],
                                      settings.t_min, settings.t_max)
    alpha = gops.alpha_from_response(
        block.opacities[None], gval,
        settings.alpha_min, settings.alpha_max, settings.sigma_cut)
    color = sh_mod.eval_sh(block.sh_coeffs[None], d, settings.sh_degree) \
        + block.emission[None]                                    # (R,Nb,3)
    # Order by mean projection onto the slab axis — matches the partition
    # key, so slab-by-slab composition equals one globally-ordered pass.
    proj = block.means @ axis                                     # (Nb,)
    fwd = jnp.sum(dirs * axis[None], -1) >= 0.0                   # (R,)
    order_key = jnp.where(fwd[:, None], proj[None, :], -proj[None, :])
    order_key = jnp.where(alpha > 0.0, order_key, jnp.inf)
    k = min(settings.max_contribs, block.num_gaussians)
    neg_key, idx = jax.lax.top_k(-order_key, k)
    valid = jnp.isfinite(-neg_key)
    alpha_sel = jnp.where(valid, jnp.take_along_axis(alpha, idx, 1), 0.0)
    color_sel = jnp.take_along_axis(color, idx[..., None], 1)
    weights, trans = composite_weights(alpha_sel)
    feats = jnp.einsum("rk,rkc->rc", weights, color_sel)
    return feats, trans, fwd


def _over(c_front, t_front, c_back, t_back):
    """'over' composition: front segment seen before back segment."""
    return c_front + t_front[:, None] * c_back, t_front * t_back


def build_slab_accels(scene_slabbed: GaussianScene, n_slabs: int,
                      max_per_cell: int = 32, dims=None,
                      radius_percentile: float = 99.0):
    """Per-slab grid acceleration, stacked for sharding (r5, VERDICT r4 #8).

    The r4 slab interaction was a DENSE (rays x slab) top-K composite —
    946 rays/s/chip at 2M Gaussians (SPATIAL_CHIP_r04.json), the analog
    of tracing without the reference's per-object BLAS
    (engine.cpp:534-655). This builds ONE v3 grid accel per slab
    (render/grid_trace.py) with a shared cell geometry (global bounds +
    dims, so the static marcher metadata is identical across devices)
    and stacks the tables along a leading slab axis: shard it
    P(GAUSS_AXIS) and each device marches only its resident slab.

    Returns dict pytree:
      btab (S, B, 4) i32, geom (S, Smax, 12*Kc) f32,
      packet (S, Smax, pkt*Kc) f32, lo/hi (S, 3) f32,
    plus static metadata under non-array keys consumed by
    trace_spatial/visibility_spatial.
    """
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt

    n = scene_slabbed.num_gaussians
    per = n // n_slabs
    means = np.asarray(scene_slabbed.means)
    opac = np.asarray(scene_slabbed.opacities)
    # Global bounds over REAL splats (padding gaussians are transparent).
    real = opac > 0
    exts = gt._aniso_extents(scene_slabbed, 3.0)
    lo_g = (means[real] - exts[real]).min(0)
    hi_g = (means[real] + exts[real]).max(0)
    if dims is None:
        dims, _, _, _, _, _ = gt.fit_grid(
            jax.tree.map(lambda x: x[real], scene_slabbed),
            radius_percentile=radius_percentile)
    accels = []
    for s in range(n_slabs):
        block = jax.tree.map(lambda x: x[s * per:(s + 1) * per],
                             scene_slabbed)
        accels.append(gt.build_grid_accel(
            block, dims=dims, max_per_cell=max_per_cell,
            radius_percentile=radius_percentile, bounds=(lo_g, hi_g)))
    s_max = max(a.geom.shape[0] for a in accels)

    def pad_rows(x):
        return np.pad(np.asarray(x), ((0, s_max - x.shape[0]), (0, 0)))

    stats = dict(
        dropped_frac=float(np.mean([a.stats_dict["dropped_frac"]
                                    for a in accels])),
        clamped_frac=float(np.mean([a.stats_dict["clamped_frac"]
                                    for a in accels])),
        max_per_cell=max_per_cell,
    )
    tables = dict(
        btab=jnp.asarray(np.stack([np.asarray(a.btab) for a in accels])),
        geom=jnp.asarray(np.stack([pad_rows(a.geom) for a in accels])),
        packet=jnp.asarray(np.stack([pad_rows(a.packet)
                                     for a in accels])),
        lo=jnp.asarray(np.stack([np.asarray(a.lo) for a in accels])),
        hi=jnp.asarray(np.stack([np.asarray(a.hi) for a in accels])),
    )
    meta = SlabAccelMeta(dims=tuple(int(d) for d in dims),
                         jump_unit=float(accels[0].jump_unit),
                         stats=tuple(sorted(stats.items())))
    return tables, meta


def _ring_composite(scene_slabbed: GaussianScene, origins, dirs, extra,
                    settings: RenderSettings, mesh, axis_v, slab_fn,
                    feat_dim: int):
    """Generic slab-carry ring: fold slab_fn's (feats, trans) around the ring.

    slab_fn(block, origins, dirs, extra) -> (feats (r, feat_dim), trans (r,)).
    ``extra`` is an optional per-ray payload pytree that rides the ring with
    the rays (e.g. shadow t_end). Returns (feats (R, feat_dim), trans (R,)),
    composited in true front-to-back slab order per ray direction.
    """
    s_ring = mesh.shape[GAUSS_AXIS]

    def kernel(block, origins, dirs, extra):
        r = origins.shape[0]
        my = jax.lax.axis_index(GAUSS_AXIS)
        chunk_id = my  # chunk c starts on device c
        # Segment accumulators: A = pre-wrap visits, B = post-wrap; _f folds
        # behind (acc over new), _b folds in front (new over acc).
        zero = jnp.zeros((r, feat_dim))
        one = jnp.ones((r,))
        acc = dict(cAf=zero, tAf=one, cAb=zero, tAb=one,
                   cBf=zero, tBf=one, cBb=zero, tBb=one)
        state = (origins, dirs, extra, chunk_id, acc)
        perm = [(i, (i + 1) % s_ring) for i in range(s_ring)]

        for step in range(s_ring):
            origins, dirs, extra, chunk_id, acc = state
            feats, trans = slab_fn(block, origins, dirs, extra)
            wrapped = step >= (s_ring - chunk_id)

            def fold(cf, tf, cb, tb, active):
                nf_c, nf_t = _over(cf, tf, feats, trans)     # acc over new
                nb_c, nb_t = _over(feats, trans, cb, tb)     # new over acc
                sel = jnp.where(active, 1.0, 0.0)
                return (cf + sel * (nf_c - cf), tf + sel * (nf_t - tf),
                        cb + sel * (nb_c - cb), tb + sel * (nb_t - tb))

            a_active = jnp.logical_not(wrapped)
            acc["cAf"], acc["tAf"], acc["cAb"], acc["tAb"] = fold(
                acc["cAf"], acc["tAf"], acc["cAb"], acc["tAb"], a_active)
            acc["cBf"], acc["tBf"], acc["cBb"], acc["tBb"] = fold(
                acc["cBf"], acc["tBf"], acc["cBb"], acc["tBb"], wrapped)
            state = jax.tree.map(
                lambda x: jax.lax.ppermute(x, GAUSS_AXIS, perm),
                (origins, dirs, extra, chunk_id, acc))

        origins, dirs, extra, chunk_id, acc = state
        # After S steps the chunk is home. True front-to-back order:
        #   forward rays: slabs 0..c-1 (B) then c..S-1 (A) -> B over A,
        #   reverse rays: slabs S-1..c (A, reversed) then c-1..0 (B, reversed)
        #                 -> A_b over B_b.
        fwd = jnp.sum(dirs * axis_v[None], -1) >= 0.0
        c_f, t_f = _over(acc["cBf"], acc["tBf"], acc["cAf"], acc["tAf"])
        c_b, t_b = _over(acc["cAb"], acc["tAb"], acc["cBb"], acc["tBb"])
        return (jnp.where(fwd[:, None], c_f, c_b),
                jnp.where(fwd, t_f, t_b))

    scene_specs = jax.tree.map(lambda _: P(GAUSS_AXIS), scene_slabbed)
    ray_spec = P((RAY_AXIS, GAUSS_AXIS))
    extra_specs = jax.tree.map(lambda _: ray_spec, extra)
    fn = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(scene_specs, ray_spec, ray_spec, extra_specs),
        out_specs=(ray_spec, ray_spec))
    return fn(scene_slabbed, origins, dirs, extra)


@functools.partial(jax.jit, static_argnames=("settings", "mesh"))
def render_spatial(scene_slabbed: GaussianScene, rays: Rays,
                   settings: RenderSettings, mesh, axis=(0.0, 0.0, 1.0)):
    """Radiance over spatially-partitioned Gaussians via the carry ring.

    Args:
      scene_slabbed: output of :func:`partition_slabs`, shard over 'gauss'.
      rays: ray batch; the leading axis is sharded over BOTH mesh axes
        (P((RAY_AXIS, GAUSS_AXIS))) — within each rays-shard, chunk c starts
        resident on gauss-device c. Ray count must divide evenly.
      mesh: (rays, gauss) mesh (parallel.mesh.make_mesh).

    Returns (R, 3) radiance (background composited), sharded like the input
    rays.
    """
    axis_v = jnp.asarray(axis, jnp.float32)
    axis_v = axis_v / jnp.maximum(jnp.linalg.norm(axis_v), 1e-12)

    def slab_fn(block, origins, dirs, extra):
        feats, trans, _ = _slab_composite(block, origins, dirs, axis_v,
                                          settings)
        return feats, trans

    color, trans = _ring_composite(scene_slabbed, rays.origins,
                                   rays.directions, (), settings, mesh,
                                   axis_v, slab_fn, 3)
    bg = jnp.asarray(settings.background, jnp.float32)
    return color + trans[:, None] * bg


def _slab_interaction_feats(block: GaussianScene, origins, dirs, axis,
                            settings: RenderSettings):
    """Per-slab composite of the FULL interaction feature stack.

    Layout (F = 15): albedo(3) emission(3) metallic(1) roughness(1)
    normal(3) clearcoat(1) cc_roughness(1) transmission(1) depth(1) —
    position is reconstructed from depth by the caller.
    """
    m = gops.canonical_transforms(block.log_scales, block.quats)
    o = origins[:, None, :]
    d = dirs[:, None, :]
    t_peak, gval = gops.peak_response(o, d, block.means[None], m[None],
                                      settings.t_min, settings.t_max)
    alpha = gops.alpha_from_response(
        block.opacities[None], gval,
        settings.alpha_min, settings.alpha_max, settings.sigma_cut)
    proj = block.means @ axis
    fwd = jnp.sum(dirs * axis[None], -1) >= 0.0
    order_key = jnp.where(fwd[:, None], proj[None, :], -proj[None, :])
    order_key = jnp.where(alpha > 0.0, order_key, jnp.inf)
    k = min(settings.max_contribs, block.num_gaussians)
    neg_key, idx = jax.lax.top_k(-order_key, k)                # (r, k)
    valid = jnp.isfinite(-neg_key)
    alpha_sel = jnp.where(valid, jnp.take_along_axis(alpha, idx, 1), 0.0)
    weights, trans = composite_weights(alpha_sel)
    d_rk = jnp.broadcast_to(dirs[:, None, :], idx.shape + (3,))
    color = sh_mod.eval_sh(block.sh_coeffs[idx], d_rk, settings.sh_degree)
    normal = gops.surfel_normal(block.log_scales[idx], block.quats[idx],
                                view_dir=d_rk)
    rows = jnp.concatenate([
        color,
        block.emission[idx],
        block.metallic[idx][..., None],
        block.roughness[idx][..., None],
        normal,
        block.clearcoat[idx][..., None],
        block.clearcoat_roughness[idx][..., None],
        block.transmission[idx][..., None],
        jnp.take_along_axis(t_peak, idx, 1)[..., None],
    ], axis=-1)                                               # (r, k, 15)
    feats = jnp.einsum("rk,rkf->rf", weights, rows)
    return feats, trans


def _grid_slab_trace_fn(meta: "SlabAccelMeta", settings: RenderSettings,
                        max_steps: int):
    """Per-slab interaction via the v3 grid marcher (VERDICT r4 #8): the
    slab analog of the reference's per-object BLAS (engine.cpp:534-655).
    Feature order matches _slab_interaction_feats; bounce color is the
    marcher's deg<=1 factored SH (render/grid_trace docstring)."""
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt

    order = ("col_r", "col_g", "col_b", "emi_r", "emi_g", "emi_b",
             "met", "rough", "nx", "ny", "nz", "cc", "ccr", "trn",
             "tsum")

    def slab_fn(tables, origins, dirs, extra):
        acc = gt.GridAccel(
            btab=tables["btab"][0], geom=tables["geom"][0],
            packet=tables["packet"][0], lo=tables["lo"][0],
            hi=tables["hi"][0], dims=meta.dims,
            jump_unit=meta.jump_unit, stats=())
        trans, acc_d, _ = gt._march(
            acc, origins, dirs, settings, max_steps,
            with_features=True, compact_min=1 << 40)
        feats = jnp.stack([acc_d[k] for k in order], axis=-1)
        return feats, trans

    return slab_fn


def _grid_slab_vis_fn(meta: "SlabAccelMeta", settings: RenderSettings,
                      max_steps: int):
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt

    def slab_fn(tables, origins, dirs, t_end):
        acc = gt.GridAccel(
            btab=tables["btab"][0], geom=tables["geom"][0],
            packet=tables["packet"][0], lo=tables["lo"][0],
            hi=tables["hi"][0], dims=meta.dims,
            jump_unit=meta.jump_unit, stats=())
        trans, _, _ = gt._march(
            acc, origins, dirs, settings, max_steps, t_end=t_end,
            with_features=False, compact_min=1 << 40)
        return jnp.zeros((origins.shape[0], 0)), trans

    return slab_fn


@functools.partial(jax.jit, static_argnames=("settings", "mesh",
                                             "accel_meta", "max_steps"))
def trace_spatial(scene_slabbed: GaussianScene, rays: Rays,
                  settings: RenderSettings, mesh, axis=(0.0, 0.0, 1.0),
                  slab_accel=None, accel_meta=None, max_steps: int = 128):
    """trace_dense-compatible aggregate interaction over partitioned slabs.

    Lets the multi-bounce path tracer (render/pathtrace.pathtrace) run with
    the scene spatially sharded: pass
    trace_fn=lambda s, r, st: trace_spatial(slabbed, r, st, mesh) and
    visibility_fn=visibility_spatial. Ray layout contract as render_spatial.

    With ``slab_accel``/``accel_meta`` (build_slab_accels), each slab's
    interaction runs through the v3 grid marcher instead of the dense
    top-K composite — the within-slab acceleration the r4 ring lacked
    (SPATIAL_CHIP_r04: 946 rays/s/chip dense; see SPATIAL_CHIP_r05).
    """
    from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize

    axis_v = jnp.asarray(axis, jnp.float32)
    axis_v = axis_v / jnp.maximum(jnp.linalg.norm(axis_v), 1e-12)

    if slab_accel is not None:
        # _grid_slab_trace_fn already emits _slab_interaction_feats'
        # channel order: [albedo3, emission3, met, rough, normal3, cc,
        # ccr, trn, depth].
        slab_fn = _grid_slab_trace_fn(accel_meta, settings, max_steps)
        feats, trans = _ring_composite(
            slab_accel, rays.origins, rays.directions, (), settings,
            mesh, axis_v, slab_fn, 15)
    else:
        def slab_fn(block, origins, dirs, extra):
            return _slab_interaction_feats(block, origins, dirs, axis_v,
                                           settings)

        feats, trans = _ring_composite(scene_slabbed, rays.origins,
                                       rays.directions, (), settings, mesh,
                                       axis_v, slab_fn, 15)
    alpha_acc = 1.0 - trans
    denom = jnp.maximum(alpha_acc, 1e-8)
    depth = feats[:, 14] / denom
    return dict(
        albedo=feats[:, 0:3],
        radiance_emitted=feats[:, 3:6],
        metallic=feats[:, 6] / denom,
        roughness=feats[:, 7] / denom,
        normal=safe_normalize(feats[:, 8:11]),
        clearcoat=feats[:, 11] / denom,
        cc_roughness=feats[:, 12] / denom,
        transmission=feats[:, 13] / denom,
        depth=depth,
        position=rays.origins + depth[:, None] * rays.directions,
        alpha_acc=alpha_acc,
        trans=trans,
        hit=alpha_acc > settings.hit_opacity_threshold,
    )


@functools.partial(jax.jit, static_argnames=("settings", "mesh",
                                             "accel_meta", "max_steps"))
def visibility_spatial(scene_slabbed: GaussianScene, origins, directions,
                       t_end, settings: RenderSettings, mesh,
                       axis=(0.0, 0.0, 1.0), slab_accel=None,
                       accel_meta=None, max_steps: int = 128):
    """Shadow transmittance over partitioned slabs (order-free product).

    The per-slab segment transmittances multiply commutatively, but riding
    the same ring keeps the data movement pattern (and sharding contract)
    identical to the trace. ``slab_accel`` switches the per-slab segment
    march to the grid backend (see trace_spatial)."""
    axis_v = jnp.asarray(axis, jnp.float32)
    axis_v = axis_v / jnp.maximum(jnp.linalg.norm(axis_v), 1e-12)

    if slab_accel is not None:
        slab_fn = _grid_slab_vis_fn(accel_meta, settings, max_steps)
        _, trans = _ring_composite(slab_accel, origins, directions,
                                   t_end, settings, mesh, axis_v,
                                   slab_fn, 0)
        return trans

    def slab_fn(block, o, d, extra):
        m = gops.canonical_transforms(block.log_scales, block.quats)
        alpha = gops.segment_transmittance_alpha(
            o[:, None, :], d[:, None, :], block.means[None], m[None],
            block.opacities[None], settings.t_min, extra[:, None],
            settings.alpha_min, settings.alpha_max)
        trans = jnp.prod(1.0 - alpha, axis=-1)
        return jnp.zeros((o.shape[0], 0)), trans

    _, trans = _ring_composite(scene_slabbed, origins, directions, t_end,
                               settings, mesh, axis_v, slab_fn, 0)
    return trans


def spatial_sharding(mesh):
    """Sharding for ray arrays consumed by render_spatial."""
    return NamedSharding(mesh, P((RAY_AXIS, GAUSS_AXIS)))
