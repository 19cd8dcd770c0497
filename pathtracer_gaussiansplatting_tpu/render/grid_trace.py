"""Uniform-grid ray tracing: scalable secondary rays & shadows.

The reference's secondary rays ride the same hardware BVH as primary rays
(traceRayEXT from closesthit, max depth 12). On TPU the tile pipeline only
covers camera-coherent primary rays, so bounce/shadow rays use a world-space
uniform grid (built once per scene by the native csrc/grid_bin, the BLAS-build
analog) marched with a branch-free 3D-DDA inside jit:

  * every ray steps cell-by-cell in lockstep (masked, no divergence);
  * per step, the cell's padded Gaussian list is evaluated with the exact
    ray-Gaussian math and candidates whose peak lies inside the cell's
    [t_entry, t_exit) slab are merged into a per-ray top-K (the same
    streaming-top-K used by the cross-chip ring in parallel/shard.py);
  * after max_steps the top-K is composited exactly like trace_dense.

Because cells are visited front-to-back and contributions are slab-bucketed,
the merged top-K reproduces the dense renderer's ordering wherever the cell
capacity isn't exceeded.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, Rays, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.composite import composite_weights
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridAccel:
    """Uniform-grid acceleration structure (pytree; dims static).

    ``cell_packets`` (C, Kc, 16) carries each cell's Gaussians PRE-PACKED:
    rows [q00,q11,q22,q01,q02,q12, mx,my,mz, opacity, pad...] with Q the
    world-space inverse covariance. The DDA then needs ONE wide-row gather
    per step instead of separate means/(3,3)-transform/opacity gathers —
    per-(ray, step) element gathers of tiny rows were the entire cost of
    the round-1 bounce path (~36 s per 16k rays / 4 bounces at 500k
    Gaussians; whole-trace gather traffic ~6 GB).
    """

    cell_indices: jnp.ndarray  # (C, Kc) int32, -1 padded
    cell_packets: jnp.ndarray  # (C, Kc, 16) f32 packed geometry
    lo: jnp.ndarray            # (3,)
    hi: jnp.ndarray            # (3,)
    dims: Tuple[int, int, int] = dataclasses.field(
        metadata=dict(static=True))

    @property
    def max_per_cell(self) -> int:
        return self.cell_indices.shape[1]


_PACKET_COLS = 16


def _geometry_table(scene: GaussianScene) -> jnp.ndarray:
    """(N, 16) packed per-Gaussian geometry rows (see GridAccel docstring).

    Same SoA construction as the tile kernel's build_tile_packets
    (kernels/tile_composite.py) — Q = R diag(exp(-2 log_s)) R^T."""
    from pathtracer_gaussiansplatting_tpu.ops.quaternions import rotmat_cols

    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rotmat_cols(scene.quats)
    d0 = jnp.exp(-2.0 * scene.log_scales[:, 0])
    d1 = jnp.exp(-2.0 * scene.log_scales[:, 1])
    d2 = jnp.exp(-2.0 * scene.log_scales[:, 2])
    cols = [
        r00 * r00 * d0 + r01 * r01 * d1 + r02 * r02 * d2,   # q00
        r10 * r10 * d0 + r11 * r11 * d1 + r12 * r12 * d2,   # q11
        r20 * r20 * d0 + r21 * r21 * d1 + r22 * r22 * d2,   # q22
        r00 * r10 * d0 + r01 * r11 * d1 + r02 * r12 * d2,   # q01
        r00 * r20 * d0 + r01 * r21 * d1 + r02 * r22 * d2,   # q02
        r10 * r20 * d0 + r11 * r21 * d1 + r12 * r22 * d2,   # q12
        scene.means[:, 0], scene.means[:, 1], scene.means[:, 2],
        scene.opacities,
    ]
    table = jnp.stack(cols, axis=-1)
    return jnp.pad(table, ((0, 0), (0, _PACKET_COLS - table.shape[-1])))


def _packet_quadratic(pk, origins, dirs):
    """(a, b, c) of the ray-Gaussian quadratic from packet rows.

    pk: (R, Kc, 16); origins/dirs: (R, 3). Returns (R, Kc) each."""
    ogx = origins[:, None, 0] - pk[..., 6]
    ogy = origins[:, None, 1] - pk[..., 7]
    ogz = origins[:, None, 2] - pk[..., 8]
    dx, dy, dz = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    q00, q11, q22 = pk[..., 0], pk[..., 1], pk[..., 2]
    q01, q02, q12 = pk[..., 3], pk[..., 4], pk[..., 5]
    a = (dx * dx * q00 + dy * dy * q11 + dz * dz * q22
         + 2.0 * (dx * dy * q01 + dx * dz * q02 + dy * dz * q12))
    wx = q00 * ogx + q01 * ogy + q02 * ogz
    wy = q01 * ogx + q11 * ogy + q12 * ogz
    wz = q02 * ogx + q12 * ogy + q22 * ogz
    b = dx * wx + dy * wy + dz * wz
    c = wx * ogx + wy * ogy + wz * ogz
    return jnp.maximum(a, 1e-12), b, c


def build_grid_accel(scene: GaussianScene, dims=(64, 64, 64),
                     max_per_cell: int = 64, sigma: float = 3.0,
                     max_radius_cells: float = 6.0) -> GridAccel:
    """Build the grid on the host (native C++ when available).

    ``max_radius_cells`` clamps each Gaussian's binning radius to that many
    cell widths: a fat Gaussian spanning the whole grid would otherwise be
    inserted into O(dims^3) cells (hundreds of seconds at 200k Gaussians).
    Clamped Gaussians lose fringe coverage beyond the clamp — raise the grid
    resolution or the clamp for scenes dominated by huge splats.
    """
    from pathtracer_gaussiansplatting_tpu.csrc.build import grid_bin
    from pathtracer_gaussiansplatting_tpu.utils.logging import get_logger

    centers = np.asarray(scene.means, np.float32)
    radii = sigma * np.exp(np.asarray(scene.log_scales)).max(-1)
    lo = (centers - radii[:, None]).min(0)
    hi = (centers + radii[:, None]).max(0)
    cell = (hi - lo) / np.asarray(dims, np.float32)
    r_cap = max_radius_cells * float(cell.max())
    n_clamped = int((radii > r_cap).sum())
    if n_clamped:
        get_logger().warning(
            "grid_accel: clamping %d/%d Gaussian radii to %.3g "
            "(%.0f cells); raise dims/max_radius_cells if fringe coverage "
            "matters", n_clamped, len(radii), r_cap, max_radius_cells)
    radii = np.minimum(radii, r_cap)
    idx, cnt, lo, hi = grid_bin(centers, radii.astype(np.float32), dims,
                                lo=lo, hi=hi, max_per_cell=max_per_cell)
    idx = jnp.asarray(idx)
    table = _geometry_table(scene)                       # (N, 16)
    packets = table[jnp.maximum(idx, 0)]                 # (C, Kc, 16)
    packets = jnp.where((idx >= 0)[..., None], packets, 0.0)
    return GridAccel(cell_indices=idx, cell_packets=packets,
                     lo=jnp.asarray(lo),
                     hi=jnp.asarray(hi), dims=tuple(int(d) for d in dims))


def _dda_init(origins, dirs, accel: GridAccel, t_min):
    """Initial DDA state: entry t, cell coords, per-axis t_next/t_delta."""
    dims = jnp.asarray(accel.dims, jnp.float32)
    ext = jnp.maximum(accel.hi - accel.lo, 1e-12)
    cell_size = ext / dims

    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                            jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
    # Ray-AABB entry/exit of the whole grid.
    t0 = (accel.lo[None] - origins) * inv_d
    t1 = (accel.hi[None] - origins) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), -1)
    t_far = jnp.min(jnp.maximum(t0, t1), -1)
    t_entry = jnp.maximum(t_near, t_min)
    inside = t_far > t_entry

    p_entry = origins + (t_entry[:, None] + 1e-5) * dirs
    cell = jnp.clip(jnp.floor((p_entry - accel.lo[None]) / cell_size[None]),
                    0, dims[None] - 1).astype(jnp.int32)
    step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)
    next_bound = accel.lo[None] + (cell + (step > 0)).astype(jnp.float32) \
        * cell_size[None]
    t_next = (next_bound - origins) * inv_d           # (R,3)
    t_delta = jnp.abs(cell_size[None] * inv_d)        # (R,3)
    return dict(cell=cell, step=step, t_next=t_next, t_delta=t_delta,
                t_entry=t_entry, t_far=t_far, alive=inside)


def _cell_linear(cell, dims):
    return (cell[:, 2] * dims[1] + cell[:, 1]) * dims[0] + cell[:, 0]


@functools.partial(jax.jit, static_argnames=("settings", "max_steps", "topk"))
def grid_topk(scene: GaussianScene, accel: GridAccel, rays: Rays,
              settings: RenderSettings, max_steps: int = 128,
              topk: int = None):
    """March rays through the grid; return per-ray top-K contributions.

    ONE wide-row packet gather per step + lax.while_loop with per-ray
    termination: a ray stops when it leaves the grid, when its top-K is
    full of contributions nearer than the current cell (no later candidate
    can enter), or when the transmittance through its kept contributions
    saturates (settings.transmittance_min). The loop ends when every ray
    has stopped — typical scenes finish in a fraction of max_steps.

    Returns (idx (R,K), t (R,K), alpha (R,K)) like dense_topk.
    """
    k = topk or settings.max_contribs
    r = rays.num_rays
    origins, dirs = rays.origins, rays.directions
    state = _dda_init(origins, dirs, accel, settings.t_min)
    dims = accel.dims

    init_carry = dict(
        t=jnp.full((r, k), settings.t_max),
        alpha=jnp.zeros((r, k)),
        idx=jnp.zeros((r, k), jnp.int32),
        cell=state["cell"], t_next=state["t_next"], t_cur=state["t_entry"],
        alive=state["alive"], step=jnp.int32(0),
    )
    step_dir = state["step"]
    t_delta = state["t_delta"]
    t_far = state["t_far"]
    cut = float(np.exp(-0.5 * settings.sigma_cut * settings.sigma_cut))

    def cond(carry):
        return (carry["step"] < max_steps) & jnp.any(carry["alive"])

    def body(carry):
        cell = carry["cell"]
        in_bounds = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
        alive = carry["alive"] & in_bounds
        lin = jnp.clip(_cell_linear(cell, dims), 0,
                       accel.cell_indices.shape[0] - 1)
        lin = jnp.where(alive, lin, 0)  # dead rays hit one shared row
        gids = accel.cell_indices[lin]                       # (R, Kc)
        pk = accel.cell_packets[lin]                         # (R, Kc, 16)
        valid_g = (gids >= 0) & alive[:, None]
        gsafe = jnp.maximum(gids, 0)

        # slab for this step: [t_cur, t_exit)
        t_exit = jnp.min(carry["t_next"], -1)
        a_q, b_q, c_q = _packet_quadratic(pk, origins, dirs)
        t_peak = jnp.clip(-b_q / a_q, settings.t_min, settings.t_max)
        qv = (a_q * t_peak + 2.0 * b_q) * t_peak + c_q
        gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
        a0 = pk[..., 9] * gval
        a = jnp.where((gval >= cut) & (a0 >= settings.alpha_min),
                      jnp.minimum(a0, settings.alpha_max), 0.0)
        # exact half-open slab [t_cur, t_exit): t_cur is the previous step's
        # t_exit bitwise, so every peak lands in exactly one slab (an epsilon
        # overlap here double-counts boundary Gaussians)
        in_slab = (t_peak >= carry["t_cur"][:, None]) \
            & (t_peak < t_exit[:, None])
        a = jnp.where(valid_g & in_slab, a, 0.0)
        t_peak = jnp.where(a > 0, t_peak, settings.t_max)

        # merge into running top-K by depth
        t_all = jnp.concatenate([carry["t"], t_peak], 1)
        a_all = jnp.concatenate([carry["alpha"], a], 1)
        i_all = jnp.concatenate([carry["idx"], gsafe], 1)
        key = jnp.where(a_all > 0, t_all, jnp.inf)
        neg, sel = jax.lax.top_k(-key, k)
        new_t = jnp.take_along_axis(t_all, sel, 1)
        new_a = jnp.where(jnp.isfinite(-neg),
                          jnp.take_along_axis(a_all, sel, 1), 0.0)
        new_i = jnp.take_along_axis(i_all, sel, 1)

        # DDA advance: step the axis with the smallest t_next
        axis = jnp.argmin(carry["t_next"], -1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_cell = cell + onehot * step_dir
        new_tnext = carry["t_next"] + onehot.astype(jnp.float32) * t_delta
        # Per-ray termination: out of grid; top-K full of nearer hits (no
        # later candidate can displace them); or kept transmittance below
        # the early-out threshold (front-to-back saturation).
        kfull = new_a[:, k - 1] > 0.0
        beyond = t_exit >= new_t[:, k - 1]
        trans_kept = jnp.prod(1.0 - new_a, axis=-1)
        new_alive = alive & (t_exit < t_far) \
            & ~(kfull & beyond) \
            & (trans_kept > settings.transmittance_min)
        return dict(t=new_t, alpha=new_a, idx=new_i, cell=new_cell,
                    t_next=new_tnext, t_cur=t_exit, alive=new_alive,
                    step=carry["step"] + 1)

    carry = jax.lax.while_loop(cond, body, init_carry)
    return carry["idx"], carry["t"], carry["alpha"]


def trace_grid(scene: GaussianScene, rays: Rays, settings: RenderSettings,
               accel: GridAccel, max_steps: int = 128):
    """Aggregate surface interaction via the grid (trace_dense-compatible)."""
    idx, t, alpha = grid_topk(scene, accel, rays, settings, max_steps)
    d = rays.directions[:, None, :]
    x = rays.origins[:, None, :] + t[..., None] * d
    color = sh_mod.eval_sh(scene.sh_coeffs[idx],
                           jnp.broadcast_to(d, x.shape), settings.sh_degree)
    normal = gops.surfel_normal(scene.log_scales[idx], scene.quats[idx],
                                view_dir=d)
    weights, trans = composite_weights(alpha)
    alpha_acc = 1.0 - trans

    def wsum(f):
        return jnp.einsum("rk,rk...->r...", weights, f)

    denom = jnp.maximum(alpha_acc, 1e-8)[..., None]
    return dict(
        radiance_emitted=wsum(scene.emission[idx]),
        albedo=wsum(color),
        normal=safe_normalize(wsum(normal)),
        position=wsum(x) / denom,
        depth=wsum(t) / denom[..., 0],
        metallic=wsum(scene.metallic[idx]) / denom[..., 0],
        roughness=wsum(scene.roughness[idx]) / denom[..., 0],
        clearcoat=wsum(scene.clearcoat[idx]) / denom[..., 0],
        cc_roughness=wsum(scene.clearcoat_roughness[idx]) / denom[..., 0],
        transmission=wsum(scene.transmission[idx]) / denom[..., 0],
        alpha_acc=alpha_acc,
        trans=trans,
        hit=alpha_acc > settings.hit_opacity_threshold,
    )


@functools.partial(jax.jit, static_argnames=("settings", "max_steps"))
def visibility_grid(scene: GaussianScene, accel: GridAccel, origins,
                    directions, t_end, settings: RenderSettings,
                    max_steps: int = 128):
    """Shadow-ray transmittance via the grid (visibility_dense analog).

    Same one-packet-gather-per-step + while_loop structure as grid_topk;
    rays stop once opaque (log T below the early-out threshold) or past
    the light."""
    r = origins.shape[0]
    state = _dda_init(origins, directions, accel, settings.t_min)
    dims = accel.dims
    step_dir, t_delta, t_far = state["step"], state["t_delta"], state["t_far"]
    log_min = float(np.log(max(settings.transmittance_min, 1e-30)))

    init = dict(logt=jnp.zeros((r,)), cell=state["cell"],
                t_next=state["t_next"], t_cur=state["t_entry"],
                alive=state["alive"], step=jnp.int32(0))

    def cond(carry):
        return (carry["step"] < max_steps) & jnp.any(carry["alive"])

    def body(carry):
        cell = carry["cell"]
        in_bounds = jnp.all((cell >= 0) & (cell < jnp.asarray(dims)), -1)
        alive = carry["alive"] & in_bounds
        lin = jnp.clip(_cell_linear(cell, dims), 0,
                       accel.cell_indices.shape[0] - 1)
        lin = jnp.where(alive, lin, 0)
        gids = accel.cell_indices[lin]
        pk = accel.cell_packets[lin]
        valid_g = (gids >= 0) & alive[:, None]
        t_exit = jnp.min(carry["t_next"], -1)
        seg_end = jnp.minimum(t_exit, t_end)
        # segment-clamped peak response (segment_transmittance_alpha math)
        a_q, b_q, c_q = _packet_quadratic(pk, origins, directions)
        t0 = jnp.maximum(carry["t_cur"], settings.t_min)[:, None]
        t_pk = jnp.clip(-b_q / a_q, t0, seg_end[:, None])
        qv = (a_q * t_pk + 2.0 * b_q) * t_pk + c_q
        a = pk[..., 9] * jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
        a = jnp.where(a < settings.alpha_min, 0.0,
                      jnp.minimum(a, settings.alpha_max))
        # only count Gaussians whose peak falls in this slab (avoid double
        # counting across cells); the UNclamped peak picks the slab
        t_peak = jnp.clip(-b_q / a_q, settings.t_min, settings.t_max)
        in_slab = (t_peak >= carry["t_cur"][:, None]) \
            & (t_peak < t_exit[:, None])
        a = jnp.where(valid_g & in_slab, a, 0.0)
        logt = carry["logt"] + jnp.sum(jnp.log1p(-a), -1)

        axis = jnp.argmin(carry["t_next"], -1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_alive = alive & (t_exit < jnp.minimum(t_far, t_end)) \
            & (logt > log_min)
        return dict(logt=logt, cell=cell + onehot * step_dir,
                    t_next=carry["t_next"] + onehot.astype(jnp.float32) * t_delta,
                    t_cur=t_exit, alive=new_alive, step=carry["step"] + 1)

    carry = jax.lax.while_loop(cond, body, init)
    return jnp.exp(carry["logt"])
