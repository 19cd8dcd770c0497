"""Uniform-grid ray marching: scalable secondary rays & shadows (v3).

The reference's secondary rays ride the same hardware BVH as primary rays
(traceRayEXT from closesthit, max depth 12; engine.cpp:534-655 builds the
BLAS). On TPU the tile pipeline only covers camera-coherent primary rays,
so bounce/shadow rays march a world-space uniform grid (built once per
scene by the native csrc grid_bin — the BLAS-build analog).

v3 design notes (what changed from the round-3 marcher and why; every
number below was measured on the v5e chip, benchmarks/profile_march*.py):

  * TRAVERSAL / COMPOSITE SPLIT. The round-3 marcher paid the full packet
    gathers (geom 1536 B + feats 1536 B + 2 int32 probes ~ 44 ns/ray) on
    EVERY while-loop iteration — but a census of the flagship scene shows
    only 22% of iterations land on an occupied cell (5.2 occupied
    composites out of 23.9 iterations per ray). v3 marches in two phases:
    phase A walks the grid with cheap block-table probes and records each
    ray's next <= M occupied cells (slot + slab bounds); phase B gathers
    and composites ONLY those recorded cells.
  * BLOCK PROBES. Phase A probes a (B, 4) int32 table over 4x4x4-cell
    blocks (16-byte rows gather at ~6.4 ns vs ~11-12 ns for the old
    per-cell int32 probe — small tables with 16-32 B rows are the
    row-gather sweet spot). One row carries a 64-bit in-block occupancy
    mask + the base slot of the block's first occupied cell (slots are
    ordered (block, in-block-rank), so slot = base + popcount(mask below
    rank)) — up to 4 in-block DDA steps ride ONE gather, pure VPU.
  * EUCLIDEAN EMPTY-SPACE JUMPS. Empty blocks store a fixed-point
    euclidean distance (scipy EDT with per-axis sampling; chebyshev
    fallback), so diagonal rays jump sqrt(3)x further than the round-3
    chebyshev-min-axis jumps.
  * FUSED PACKET ROWS. Phase B gathers ONE f32 row per (ray, occupied
    cell) carrying geometry AND features (24 cols deg-0 / 40 cols deg-1;
    f32 row gathers measured FASTER than bf16 at equal bytes: 9.2 vs
    12.7 ns at 1536 B). Shadow marches gather a geometry-only 12-col
    table instead.
  * ROUNDS + CAPACITY COMPACTION, NO SILENT TRUNCATION. Rays pause when
    their M slots fill; each following round argsorts (dead-last,
    morton-of-position for coherence — argsort itself is ~11 ms at 2.1M)
    and resumes only the first ``cap`` survivors at a shrinking capacity.
    Rays still alive when the schedule ends are FROZEN AND COUNTED —
    ``trace_grid``/``visibility_grid`` return the count (`frozen_alive`)
    so callers can report it (ADVICE r3: the round-3 fractional
    compaction silently froze overflow rays with no stat).
  * SUB-BATCHED WHILE LOOPS. Full-width phases are python-unrolled into
    ``sub_rays``-sized independent while_loops (NOT lax.map — a scanned
    while_loop + large gather reproducibly crashed the v5e worker in
    round 2): a sub-batch whose rays are all dead exits its loop
    immediately, so sorted-dead rays cost nothing.

Differentiability: the march reads host-built (numpy) acceleration
tables and runs a reverse-mode-incompatible while_loop, so it is
INFERENCE-ONLY with respect to scene parameters — `jax.grad` through a
grid-backend render raises loudly (while_loop is not reverse-mode
differentiable). Training gradients flow through the tile/dense paths.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, Rays, RenderSettings,
)
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize

# Geometry-only table columns (shadow marches; f32).
_G_Q = slice(0, 6)      # [q00, q11, q22, q01, q02, q12] world-space inv cov
_G_MEAN = slice(6, 9)
_G_OPAC = 9
GEOM_COLS = 12          # 2 pad cols; 12*Kc stays a multiple of 128

# Fused packet columns (interaction traces; f32). Layout:
#   [q6(0:6), mean(6:9), opac(9), dc(10:13), emi(13:16), met(16),
#    rough(17), cc(18), ccr(19), trn(20), axis(21:24)]
# deg-1 scenes append [by(24:27), bz(27:30), bx(30:33)] + 7 pad -> 40.
PKT_COLS_DEG0 = 24
PKT_COLS_DEG1 = 40
_P_DC, _P_EMI, _P_MET, _P_ROUGH = 10, 13, 16, 17
_P_CC, _P_CCR, _P_TRN, _P_AXIS, _P_BY = 18, 19, 20, 21, 24

# Fixed-point unit of the empty-block jump distance, in fractions of the
# smallest cell edge.
_JUMP_FP = 4.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridAccel:
    """Uniform-grid acceleration structure (pytree; static metadata).

    ``btab`` is the (B, 4) int32 block table over 4x4x4-cell blocks:
    row = [info, base, mask_lo, mask_hi]. info >= 0 marks an occupied
    block (mask = 64-bit cell-occupancy, base = slot of its first
    occupied cell, info packs the tight AABB of the set cells as six
    2-bit fields [xmin, xmax, ymin, ymax, zmin, zmax] — the marcher
    slab-tests it so grazing rays that miss the occupied sub-box skip
    the whole block in one probe); info < 0 encodes the safe euclidean
    jump distance for empty blocks as -(1 + round(jump / jump_unit)).
    ``geom``/``packet`` are FLAT (S, cols*Kc) f32 with column c at
    [c*Kc:(c+1)*Kc]: cols*Kc is a multiple of 128, so row gathers are
    lane-exact. ``stats`` records binning truncation (no silent caps).
    """

    btab: jnp.ndarray       # (B, 4) int32 block rows
    geom: jnp.ndarray       # (S, GEOM_COLS*Kc) f32 (shadow marches)
    packet: jnp.ndarray     # (S, PKT_COLS*Kc) f32 (interaction traces)
    lo: jnp.ndarray         # (3,)
    hi: jnp.ndarray         # (3,)
    dims: Tuple[int, int, int] = dataclasses.field(
        metadata=dict(static=True))
    jump_unit: float = dataclasses.field(
        default=1.0, metadata=dict(static=True))
    stats: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    @property
    def max_per_cell(self) -> int:
        return self.geom.shape[1] // GEOM_COLS

    @property
    def pkt_cols(self) -> int:
        return self.packet.shape[1] // self.max_per_cell

    @property
    def block_dims(self) -> Tuple[int, int, int]:
        return tuple(-(-d // 4) for d in self.dims)

    @property
    def stats_dict(self) -> dict:
        return dict(self.stats)


def _geometry_table(scene: GaussianScene) -> jnp.ndarray:
    """(N, 12) packed geometry rows: Q = R diag(exp(-2 log_s)) R^T upper
    triangle, mean, opacity."""
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
    return jnp.pad(table, ((0, 0), (0, GEOM_COLS - table.shape[-1])))


def _packet_table(scene: GaussianScene, geom: jnp.ndarray) -> jnp.ndarray:
    """(N, 24 or 40) fused geometry+feature rows (deg<=1 factored SH +
    PBR scalars + surfel axis); see module-level layout constants."""
    from pathtracer_gaussiansplatting_tpu.ops.gaussians import surfel_normal

    sh = scene.sh_coeffs
    dc = sh[:, 0, :] * sh_mod.SH_C0
    deg1 = sh.shape[1] >= 4
    scalars = [scene.metallic[:, None], scene.roughness[:, None],
               scene.clearcoat[:, None], scene.clearcoat_roughness[:, None],
               scene.transmission[:, None]]
    axis = surfel_normal(scene.log_scales, scene.quats)
    cols = [geom[:, :10], dc, scene.emission] + scalars + [axis]
    width = PKT_COLS_DEG0
    if deg1:
        by = -sh_mod.SH_C1 * sh[:, 1, :]
        bz = sh_mod.SH_C1 * sh[:, 2, :]
        bx = -sh_mod.SH_C1 * sh[:, 3, :]
        cols += [by, bz, bx]
        width = PKT_COLS_DEG1
    table = jnp.concatenate(cols, axis=-1)
    return jnp.pad(table, ((0, 0), (0, width - table.shape[-1])))


def _aniso_extents(scene: GaussianScene, sigma: float) -> np.ndarray:
    """(N, 3) per-world-axis half-extents of each Gaussian's sigma-sigma
    AABB: h_i = sigma * sqrt(sum_j R_ij^2 s_j^2). For flat surfels this is
    far tighter along the normal than a bounding sphere."""
    from pathtracer_gaussiansplatting_tpu.ops.quaternions import rotmat_cols

    cols = [np.asarray(c, np.float32)
            for c in rotmat_cols(scene.quats)]
    r = np.stack(cols, -1).reshape(-1, 3, 3)        # (N, 3, 3) rows=world
    s2 = np.exp(2.0 * np.asarray(scene.log_scales, np.float32))
    return sigma * np.sqrt(np.einsum("nij,nj->ni", r * r, s2))


def fit_grid(scene: GaussianScene, sigma: float = 3.0,
             radius_percentile: float = 99.0, cell_scale: float = 1.5,
             max_dims: int = 192, min_dims: int = 4):
    """Choose grid bounds/dims and the extent clamp from scene statistics.

    The reference's BLAS adapts to geometry automatically
    (engine.cpp:534-655); here the cell edge is ``cell_scale`` x the
    median max-axis sigma (so a typical splat lands in a few cells per
    axis) and the extent clamp sits at ``radius_percentile`` so only the
    extreme tail loses fringe coverage.
    """
    centers = np.asarray(scene.means, np.float32)
    exts = _aniso_extents(scene, sigma)
    h_max = exts.max(-1)
    cap = float(np.percentile(h_max, radius_percentile))
    scale = np.minimum(1.0, cap / np.maximum(h_max, 1e-12))
    exts_eff = exts * scale[:, None]
    lo = (centers - exts_eff).min(0)
    hi = (centers + exts_eff).max(0)
    span = np.maximum(hi - lo, 1e-6)
    cell = max(cell_scale * float(np.median(h_max)) / sigma,
               float(span.max()) / max_dims)
    dims = np.clip(np.ceil(span / cell), min_dims, max_dims).astype(int)
    n_clamped = int((h_max > cap).sum())
    return (tuple(int(d) for d in dims), cap, exts_eff, lo, hi, n_clamped)


def _block_jump_table(occ_blocks: np.ndarray, bdims, block_size,
                      jump_unit: float) -> np.ndarray:
    """Fixed-point safe jump distance per EMPTY block (0 for occupied).

    Euclidean distance (block-center to block-center, per-axis sampling)
    minus one block diagonal is a safe advance from anywhere inside the
    block; falls back to chebyshev distance when scipy is absent.
    """
    bx, by, bz = bdims
    occ3 = occ_blocks.reshape(bz, by, bx)
    diag = float(np.linalg.norm(block_size))
    try:
        from scipy.ndimage import distance_transform_edt

        dist = distance_transform_edt(
            ~occ3, sampling=(block_size[2], block_size[1], block_size[0]))
        jump = np.maximum(dist - diag, 0.0)
    except Exception:
        from pathtracer_gaussiansplatting_tpu.csrc.build import (
            chebyshev_dist,
        )

        d = chebyshev_dist(occ3.reshape(-1), (bx, by, bz),
                           cap=127).astype(np.float32)
        jump = np.maximum((d.reshape(bz, by, bx) - 1.0)
                          * float(min(block_size)), 0.0)
    q = np.round(jump / jump_unit).astype(np.int64)
    return np.minimum(q, 2 ** 30).astype(np.int32).reshape(-1)


def build_grid_accel(scene: GaussianScene, dims=None,
                     max_per_cell: int = 32, sigma: float = 3.0,
                     radius_percentile: float = 99.0,
                     memory_budget_bytes: float = 2.5e9,
                     bounds=None) -> GridAccel:
    """Build the grid on the host (native C++ when available).

    ``dims=None`` auto-fits dims and the extent clamp to the scene
    (:func:`fit_grid`); the grid is re-binned coarser if the sparse
    tables would exceed ``memory_budget_bytes``. Binning truncation is
    measured — fraction of extent-clamped Gaussians, fraction of
    insertions dropped by the per-cell capacity (lowest peak-alpha
    evicted first), fraction of overflowing cells — logged, and stored
    in ``GridAccel.stats`` for capture reports.
    """
    from pathtracer_gaussiansplatting_tpu.csrc.build import grid_bin_aniso
    from pathtracer_gaussiansplatting_tpu.utils.logging import get_logger

    if max_per_cell % 16:
        raise ValueError("max_per_cell must be a multiple of 16 (lane-"
                         f"exact flat tables), got {max_per_cell}")
    centers = np.asarray(scene.means, np.float32)
    auto = dims is None
    if auto:
        dims, cap, exts_eff, lo, hi, n_clamped = fit_grid(
            scene, sigma=sigma, radius_percentile=radius_percentile)
    else:
        dims = tuple(int(d) for d in dims)
        exts = _aniso_extents(scene, sigma)
        h_max = exts.max(-1)
        cap = float(np.percentile(h_max, radius_percentile))
        scale = np.minimum(1.0, cap / np.maximum(h_max, 1e-12))
        exts_eff = exts * scale[:, None]
        if bounds is not None:
            # Forced bounds (stacked per-slab accels need one shared
            # cell geometry across slabs, parallel/spatial.py).
            lo = np.asarray(bounds[0], np.float32)
            hi = np.asarray(bounds[1], np.float32)
        else:
            lo = (centers - exts_eff).min(0)
            hi = (centers + exts_eff).max(0)
        n_clamped = int((h_max > cap).sum())
    n = scene.num_gaussians
    deg1 = scene.sh_coeffs.shape[1] >= 4
    pkt_cols = PKT_COLS_DEG1 if deg1 else PKT_COLS_DEG0
    priority = np.asarray(scene.opacities, np.float32)
    row_bytes = max_per_cell * (GEOM_COLS + pkt_cols) * 4
    for _ in range(4):
        idx, cnt = grid_bin_aniso(centers, exts_eff, priority, dims,
                                  lo=lo, hi=hi, max_per_cell=max_per_cell)
        n_occ = int((cnt > 0).sum())
        if n_occ * row_bytes <= memory_budget_bytes or not auto \
                or max(dims) <= 8:
            break
        dims = tuple(max(4, int(d * 0.7)) for d in dims)
    dropped = int(np.maximum(cnt - max_per_cell, 0).sum())
    total = int(cnt.sum())
    occupied = np.nonzero(cnt > 0)[0]
    stats = dict(
        clamped_frac=n_clamped / max(n, 1),
        dropped_frac=dropped / max(total, 1),
        overflow_cell_frac=float((cnt > max_per_cell).sum()
                                 / max(len(occupied), 1)),
        occupied_frac=len(occupied) / max(len(cnt), 1),
        mean_occupancy=float(cnt[occupied].mean()) if len(occupied)
        else 0.0,
        dims=dims, max_per_cell=max_per_cell, extent_cap=float(cap),
    )
    if stats["clamped_frac"] > 0.05 or stats["dropped_frac"] > 0.05:
        get_logger().warning(
            "grid_accel truncation: %.1f%% extents clamped (cap %.3g), "
            "%.1f%% insertions dropped (%.1f%% of occupied cells "
            "overflow Kc=%d) — raise max_per_cell or radius_percentile "
            "if fringe coverage matters",
            100 * stats["clamped_frac"], cap,
            100 * stats["dropped_frac"],
            100 * stats["overflow_cell_frac"], max_per_cell)

    # ---- block table: occupancy masks + slot bases + euclid jumps ----
    gx, gy, gz = dims
    bdims = tuple(-(-d // 4) for d in dims)
    bx_, by_, bz_ = bdims
    span = np.maximum(np.asarray(hi) - np.asarray(lo), 1e-12)
    cell_size = span / np.asarray(dims, np.float64)
    # occupied cells ordered (block-linear, in-block rank) so each
    # block's slots are consecutive and recoverable via popcount.
    cz, cyx = np.divmod(occupied, gx * gy)
    cy, cx = np.divmod(cyx, gx)
    blin = ((cz >> 2) * by_ + (cy >> 2)) * bx_ + (cx >> 2)
    rank = (cx & 3) + 4 * (cy & 3) + 16 * (cz & 3)
    order = np.argsort(blin * 64 + rank, kind="stable")
    occupied = occupied[order]
    blin, rank = blin[order], rank[order]

    n_blocks = bx_ * by_ * bz_
    mask64 = np.zeros(n_blocks, np.uint64)
    np.bitwise_or.at(mask64, blin, np.uint64(1) << rank.astype(np.uint64))
    occ_blocks = mask64 != 0
    base = np.zeros(n_blocks, np.int64)
    first = np.unique(blin, return_index=True)
    base[first[0]] = first[1]
    # Tight per-block AABB of the set cells, six 2-bit fields in info.
    bmin = np.full((n_blocks, 3), 3, np.int64)
    bmax = np.zeros((n_blocks, 3), np.int64)
    inblock = np.stack([cx & 3, cy & 3, cz & 3], axis=-1)
    np.minimum.at(bmin, blin, inblock[order])
    np.maximum.at(bmax, blin, inblock[order])
    bounds = (bmin[:, 0] | (bmax[:, 0] << 2) | (bmin[:, 1] << 4)
              | (bmax[:, 1] << 6) | (bmin[:, 2] << 8)
              | (bmax[:, 2] << 10))
    jump_unit = float(cell_size.min()) / _JUMP_FP
    jump_q = _block_jump_table(occ_blocks, bdims,
                               np.asarray(cell_size * 4.0, np.float64),
                               jump_unit)
    info = np.where(occ_blocks, bounds, -(1 + jump_q.astype(np.int64)))
    btab = np.stack([
        info.astype(np.int32),
        base.astype(np.int32),
        (mask64 & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32),
        (mask64 >> np.uint64(32)).astype(np.uint32).view(np.int32),
    ], axis=-1)

    idx_s = idx[occupied] if len(occupied) else np.full(
        (1, max_per_cell), -1, np.int32)
    idx_s = jnp.asarray(idx_s)
    valid = idx_s >= 0
    safe = jnp.maximum(idx_s, 0)
    s = idx_s.shape[0]

    def flat(table):
        rows = table[safe]                       # (S, Kc, cols)
        rows = jnp.where(valid[..., None], rows, 0.0)
        # (S, cols, Kc) -> (S, cols*Kc): column c occupies a contiguous
        # Kc-run, and cols*Kc is a multiple of 128 (lane-exact gathers).
        return jnp.swapaxes(rows, 1, 2).reshape(s, -1).astype(jnp.float32)

    geom_rows = _geometry_table(scene)
    geom = flat(geom_rows)
    packet = flat(_packet_table(scene, geom_rows))
    return GridAccel(
        btab=jnp.asarray(btab), geom=geom, packet=packet,
        lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32),
        dims=dims, jump_unit=jump_unit,
        stats=tuple(sorted(stats.items())))


def _ray_setup(origins, dirs, accel: GridAccel, t_min):
    """Stateless ray-grid quantities for the recompute-from-t marcher."""
    dims_f = jnp.asarray(accel.dims, jnp.float32)
    ext = jnp.maximum(accel.hi - accel.lo, 1e-12)
    cell_size = ext / dims_f
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                            jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
    t0 = (accel.lo[None] - origins) * inv_d
    t1 = (accel.hi[None] - origins) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), -1)
    t_far = jnp.min(jnp.maximum(t0, t1), -1)
    t_entry = jnp.maximum(t_near, t_min)
    inside = t_far > t_entry
    t_delta = jnp.abs(cell_size[None] * inv_d)          # (R, 3)
    min_delta = jnp.min(t_delta, -1)                    # (R,)
    return dict(cell_size=cell_size, inv_d=inv_d, t_entry=t_entry,
                t_far=t_far, inside=inside, min_delta=min_delta,
                step_pos=(dirs >= 0).astype(jnp.float32))


def _ordered_weights(t_peak, alpha):
    """Exact within-cell front-to-back compositing weights, no sort.

    excl_i = prod over j with (t_j, j) < (t_i, i) of (1 - alpha_j); the
    O(Kc^2) pairwise mask stays in slot order (it lowers to a fused
    broadcast-reduce, nothing (R, Kc, Kc) is materialized) so features
    need no permutation. Returns excl (R, Kc)."""
    kc = alpha.shape[-1]
    before = t_peak[:, None, :] < t_peak[:, :, None]        # (R, Kc, Kc)
    iota = jnp.arange(kc)
    tie = (t_peak[:, None, :] == t_peak[:, :, None]) \
        & (iota[None, None, :] < iota[None, :, None])
    fac = jnp.where(before | tie, 1.0 - alpha[:, None, :], 1.0)
    return jnp.prod(fac, axis=-1)                           # (R, Kc)


_ACC_KEYS = ("col_r", "col_g", "col_b", "emi_r", "emi_g", "emi_b",
             "met", "rough", "cc", "ccr", "trn", "nx", "ny", "nz", "tsum")

# Round schedule for large batches: (capacity fraction of R, slots M,
# phase-A iteration budget, A exit fraction, B exit fraction). Round 0
# runs full width; later rounds compact survivors to a shrinking
# capacity (overflow is COUNTED, not silently dropped). sum(M) bounds
# occupied composites per ray. Exit fractions stop a phase once that
# share of the batch is still active — stragglers pause/rewind and
# resume compacted — because a while-loop iteration costs the FULL
# batch width whatever the live-lane count; the LAST round must use 0.
# Tuned on the flagship scene (benchmarks/profile_march2.py census:
# count p50=3 p90=8, iteration need p50~12 p98~40).
_DEFAULT_SCHEDULE = ((1.0, 8, 64, 0.05, 0.10),
                     (0.25, 16, 96, 0.02, 0.05),
                     (0.0625, 32, 160, 0.005, 0.01),
                     (0.015625, 64, 320, 0.0, 0.0))
_COMPACT_MIN_RAYS = 32768   # below this: single batch, no sorting
_SUB_RAYS = 524288          # full-width phases split into this


def _phase_a(accel: GridAccel, origins, dirs, setup, t, alive, t_far,
             m_slots: int, a_max: int, exit_frac: float = 0.0):
    """Probe-only traversal: record the next <= m_slots occupied cells.

    Stops early once fewer than ``exit_frac`` of the batch is still
    probing (stragglers pause and resume in a later, compacted round —
    the while loop otherwise runs every lane to the BATCH-max iteration
    count, ~5x the mean on the flagship scene). Returns (slots (R, M)
    i32, t_ent (R, M), t_exit (R, M), count (R,), t_new (R,),
    paused (R,) [not dead, traversal unfinished or slots full]).
    """
    r = origins.shape[0]
    dims = accel.dims
    bdims = accel.block_dims
    cell_size, inv_d = setup["cell_size"], setup["inv_d"]
    step_pos, min_delta = setup["step_pos"], setup["min_delta"]
    eps = 1e-3 * min_delta
    probe = 0.25 * eps
    lo = accel.lo[None]
    dims_f = jnp.asarray(dims, jnp.float32)
    n_blocks = accel.btab.shape[0]
    block_edge = cell_size * 4.0
    jump_unit = accel.jump_unit
    miota = jnp.arange(m_slots)

    def cell_of(t_):
        p = origins + (t_ + probe)[:, None] * dirs
        cell = jnp.clip(jnp.floor((p - lo) / cell_size[None]),
                        0, dims_f - 1.0)
        return cell

    def cell_exit(cell, t_):
        bnd = lo + (cell + step_pos) * cell_size[None]
        t_exit = jnp.min((bnd - origins) * inv_d, -1)
        return jnp.maximum(t_exit, t_ + eps)

    def block_exit(cell, t_):
        bcell = jnp.floor(cell / 4.0)
        bnd = lo + (bcell + step_pos) * block_edge[None]
        t_exit = jnp.min((bnd - origins) * inv_d, -1)
        return jnp.maximum(t_exit, t_ + eps)

    def body(carry):
        t_, count, slots, t_ent, t_exd, it = carry
        probing = (t_ < t_far) & (count < m_slots)
        cell = cell_of(t_)
        icell = cell.astype(jnp.int32)
        bx = icell[:, 0] >> 2
        by = icell[:, 1] >> 2
        bz = icell[:, 2] >> 2
        blin = jnp.clip((bz * bdims[1] + by) * bdims[0] + bx,
                        0, n_blocks - 1)
        row = accel.btab[jnp.where(probing, blin, 0)]       # (R, 4)
        info = row[:, 0]
        base = row[:, 1]
        mlo = row[:, 2].astype(jnp.uint32)
        mhi = row[:, 3].astype(jnp.uint32)
        occ_block = info >= 0

        # Empty block: euclidean jump (at least to the block exit).
        t_bex = block_exit(cell, t_)
        jump_w = (-(info + 1)).astype(jnp.float32) * jump_unit
        t_jump = jnp.maximum(t_bex, t_ + jump_w)

        # Occupied block: slab-test the tight AABB of its set cells —
        # grazing rays that miss the sub-box (e.g. skimming just above a
        # floor whose surfels fill only the block's bottom cell layers)
        # cross the whole block in this ONE probe instead of stepping
        # cell by cell; rays that hit it start stepping at the box entry.
        b = jnp.maximum(info, 0)
        bmin = jnp.stack([b & 3, (b >> 4) & 3, (b >> 8) & 3],
                         -1).astype(jnp.float32)
        bmax = jnp.stack([(b >> 2) & 3, (b >> 6) & 3, (b >> 10) & 3],
                         -1).astype(jnp.float32)
        borig_w = lo + jnp.stack([bx, by, bz], -1).astype(jnp.float32) \
            * block_edge[None]
        box_lo = borig_w + bmin * cell_size[None]
        box_hi = borig_w + (bmax + 1.0) * cell_size[None]
        tb0 = (box_lo - origins) * inv_d
        tb1 = (box_hi - origins) * inv_d
        t_in = jnp.max(jnp.minimum(tb0, tb1), -1)
        t_out = jnp.min(jnp.maximum(tb0, tb1), -1)
        enter = jnp.maximum(t_, t_in)
        box_hit = occ_block & (t_out > enter)

        # Up to 4 in-block cell steps from this one row, starting at the
        # sub-box entry.
        tk = jnp.where(box_hit, enter, t_)
        ck = count
        sl, te, tx = slots, t_ent, t_exd
        for _ in range(4):
            cellk = cell_of(tk)
            icellk = cellk.astype(jnp.int32)
            same_block = ((icellk[:, 0] >> 2) == bx) \
                & ((icellk[:, 1] >> 2) == by) \
                & ((icellk[:, 2] >> 2) == bz)
            stepk = probing & box_hit & same_block & (tk < t_far) \
                & (tk < t_out)
            rank = ((icellk[:, 0] & 3) + 4 * (icellk[:, 1] & 3)
                    + 16 * (icellk[:, 2] & 3)).astype(jnp.uint32)
            hi_word = rank >= 32
            sh = jnp.where(hi_word, rank - 32, rank)
            word = jnp.where(hi_word, mhi, mlo)
            bit = ((word >> sh) & 1).astype(jnp.bool_)
            below = (jnp.uint32(1) << sh) - 1
            below_lo = jnp.where(hi_word, mlo, mlo & below)
            below_hi = jnp.where(hi_word, mhi & below, 0)
            nb = (jax.lax.population_count(below_lo)
                  + jax.lax.population_count(below_hi)).astype(jnp.int32)
            slot = base + nb
            tex = cell_exit(cellk, tk)
            can_take = ck < m_slots
            take = stepk & bit & can_take
            put = take[:, None] & (ck[:, None] == miota[None])
            sl = jnp.where(put, slot[:, None], sl)
            te = jnp.where(put, tk[:, None], te)
            tx = jnp.where(put, tex[:, None], tx)
            ck = ck + take.astype(jnp.int32)
            advance = stepk & (~bit | take)
            tk = jnp.where(advance, tex, tk)

        # Past the sub-box (or never in it): skip to the block exit.
        t_occ = jnp.where(box_hit & (tk < t_out), tk,
                          jnp.maximum(t_bex, tk))
        t_new = jnp.where(probing,
                          jnp.where(occ_block, t_occ, t_jump), t_)
        return (t_new, ck, sl, te, tx, it + 1)

    probe_floor = jnp.int32(max(int(r * exit_frac), 0))

    def cond(carry):
        t_, count, _, _, _, it = carry
        probing = (t_ < t_far) & (count < m_slots)
        return (it < a_max) & (jnp.sum(probing.astype(jnp.int32))
                               > probe_floor)

    # Carry inits derive from the ray arrays (not fresh constants) so
    # their device-variance matches the body outputs under shard_map
    # (while_loop carries must agree; parallel/spatial.py runs this
    # marcher inside the slab ring).
    zero_f = origins[:, 0] * 0.0
    zero_i = zero_f.astype(jnp.int32)
    slots0 = jnp.repeat(zero_i[:, None], m_slots, axis=1)
    tz = jnp.repeat(zero_f[:, None], m_slots, axis=1)
    t0 = jnp.where(alive, t, t_far)     # dead rays never probe
    carry = (t0, zero_i, slots0, tz, tz, jnp.int32(0))
    t_new, count, slots, t_ent, t_exd, _ = jax.lax.while_loop(
        cond, body, carry)
    paused = (t_new < t_far) & alive
    return slots, t_ent, t_exd, count, jnp.where(alive, t_new, t), paused


def _phase_b(accel: GridAccel, origins, dirs, settings: RenderSettings,
             slots, t_ent, t_exd, count, trans, acc, alive,
             with_features: bool, t_cap=None):
    """Composite the recorded occupied cells front-to-back, FLAT.

    Mirrors the round-3 heavy-step math exactly (slab-owned peaks,
    O(Kc^2) within-cell ordering) but evaluates ALL (ray, slot) pairs in
    one dense pass: one (R*M)-row fused packet gather, per-slab
    quantities reduced to (R, M), then an exclusive transmittance
    cumprod across the M slots (M is small). No while loop — the loop
    version bills every lane the BATCH-max slot count per iteration plus
    per-iteration dispatch overhead; the flat form is pure pipelined
    dataflow (measured faster despite gathering all M rows). Slots past
    transmittance saturation contribute through a ~0 carried
    transmittance exactly like the dense oracle. Returns
    (trans, acc, alive)."""
    r, m_slots = slots.shape
    kc = accel.max_per_cell
    cut = float(np.exp(-0.5 * settings.sigma_cut * settings.sigma_cut))
    table = accel.packet if with_features else accel.geom
    miota = jnp.arange(m_slots)
    valid_m = alive[:, None] & (miota[None] < count[:, None])   # (R, M)
    srow = jnp.where(valid_m, slots, 0).reshape(-1)
    # GSPT_B_PIN=1 pins the gathered block so XLA materializes it ONCE
    # instead of (potentially) re-fusing the gather into each of the
    # ~25 column consumers. The r4 OOM dead-end was at FULL batch width;
    # per-chunk V is b_bytes-bounded, so the pinned transient is ~2 GB.
    g = table[srow]                                 # (V, C*Kc), V = R*M
    if _B_PIN:
        g = jax.lax.optimization_barrier(g)

    def gc(c):
        return g[:, c * kc:(c + 1) * kc]            # (V, Kc)

    def rep(x):                                      # (R,) -> (V, 1)
        return jnp.broadcast_to(x[:, None], (r, m_slots)).reshape(-1, 1)

    dx, dy, dz = rep(dirs[:, 0]), rep(dirs[:, 1]), rep(dirs[:, 2])
    ox, oy, oz = rep(origins[:, 0]), rep(origins[:, 1]), rep(origins[:, 2])
    t0 = t_ent.reshape(-1, 1)
    t1 = t_exd.reshape(-1, 1)

    mx, my, mz = gc(6), gc(7), gc(8)
    ogx, ogy, ogz = ox - mx, oy - my, oz - mz
    q00, q11, q22 = gc(0), gc(1), gc(2)
    q01, q02, q12 = gc(3), gc(4), gc(5)
    a_q = (dx * dx * q00 + dy * dy * q11 + dz * dz * q22
           + 2.0 * (dx * dy * q01 + dx * dz * q02 + dy * dz * q12))
    a_q = jnp.maximum(a_q, 1e-12)
    wx = q00 * ogx + q01 * ogy + q02 * ogz
    wy = q01 * ogx + q11 * ogy + q12 * ogz
    wz = q02 * ogx + q12 * ogy + q22 * ogz
    b_q = dx * wx + dy * wy + dz * wz
    c_q = wx * ogx + wy * ogy + wz * ogz
    peak = -b_q / a_q
    t_peak = jnp.clip(peak, settings.t_min, settings.t_max)
    # For shadow segments, respond at the peak clamped into the
    # remaining segment (segment_transmittance_alpha semantics).
    if t_cap is not None:
        t_resp = jnp.clip(peak, jnp.maximum(t0, settings.t_min),
                          rep(t_cap))
    else:
        t_resp = t_peak
    qv = (a_q * t_resp + 2.0 * b_q) * t_resp + c_q
    gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
    opac = gc(_G_OPAC)
    a0 = opac * gval
    live = (gval >= cut) & (a0 >= settings.alpha_min) \
        if t_cap is None else (a0 >= settings.alpha_min)
    alpha = jnp.where(live, jnp.minimum(a0, settings.alpha_max), 0.0)
    # Exactly one slab owns each peak: [t0, t1) half-open.
    in_slab = (t_peak >= t0) & (t_peak < t1)
    valid = (opac > 0.0) & valid_m.reshape(-1, 1) & in_slab
    alpha = jnp.where(valid, alpha, 0.0)
    cell_trans = jnp.prod(1.0 - alpha, axis=-1).reshape(r, m_slots)

    # Exclusive cumprod of cell transmittances across the M slots:
    # T_m = trans * prod_{j<m} ct_j (M is small; static unroll).
    excl_slots = [jnp.ones((r,))]
    for m in range(1, m_slots):
        excl_slots.append(excl_slots[-1] * cell_trans[:, m - 1])
    t_entry_slots = trans[:, None] * jnp.stack(excl_slots, -1)  # (R, M)
    trans_new = t_entry_slots[:, -1] * cell_trans[:, -1]

    if with_features:
        excl = _ordered_weights(t_peak, alpha)       # (V, Kc)
        w = t_entry_slots.reshape(-1, 1) * excl * alpha
        ax, ay, az = gc(_P_AXIS), gc(_P_AXIS + 1), gc(_P_AXIS + 2)
        sgn = jnp.where(ax * dx + ay * dy + az * dz > 0, -1.0, 1.0)
        deg1 = accel.pkt_cols >= PKT_COLS_DEG1

        def tot(wcol):                               # (V, Kc) -> (R,)
            return jnp.sum(jnp.sum(wcol, -1).reshape(r, m_slots), -1)

        upd = {}
        for ch, key in enumerate(("col_r", "col_g", "col_b")):
            col = gc(_P_DC + ch) + 0.5
            if deg1:
                col = (col + dy * gc(_P_BY + ch)
                       + dz * gc(_P_BY + 3 + ch)
                       + dx * gc(_P_BY + 6 + ch))
            col = jnp.maximum(col, 0.0)
            upd[key] = tot(w * col)
        for ch, key in enumerate(("emi_r", "emi_g", "emi_b")):
            upd[key] = tot(w * gc(_P_EMI + ch))
        for name, c in (("met", _P_MET), ("rough", _P_ROUGH),
                        ("cc", _P_CC), ("ccr", _P_CCR),
                        ("trn", _P_TRN)):
            upd[name] = tot(w * gc(c))
        upd["nx"] = tot(w * ax * sgn)
        upd["ny"] = tot(w * ay * sgn)
        upd["nz"] = tot(w * az * sgn)
        upd["tsum"] = tot(w * t_peak)
        acc = {k: acc[k] + upd[k] for k in _ACC_KEYS}
    alive = alive & (trans_new > settings.transmittance_min)
    return trans_new, acc, alive


import os as _os

# Phase-B transient budget: bounds ONE chunk's gathered packet block.
# Overridable for measurement (benchmarks/sweep_bbytes.py).
_B_BYTES = float(_os.environ.get("GSPT_B_BYTES", 2.0e9))
# Phase-B slot-group width: slots are consumed _B_GROUP at a time with a
# per-chunk cond skip between groups (saturated chunks stop gathering).
# Measured on the flagship trace (sweep_bbytes r5): group=4 is ~6%
# SLOWER than no split (chunk-granularity saturation is too coarse to
# skip), so the default keeps the original single-group behavior.
_B_GROUP = int(_os.environ.get("GSPT_B_GROUP", 8))
# GSPT_B_PIN=1: materialize each chunk's gathered packet block once.
_B_PIN = int(_os.environ.get("GSPT_B_PIN", "0"))
# Smallest phase-B chunk (rays); sweep floor for GSPT_B_BYTES.
_B_SUB_MIN = int(_os.environ.get("GSPT_B_SUB_MIN", "4096"))


def _march_round(accel, origins, dirs, settings, setup, state,
                 with_features, m_slots, a_max, t_cap,
                 a_exit: float = 0.0, b_exit: float = 0.0,
                 b_bytes: float = None):
    """One A+B round over a (sub-)batch, mutating the state dict.

    Phase B is flat over (ray, slot) pairs; its transient gather output
    is bounded to ``b_bytes`` (default module _B_BYTES) by
    python-chunking the batch (pure dataflow — no while loop, so chunks
    pipeline freely). ``b_exit`` is accepted for schedule compatibility
    and unused (flat B always consumes every recorded slot)."""
    if b_bytes is None:
        b_bytes = _B_BYTES
    del b_exit

    def _run(state):
        t, trans, alive = state["t"], state["trans"], state["alive"]
        t_far = state["t_far"]
        slots, t_ent, t_exd, count, t_new, paused = _phase_a(
            accel, origins, dirs, setup, t, alive, t_far, m_slots, a_max,
            a_exit)
        r = origins.shape[0]
        table = accel.packet if with_features else accel.geom
        b_sub = int(b_bytes / max(m_slots * table.shape[1] * 4, 1))
        b_sub = max(_B_SUB_MIN, -(-b_sub // 256) * 256)
        acc0 = state.get("acc")

        def chunk_b(o_c, d_c, sl_c, te_c, tx_c, ct_c, tr_c, acc_c, al_c,
                    tc_c):
            # A chunk whose rays are all dead or slotless is an exact
            # no-op in phase B (no valid pairs -> cell_trans == 1,
            # alive unchanged): lax.cond skips its multi-hundred-MB
            # gather at runtime. With dead-last presorting the trailing
            # chunks of sparse-active marches (NEE shadows, late
            # bounces) all take the skip branch — this is what makes
            # march cost proportional to the live fraction.
            # INVARIANT the skip branch relies on (ADVICE r4): alive
            # implies trans > settings.transmittance_min — trans is
            # seeded to 1.0 and every phase B ends with alive &=
            # (trans > transmittance_min), so returning (tr_c, acc_c,
            # al_c) unchanged is exact for a slotless chunk. If state
            # seeding ever changes, a ray entering with trans below the
            # cutoff would stay alive here where _phase_b would kill it.
            # NOTE: these lax.conds only give a runtime skip when traced
            # unbatched; under vmap they lower to select and BOTH
            # branches execute (correct, but the live-fraction cost
            # model no longer holds).
            # Slot-GROUP split (r5): most rays saturate within the
            # first few occupied cells (census p50 = 3), so the slots
            # are consumed in groups of _B_GROUP with the same cond
            # skip per group — a chunk whose rays all saturated (or
            # recorded <= g0 cells) skips the remaining groups' packet
            # gathers entirely. Exact: _phase_b chains (trans, acc,
            # alive) across groups and the skip invariant above covers
            # saturation (alive => trans > transmittance_min).
            for g0 in range(0, m_slots, _B_GROUP):
                g1 = min(g0 + _B_GROUP, m_slots)
                ct_g = jnp.clip(ct_c - g0, 0, g1 - g0)
                pred = jnp.any(al_c & (ct_g > 0))
                tr_c, acc_c, al_c = jax.lax.cond(
                    pred,
                    lambda g0=g0, g1=g1, ct_g=ct_g, tr_c=tr_c,
                    acc_c=acc_c, al_c=al_c: _phase_b(
                        accel, o_c, d_c, settings, sl_c[:, g0:g1],
                        te_c[:, g0:g1], tx_c[:, g0:g1], ct_g, tr_c,
                        acc_c, al_c, with_features, tc_c),
                    lambda tr_c=tr_c, acc_c=acc_c, al_c=al_c:
                    (tr_c, acc_c, al_c))
            return tr_c, acc_c, al_c

        if r <= b_sub:
            trans, acc, alive_b = chunk_b(
                origins, dirs, slots, t_ent, t_exd, count, trans, acc0,
                alive, t_cap)
        else:
            parts = []
            tok = trans[:1]
            for s_ in range(0, r, b_sub):
                e = min(s_ + b_sub, r)
                sl = lambda x, s_=s_, e=e: x[s_:e]
                # Chain chunks through a barrier on EVERY sliced input
                # (the gather depends on slots, so chaining trans alone
                # lets XLA hoist all chunk gathers and OOM HBM with
                # their multi-GB transients).
                sl_slots, sl_te, sl_tx, tr_in, tok = \
                    jax.lax.optimization_barrier(
                        (slots[s_:e], t_ent[s_:e], t_exd[s_:e],
                         trans[s_:e], tok))
                parts.append(chunk_b(
                    origins[s_:e], dirs[s_:e],
                    sl_slots, sl_te, sl_tx, count[s_:e],
                    tr_in, None if acc0 is None else
                    jax.tree.map(sl, acc0), alive[s_:e],
                    None if t_cap is None else t_cap[s_:e]))
                tok = parts[-1][0][:1]
            trans, acc, alive_b = jax.tree.map(
                lambda *xs: jnp.concatenate(xs), *parts)
        # A ray survives the round iff it paused in A (slots full or
        # traversal unfinished) AND phase B did not saturate it.
        alive = paused & alive_b
        state = dict(state, t=t_new, trans=trans, alive=alive)
        if with_features:
            state["acc"] = acc
        return state

    # An all-dead (sub-)batch skips the whole round (phase A's while
    # loop would exit after one btab gather; the cond skips even that).
    return jax.lax.cond(jnp.any(state["alive"]), _run,
                        lambda s: dict(s), state)


def _interleave_bits(v):
    """Spread the low 10 bits of v (uint32) to every 3rd bit position."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def _sort_key(origins, dirs, t, alive, accel):
    """Dead-last, then morton-of-current-position + direction octant."""
    p = origins + t[:, None] * dirs
    ext = jnp.maximum(accel.hi - accel.lo, 1e-12)
    q = jnp.clip((p - accel.lo[None]) / ext[None] * 127.0, 0.0, 127.0)
    qi = q.astype(jnp.uint32)
    morton = (_interleave_bits(qi[:, 0])
              | (_interleave_bits(qi[:, 1]) << 1)
              | (_interleave_bits(qi[:, 2]) << 2))
    octant = ((dirs[:, 0] >= 0).astype(jnp.uint32)
              | ((dirs[:, 1] >= 0).astype(jnp.uint32) << 1)
              | ((dirs[:, 2] >= 0).astype(jnp.uint32) << 2))
    key = (morton << 3) | octant
    return jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))


_STATE_KEYS = ("t", "trans", "t_far")


def _pack_acc(acc):
    return jnp.stack([acc[k] for k in _ACC_KEYS], axis=-1)  # (R, 15)


def _unpack_acc(packed):
    return {k: packed[:, i] for i, k in enumerate(_ACC_KEYS)}


def _march(accel: GridAccel, origins, dirs, settings: RenderSettings,
           max_steps: int, t_end=None, with_features: bool = True,
           active=None, schedule=_DEFAULT_SCHEDULE,
           sub_rays: int = _SUB_RAYS,
           compact_min: int = _COMPACT_MIN_RAYS):
    """Core grid march: (trans (R,), acc dict | None, frozen (scalar)).

    ``active`` (R,) bool optionally pre-kills rays; ``max_steps`` bounds
    the total occupied-cell composites per ray (the schedule is clipped
    to it). ``frozen`` counts rays still alive when the schedule ends —
    their accumulation is partial (reported, never silent).
    """
    r = origins.shape[0]
    setup = _ray_setup(origins, dirs, accel, settings.t_min)
    t_far = setup["t_far"] if t_end is None \
        else jnp.minimum(setup["t_far"], t_end)
    t_cap = None if t_end is None else t_end
    alive0 = setup["inside"] if active is None \
        else setup["inside"] & active
    # ones/zeros derived from the rays: see _phase_a carry-init note.
    one_r = origins[:, 0] * 0.0 + 1.0
    state = dict(t=setup["t_entry"], trans=one_r,
                 alive=alive0, t_far=t_far)
    if with_features:
        state["acc"] = {k: one_r * 0.0 for k in _ACC_KEYS}

    # Clip the schedule to the max_steps occupied-composite budget.
    # Entries are (frac, M, a_max) or (frac, M, a_max, a_exit, b_exit);
    # the last effective round always runs its phases to completion.
    rounds = []
    budget = max_steps
    for entry in schedule:
        frac, m, a_max = entry[:3]
        a_exit, b_exit = (entry[3], entry[4]) if len(entry) > 4 \
            else (0.0, 0.0)
        if budget <= 0:
            break
        m = min(m, budget)
        budget -= m
        rounds.append((frac, m, a_max, a_exit, b_exit))
    if rounds:
        frac, m, a_max, _, _ = rounds[-1]
        rounds[-1] = (frac, m, a_max, 0.0, 0.0)

    if r <= compact_min:
        # Small batches: no sorting, single-batch rounds.
        for _, m, a_max, a_exit, b_exit in rounds:
            state = _march_round(accel, origins, dirs, settings, setup,
                                 state, with_features, m, a_max, t_cap,
                                 a_exit, b_exit)
        frozen = jnp.sum(state["alive"].astype(jnp.int32))
        return state["trans"], state.get("acc"), frozen

    def round_chunked(o, d, st, setup_, m, a_max, tc, a_exit, b_exit):
        """Full-width round split into sub_rays-sized independent
        while_loops (python unroll, NOT lax.map — see module notes)."""
        if o.shape[0] <= sub_rays:
            return _march_round(accel, o, d, settings, setup_, st,
                                with_features, m, a_max, tc,
                                a_exit, b_exit)
        r0 = o.shape[0]
        outs = []
        for s in range(0, r0, sub_rays):
            e = min(s + sub_rays, r0)
            sl = lambda x, s=s, e=e: (
                x[s:e] if getattr(x, "ndim", 0) and x.shape[0] == r0
                else x)
            outs.append(_march_round(
                accel, o[s:e], d[s:e], settings,
                jax.tree.map(sl, setup_), jax.tree.map(sl, st),
                with_features, m, a_max,
                None if tc is None else tc[s:e], a_exit, b_exit))
        return jax.tree.map(
            lambda *xs: (xs[0] if getattr(xs[0], "ndim", 0) == 0
                         else jnp.concatenate(xs)), *outs)

    # Round 0: full width (optionally pre-sorted when a sparse active
    # mask was given — dead-last ordering lets sub-batches exit early).
    # Data movement discipline: every reorder moves ONE packed (R, 8/16)
    # f32 matrix (single row gather) and the ray-grid setup is RECOMPUTED
    # on the reordered rays — permuting ~25 separate (R,) arrays costs
    # ~23 ms EACH at 2.1M rays (large-table element gathers), several
    # hundred ms per march.
    frac0, m0, a0, ax0, bx0 = rounds[0]
    presort = active is not None
    if presort:
        key0 = _sort_key(origins, dirs, state["t"], state["alive"], accel)
        perm = jnp.argsort(key0)
        cols = [origins, dirs, alive0.astype(jnp.float32)[:, None]]
        if t_end is not None:
            cols.append(t_end[:, None])
        packed = jnp.concatenate(cols, axis=-1)[perm]
        origins_s, dirs_s = packed[:, 0:3], packed[:, 3:6]
        active_s = packed[:, 6] > 0.5
        t_cap_s = packed[:, 7] if t_end is not None else None
        setup_s = _ray_setup(origins_s, dirs_s, accel, settings.t_min)
        t_far_s = setup_s["t_far"] if t_cap_s is None \
            else jnp.minimum(setup_s["t_far"], t_cap_s)
        state = dict(t=setup_s["t_entry"], trans=jnp.ones((r,)),
                     alive=setup_s["inside"] & active_s, t_far=t_far_s)
        if with_features:
            state["acc"] = {k: jnp.zeros((r,)) for k in _ACC_KEYS}
    else:
        perm = None
        origins_s, dirs_s, setup_s, t_cap_s = origins, dirs, setup, t_cap
    state = round_chunked(origins_s, dirs_s, state, setup_s, m0, a0,
                          t_cap_s, ax0, bx0)

    # Later rounds: compact survivors to a shrinking static capacity.
    acc_packed = _pack_acc(state["acc"]) if with_features else None
    t_cur, trans_cur, alive_cur = (state["t"], state["trans"],
                                   state["alive"])
    t_far_all = state["t_far"]
    for frac, m, a_max, a_exit, b_exit in rounds[1:]:
        cap = max(-(-int(r * frac) // 256) * 256, 4096)
        if cap >= r:
            st = dict(t=t_cur, trans=trans_cur, alive=alive_cur,
                      t_far=t_far_all)
            if with_features:
                st["acc"] = _unpack_acc(jnp.zeros_like(acc_packed))
            st = round_chunked(origins_s, dirs_s, st, setup_s, m, a_max,
                               t_cap_s, a_exit, b_exit)
            t_cur, trans_cur, alive_cur = st["t"], st["trans"], st["alive"]
            if with_features:
                acc_packed = acc_packed + _pack_acc(st["acc"])
            continue
        key = _sort_key(origins_s, dirs_s, t_cur, alive_cur, accel)
        sel = jnp.argsort(key)[:cap]
        cols = [origins_s, dirs_s, t_cur[:, None], trans_cur[:, None]]
        if t_cap_s is not None:
            cols.append(t_cap_s[:, None])
        pk = jnp.concatenate(cols, axis=-1)[sel]
        o_c, d_c = pk[:, 0:3], pk[:, 3:6]
        tc_c = pk[:, 8] if t_cap_s is not None else None
        setup_c = _ray_setup(o_c, d_c, accel, settings.t_min)
        t_far_c = setup_c["t_far"] if tc_c is None \
            else jnp.minimum(setup_c["t_far"], tc_c)
        st = dict(t=pk[:, 6], trans=pk[:, 7], alive=alive_cur[sel],
                  t_far=t_far_c)
        if with_features:
            st["acc"] = {k: jnp.zeros((cap,)) for k in _ACC_KEYS}
        st = round_chunked(o_c, d_c, st, setup_c, m, a_max, tc_c,
                           a_exit, b_exit)
        t_cur = t_cur.at[sel].set(st["t"])
        trans_cur = trans_cur.at[sel].set(st["trans"])
        alive_cur = alive_cur.at[sel].set(st["alive"])
        if with_features:
            acc_packed = acc_packed.at[sel].add(_pack_acc(st["acc"]))

    frozen = jnp.sum(alive_cur.astype(jnp.int32))
    if perm is not None:
        inv = jnp.argsort(perm)
        if with_features:
            out_pk = jnp.concatenate(
                [trans_cur[:, None], acc_packed], axis=-1)[inv]
            trans_cur = out_pk[:, 0]
            acc_packed = out_pk[:, 1:]
        else:
            trans_cur = trans_cur[inv]
    acc = _unpack_acc(acc_packed) if with_features else None
    return trans_cur, acc, frozen


@functools.partial(jax.jit, static_argnames=("settings", "max_steps",
                                             "jump_steps", "sub_rays",
                                             "compact_min", "schedule"))
def trace_grid(scene: GaussianScene, rays: Rays, settings: RenderSettings,
               accel: GridAccel, max_steps: int = 128,
               jump_steps: int = 1, active=None,
               sub_rays: int = _SUB_RAYS,
               compact_min: int = _COMPACT_MIN_RAYS,
               schedule=_DEFAULT_SCHEDULE):
    """Aggregate surface interaction via the grid (trace_dense-compatible).

    ``scene`` is accepted for interface parity with trace_dense but the
    march reads only the pre-packed ``accel`` tables (bounce color is SH
    truncated to degree <= 1) — this backend is INFERENCE-ONLY w.r.t.
    scene parameters (see module docstring). ``jump_steps`` is accepted
    for API compatibility and ignored (v3 jumps ride the block table).
    The returned dict carries ``frozen_alive``: the number of rays still
    alive when the march schedule ended (their accumulation is partial).
    """
    del scene, jump_steps
    trans, acc, frozen = _march(
        accel, rays.origins, rays.directions, settings, max_steps,
        with_features=True, active=active, schedule=schedule,
        sub_rays=sub_rays, compact_min=compact_min)
    alpha_acc = 1.0 - trans
    denom = jnp.maximum(alpha_acc, 1e-8)
    depth = acc["tsum"] / denom
    position = rays.origins + depth[:, None] * rays.directions
    normal = jnp.stack([acc["nx"], acc["ny"], acc["nz"]], -1)
    return dict(
        radiance_emitted=jnp.stack(
            [acc["emi_r"], acc["emi_g"], acc["emi_b"]], -1),
        albedo=jnp.stack([acc["col_r"], acc["col_g"], acc["col_b"]], -1),
        normal=safe_normalize(normal),
        position=position,
        depth=depth,
        metallic=acc["met"] / denom,
        roughness=acc["rough"] / denom,
        clearcoat=acc["cc"] / denom,
        cc_roughness=acc["ccr"] / denom,
        transmission=acc["trn"] / denom,
        alpha_acc=alpha_acc,
        trans=trans,
        hit=alpha_acc > settings.hit_opacity_threshold,
        frozen_alive=frozen,
    )


@functools.partial(jax.jit, static_argnames=("settings", "max_steps",
                                             "jump_steps", "sub_rays",
                                             "compact_min", "schedule",
                                             "return_frozen"))
def visibility_grid(scene: GaussianScene, accel: GridAccel, origins,
                    directions, t_end, settings: RenderSettings,
                    max_steps: int = 128, jump_steps: int = 1,
                    active=None, sub_rays: int = _SUB_RAYS,
                    compact_min: int = _COMPACT_MIN_RAYS,
                    schedule=_DEFAULT_SCHEDULE,
                    return_frozen: bool = False):
    """Shadow-ray transmittance via the grid (visibility_dense analog).

    Rays masked off by ``active`` return transmittance 1. With
    ``return_frozen`` also returns the frozen-alive count (see
    :func:`trace_grid`)."""
    del scene, jump_steps
    trans, _, frozen = _march(
        accel, origins, directions, settings, max_steps, t_end=t_end,
        with_features=False, active=active, schedule=schedule,
        sub_rays=sub_rays, compact_min=compact_min)
    if return_frozen:
        return trans, frozen
    return trans
