"""Pallas TPU kernel: fused per-tile ray-Gaussian compositing (v2).

This is the hot forward kernel (the role of raygen_camera.rgen +
closesthit.rchit's hit loop on the GPU — one vkCmdTraceRaysKHR dispatch
covers all pixels, engine.cpp:1971-1976). For a tile with P pixels and K
depth-sorted Gaussians:

    q_pk(t) = a_pk t^2 + 2 b_pk t + c_k          (ray-Gaussian quadratic)
    a_pk = d_p^T Q_k d_p,  b_pk = d_p^T Q_k (o-mu_k),
    c_k  = (o-mu_k)^T Q_k (o-mu_k)               (precomputed per Gaussian)

with Q_k = M_k^T M_k the world-space inverse covariance. alpha =
opacity * exp(-q(t*)/2) with cutoffs, exclusive transmittance by a
cumulative *product* scan of (1-alpha) along K, and the feature composite
out(P,F) = W(P,K) @ feats(K,F) on the MXU.

v2 design notes (what changed from the round-1 kernel and why — the
round-1 version ran one tile per grid step and was launch-overhead bound
at ~6 us/step, ~1-2% MFU):

  * MANY TILES PER GRID STEP (``block_tiles``): the per-step pipeline
    overhead (DMA descriptor setup per stream) is amortized across a
    static in-kernel loop over tiles.
  * STREAM LAYOUTS: per-Gaussian streams keep a >=128 minor dim — geom
    (T,16,K) packs [q6(6), Q(o-mu)(3), c, opac] as rows and features ride
    channel-major (T,F,K). Per-PIXEL streams (dirs (T,P,3), out
    (T,P,F+2)) keep their tiny minor dim instead: their VMEM blocks pad
    to 128 lanes (~131 KB/tile/stream, bounded by block_tiles=8), which
    measured far cheaper than transposing to lane-packed form in-kernel —
    Mosaic lowers an (8,256) relayout at ~1.2 us/tile, 3x the whole rest
    of the tile's compute.
  * EXACT-F32 QUADRATICS ON THE VPU: a and b are built from 9
    rank-1 broadcast FMAs ((P,1) x (1,K)) instead of MXU matmuls — the
    Mosaic MXU truncates f32 operands to bf16 (Precision.HIGH is
    unsupported; HIGHEST costs 6 passes), and exp(quadratic) amplifies
    that error catastrophically. Only the final W @ feats composite (bf16-
    safe magnitudes) uses the MXU, at HIGHEST.
  * K-CHUNKED EARLY TERMINATION: K is processed in chunks of 128 carrying
    per-pixel transmittance; a chunk is skipped (pl.when) once every
    pixel's transmittance falls below settings.transmittance_min (the
    front-to-back saturation exit of every 3DGS rasterizer, and the
    ray-termination analog of raygen_camera.rgen's RR) or once the chunk
    start passes the tile's binned count (empty/sparse tiles cost ~0).
  * PRODUCT-SPACE COMPOSITING: exclusive cumprod of (1-alpha) via a
    Hillis-Steele scan of multiplies — log1p/exp per element (round 1's
    log-space scan) bought nothing numerically at alpha <= 0.999 and cost
    two transcendentals per (P,K) element.

The packet layout is built once per (scene, pose) by
:func:`build_tile_packets` from the binning tables (ops/binning.py).

Differentiation: the custom VJP lives on the *packed* form
(:func:`_packed_composite`); the public :func:`tile_composite` is plain
XLA (transposes/slices) around it, so cotangents for the unpacked outputs
assemble automatically. The backward is a second fused Pallas kernel
(:func:`_bwd_kernel`): it recomputes the forward per tile in VMEM and
applies the analytic compositing VJP (suffix-sum form), so no (T,P,K)
residual ever lands in HBM. Both kernels are allclose-tested against the
pure-JAX reference semantics (:func:`_tile_composite_xla`, itself tested
against render/tiled.tile_composite_reference) and its jax.vjp in
interpret mode.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, RenderSettings
from pathtracer_gaussiansplatting_tpu.ops.quaternions import rotmat_cols

# Geometry packet row indices (geom (T, 16, K)).
_ROWS_Q6 = slice(0, 6)      # Q upper triangle [q00,q11,q22, 2q01,2q02,2q12]
_ROWS_WB = slice(6, 9)      # Q (o - mu)
_ROW_C = 9                  # (o-mu)^T Q (o-mu)
_ROW_OPAC = 10              # opacity (0 where masked)
GEOM_ROWS = 16              # padded to a multiple of 8 sublanes


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_tile_packets(scene: GaussianScene, feats_all, origin, tile_idx,
                       tile_mask):
    """Gather per-tile Gaussian packets for the kernel.

    Args:
      scene: the full scene; feats_all: (N, F) per-Gaussian features
        (render/tiled._packet_features); origin: (3,) camera position;
      tile_idx/tile_mask: (T, K) binning tables.

    Returns dict of arrays:
      geom:   (T, 16, K) packed rows (see _ROWS_* above).
      featsT: (T, F, K) per-Gaussian features, channel-major.
      count:  (T,) f32 — 1 + index of the last valid slot (chunk skipping).
    """
    # Structure-of-arrays construction: every intermediate is an (N,)
    # column, so the TPU lane dimension is N. The former (N,3,3) einsum
    # path (canonical_transforms + M^T M) kept the 3-wide geometry axes
    # minor — 3/128 lane occupancy — and measured ~65 ms/pose at 1M
    # Gaussians; these scalar formulas are the same math as pure
    # elementwise (N,) work. Q = R diag(exp(-2*log_s)) R^T with R the
    # (w,x,y,z) quaternion rotation (ops/quaternions.quat_to_rotmat).
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rotmat_cols(scene.quats)
    d0 = jnp.exp(-2.0 * scene.log_scales[:, 0])
    d1 = jnp.exp(-2.0 * scene.log_scales[:, 1])
    d2 = jnp.exp(-2.0 * scene.log_scales[:, 2])
    q00 = r00 * r00 * d0 + r01 * r01 * d1 + r02 * r02 * d2
    q11 = r10 * r10 * d0 + r11 * r11 * d1 + r12 * r12 * d2
    q22 = r20 * r20 * d0 + r21 * r21 * d1 + r22 * r22 * d2
    q01 = r00 * r10 * d0 + r01 * r11 * d1 + r02 * r12 * d2
    q02 = r00 * r20 * d0 + r01 * r21 * d1 + r02 * r22 * d2
    q12 = r10 * r20 * d0 + r11 * r21 * d1 + r12 * r22 * d2
    ogx = origin[0] - scene.means[:, 0]
    ogy = origin[1] - scene.means[:, 1]
    ogz = origin[2] - scene.means[:, 2]
    wb0 = q00 * ogx + q01 * ogy + q02 * ogz
    wb1 = q01 * ogx + q11 * ogy + q12 * ogz
    wb2 = q02 * ogx + q12 * ogy + q22 * ogz
    c_all = wb0 * ogx + wb1 * ogy + wb2 * ogz

    # ONE row-major table + one gather (vs five separate gathers — the
    # gather pass is a measurable fraction of frame time at 1M Gaussians).
    # The table is padded to 128 columns: XLA's row gather hits a fast path
    # at full-lane (512 B) rows — measured 10 ms vs 27 ms for 25-column
    # rows at 640k gathered rows, despite moving 5x the bytes.
    f = feats_all.shape[-1]
    cols = [q00, q11, q22, 2.0 * q01, 2.0 * q02, 2.0 * q12,
            wb0, wb1, wb2, c_all, scene.opacities]
    table = jnp.concatenate(
        [jnp.stack(cols, axis=-1), feats_all], axis=-1)  # (N, 11+F)
    rows = _gather_rows_pad128(table, tile_idx)   # (T, K, 11+F)
    opac = jnp.where(tile_mask, rows[..., _ROW_OPAC], 0.0)
    geom = jnp.concatenate(
        [rows[..., :_ROW_OPAC], opac[..., None]], axis=-1)  # (T, K, 11)
    geom = jnp.swapaxes(geom, 1, 2)                          # (T, 11, K)
    geom = jnp.pad(geom, ((0, 0), (0, GEOM_ROWS - 11), (0, 0)))
    featsT = jnp.swapaxes(rows[..., 11:11 + f], 1, 2)        # (T, F, K)
    # Last valid slot + 1 (robust to non-contiguous masks), for chunk skip.
    k = tile_mask.shape[-1]
    slot1 = jnp.arange(1, k + 1, dtype=jnp.float32)
    count = jnp.max(jnp.where(tile_mask, slot1[None, :], 0.0), axis=-1)
    return dict(geom=geom, featsT=featsT, count=count)


def _gather_rows_pad128(table, idx):
    """Row gather through a 128-col pad (fast-path rows).

    Plain autodiff on purpose: its backward scatter-adds 128-col rows,
    and MEASURED (benchmarks/profile_bwd.py, r5) that is the FAST form —
    (N,128) scatter 16.3 ms vs (N,32) narrow scatter 86.4 ms vs
    argsort+segment_sum 105 ms at the bench shapes. Narrow rows hit the
    same slow path scattering as they do gathering; don't "optimize"
    this into a width-exact custom VJP again."""
    width = table.shape[-1]
    padded = table if width >= 128 else jnp.pad(
        table, ((0, 0), (0, 128 - width)))
    return padded[idx][..., :width]


def _cumprod_excl(x):
    """Exclusive cumprod along the last axis (Hillis-Steele doubling).

    Mosaic has no scan primitive; log2(K) masked shift-multiplies are pure
    VPU work and lower cleanly (the XLA oracle path uses the identical
    expansion, keeping both paths numerically identical)."""
    k = x.shape[-1]
    ones = jnp.ones_like(x)
    y = jnp.concatenate([ones[..., :1], x[..., :-1]], axis=-1)
    shift = 1
    while shift < k:
        y = y * jnp.concatenate([ones[..., :shift], y[..., :-shift]],
                                axis=-1)
        shift *= 2
    return y


def _suffix_sum_last(x):
    """Inclusive suffix sum along the last axis (reverse Hillis-Steele)."""
    k = x.shape[-1]
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < k:
        x = x + jnp.concatenate([x[..., shift:], zeros[..., :shift]],
                                axis=-1)
        shift *= 2
    return x


def _dir_cols(dpt):
    """(P, 3) dir block -> the 9 per-pixel columns
    [dx, dy, dz, dx2, dy2, dz2, dxdy, dxdz, dydz], each (P, 1)."""
    dx, dy, dz = dpt[:, 0:1], dpt[:, 1:2], dpt[:, 2:3]
    return (dx, dy, dz, dx * dx, dy * dy, dz * dz,
            dx * dy, dx * dz, dy * dz)


def _quadratic_ab(cols, g):
    """a, b fields (P, K) from rank-1 broadcast FMAs (exact f32, no MXU).

    cols: the 9 (P,1) columns of :func:`_dir_cols`; g: (16, K) geom rows."""
    dx, dy, dz, dd0, dd1, dd2, dd3, dd4, dd5 = cols
    a = (dd0 * g[0:1] + dd1 * g[1:2] + dd2 * g[2:3]
         + dd3 * g[3:4] + dd4 * g[4:5] + dd5 * g[5:6])
    b = dx * g[6:7] + dy * g[7:8] + dz * g[8:9]
    return jnp.maximum(a, 1e-12), b


def _alpha_of(a, b, c, opac, settings: RenderSettings):
    """alpha(P,K), peak t(P,K), and auxiliaries shared by fwd and bwd."""
    t_raw = -b / a
    t = jnp.clip(t_raw, settings.t_min, settings.t_max)
    qv = (a * t + 2.0 * b) * t + c
    gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
    alpha0 = opac * gval
    cut = math.exp(-0.5 * settings.sigma_cut * settings.sigma_cut)
    live = (gval >= cut) & (alpha0 >= settings.alpha_min)
    alpha = jnp.where(live, jnp.minimum(alpha0, settings.alpha_max), 0.0)
    return alpha, t, t_raw, qv, gval, alpha0, live


_HI = jax.lax.Precision.HIGHEST


def _dotT(x, y):
    """(P, K) x (F, K) -> (P, F): contract the shared minor (lane) dim."""
    return jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _dotP(x, y):
    """(P, M) x (P, K) -> (M, K): contract the shared major dim."""
    return jax.lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _fwd_kernel(count_ref, dirs_ref, geom_ref, feats_ref, out_ref,
                acc_ref, trans_ref, *, settings, bt, kc, fp, p):
    n_chunks = geom_ref.shape[-1] // kc
    for bi in range(bt):
        cols = _dir_cols(dirs_ref[bi])                     # (P, 3) block
        geom = geom_ref[bi]                                # (16, K)
        feats = feats_ref[bi]                              # (FP, K)
        trans_ref[:] = jnp.ones((p, 1), jnp.float32)
        acc_ref[:] = jnp.zeros((p, fp + 8), jnp.float32)
        for ci in range(n_chunks):
            start = ci * kc
            alive = count_ref[0, 0, bi] > float(start)
            if ci > 0:  # chunk 0 always runs if non-empty; trans starts at 1
                alive &= (jnp.max(trans_ref[:])
                          > settings.transmittance_min)

            @pl.when(alive)
            def _(start=start):
                g = geom[:, start:start + kc]
                a, b = _quadratic_ab(cols, g)
                alpha, t, *_ = _alpha_of(a, b, g[_ROW_C:_ROW_C + 1],
                                         g[_ROW_OPAC:_ROW_OPAC + 1],
                                         settings)
                om = 1.0 - alpha
                excl = _cumprod_excl(om)                   # (P, KC)
                w = trans_ref[:] * excl * alpha
                contrib = _dotT(w, feats[:, start:start + kc])  # (P, FP)
                acc_ref[:, :fp] += contrib
                acc_ref[:, fp:fp + 1] += jnp.sum(w * t, axis=-1,
                                                 keepdims=True)
                trans_ref[:] *= excl[:, kc - 1:kc] * om[:, kc - 1:kc]
        alpha_acc = 1.0 - trans_ref[:]                     # (P, 1)
        depth = acc_ref[:, fp:fp + 1] / jnp.maximum(alpha_acc, 1e-8)
        out_ref[bi] = jnp.concatenate(
            [acc_ref[:, :fp], alpha_acc, depth], axis=-1)  # (P, FP+2)


def _bwd_kernel(count_ref, dirs_ref, geom_ref, feats_ref, cot_ref,
                ddirs_ref, dgeom_ref, dfeats_ref,
                acc_ref, trans_ref, tc_ref, *, settings, bt, kc, fp, p):
    n_chunks = geom_ref.shape[-1] // kc
    for bi in range(bt):
        cols = _dir_cols(dirs_ref[bi])                     # (P, 3) block
        dx, dy, dz = cols[0], cols[1], cols[2]
        g = geom_ref[bi]                                   # (16, K)
        feats = feats_ref[bi]                              # (FP, K)
        cot = cot_ref[bi]                                  # (P, FP+2)
        go = cot[:, :fp]                                   # (P, FP)
        ga = cot[:, fp:fp + 1]                             # (P, 1)
        gd = cot[:, fp + 1:fp + 2]                         # (P, 1)
        mono6 = jnp.concatenate(cols[3:9], axis=-1)        # (P, 6)
        d3 = jnp.concatenate(cols[0:3], axis=-1)           # (P, 3)

        # The forward skips chunks once transmittance saturates (pl.when),
        # so the primal literally does not depend on those chunks' inputs:
        # their exact gradient is zero. Mirror the forward's chunk schedule,
        # write zeros for skipped chunks, and carry the two cross-chunk
        # reductions — entry transmittance (forward order, phase 1) and the
        # suffix sum of d_e (reverse order, phase 2) — as (P, 1) columns.
        dgeom_ref[bi] = jnp.zeros_like(dgeom_ref[bi])
        dfeats_ref[bi] = jnp.zeros_like(dfeats_ref[bi])
        acc_ref[:] = jnp.zeros((p, 8), jnp.float32)  # 0: s_depth, 1: suf
        #                                              2:5: d_dirs acc
        count = count_ref[0, 0, bi]

        # ---- phase 1 (forward order): entry transmittances, s_depth ----
        trans_ref[:] = jnp.ones((p, 1), jnp.float32)
        for ci in range(n_chunks):
            start = ci * kc
            tc_ref[:, ci:ci + 1] = trans_ref[:]
            alive = count > float(start)
            if ci > 0:
                alive &= (jnp.max(trans_ref[:])
                          > settings.transmittance_min)

            @pl.when(alive)
            def _(start=start):
                gc = g[:, start:start + kc]
                a, b = _quadratic_ab(cols, gc)
                alpha, t, *_ = _alpha_of(
                    a, b, gc[_ROW_C:_ROW_C + 1],
                    gc[_ROW_OPAC:_ROW_OPAC + 1], settings)
                om = 1.0 - alpha
                excl = _cumprod_excl(om)
                w = trans_ref[:] * excl * alpha
                acc_ref[:, 0:1] += jnp.sum(w * t, axis=-1, keepdims=True)
                trans_ref[:] *= excl[:, kc - 1:kc] * om[:, kc - 1:kc]

        t_last = trans_ref[:]                              # (P, 1)
        alpha_acc = 1.0 - t_last
        denom = jnp.maximum(alpha_acc, 1e-8)
        s_depth = acc_ref[:, 0:1]
        d_s = gd / denom
        d_alpha_acc = ga + jnp.where(
            alpha_acc > 1e-8, -gd * s_depth / (denom * denom), 0.0)

        # ---- phase 2 (reverse order): per-chunk recompute + VJP ----
        for ci in reversed(range(n_chunks)):
            start = ci * kc
            t_entry = tc_ref[:, ci:ci + 1]                 # (P, 1)
            alive = count > float(start)
            if ci > 0:
                alive &= (jnp.max(t_entry)
                          > settings.transmittance_min)

            @pl.when(alive)
            def _(start=start, ci=ci):
                gc = g[:, start:start + kc]
                a, b = _quadratic_ab(cols, gc)
                c = gc[_ROW_C:_ROW_C + 1]
                opac = gc[_ROW_OPAC:_ROW_OPAC + 1]
                alpha, t, t_raw, qv, gval, alpha0, live = _alpha_of(
                    a, b, c, opac, settings)
                t_in = (t_raw > settings.t_min) & (t_raw < settings.t_max)
                om = 1.0 - alpha
                t_entry_c = tc_ref[:, ci:ci + 1]
                excl = t_entry_c * _cumprod_excl(om)       # global T_excl
                w = excl * alpha

                # Feature/composite chain. Pad rows of feats are zero, so
                # go's alpha/depth columns contribute nothing to d_w; the
                # symmetric contamination of d_featsT's pad rows is
                # discarded by the pad-VJP outside the kernel.
                d_featsT = _dotP(go, w)                    # (FP, KC)
                d_w = jnp.dot(go, feats[:, start:start + kc],
                              preferred_element_type=jnp.float32,
                              precision=_HI)               # (P, KC)
                d_w = d_w + d_s * t
                d_t = d_s * w                              # depth chain
                d_alpha = d_w * excl
                # w_k = alpha_k exp(e_k), e_k = sum_{j<k} log(1-alpha_j):
                # d_log_om_j = strict suffix of d_e (within-chunk scan +
                # cross-chunk carry accumulated in reverse order).
                d_e = d_w * w
                suf = _suffix_sum_last(d_e)
                d_log_om = jnp.concatenate(
                    [suf[:, 1:], jnp.zeros_like(suf[:, :1])], axis=-1) \
                    + acc_ref[:, 1:2]
                # alpha_acc = 1 - prod(1-alpha): every k gets -d_aa*T_last.
                d_log_om = d_log_om - d_alpha_acc * t_last
                d_alpha = d_alpha - d_log_om / jnp.maximum(om, 1e-6)
                grad_live = live & (alpha0 <= settings.alpha_max)
                d_alpha0 = jnp.where(grad_live, d_alpha, 0.0)
                d_opac = jnp.sum(d_alpha0 * gval, axis=0,
                                 keepdims=True)            # (1, KC)
                d_g = d_alpha0 * opac
                d_qv = jnp.where(qv > 0.0, -0.5 * d_g * gval, 0.0)
                # qv chain: dt picks up 2(at+b) (zero at the interior peak,
                # nonzero at clipped t); a/b/c get the direct partials.
                d_t2 = d_t + d_qv * 2.0 * (a * t + b)
                d_a = d_qv * t * t + jnp.where(
                    t_in, d_t2 * (b / (a * a)), 0.0)
                d_b = d_qv * 2.0 * t + jnp.where(t_in, -d_t2 / a, 0.0)
                d_c = jnp.sum(d_qv, axis=0, keepdims=True)  # (1, KC)

                d_q6 = _dotP(mono6, d_a)                   # (6, KC)
                d_wb = _dotP(d3, d_b)                      # (3, KC)
                d_dq = _dotT(d_a, gc[_ROWS_Q6])            # (P, 6)
                d_d3 = _dotT(d_b, gc[_ROWS_WB])            # (P, 3)
                # monomial chain: dd = [dx2, dy2, dz2, dxdy, dxdz, dydz].
                acc_ref[:, 2:5] += jnp.concatenate([
                    2.0 * dx * d_dq[:, 0:1] + dy * d_dq[:, 3:4]
                    + dz * d_dq[:, 4:5],
                    2.0 * dy * d_dq[:, 1:2] + dx * d_dq[:, 3:4]
                    + dz * d_dq[:, 5:6],
                    2.0 * dz * d_dq[:, 2:3] + dx * d_dq[:, 4:5]
                    + dy * d_dq[:, 5:6],
                ], axis=-1) + d_d3
                dgeom_ref[bi, :, start:start + kc] = jnp.concatenate(
                    [d_q6, d_wb, d_c, d_opac,
                     jnp.zeros((GEOM_ROWS - 11, kc), jnp.float32)], axis=0)
                dfeats_ref[bi, :, start:start + kc] = d_featsT
                acc_ref[:, 1:2] += suf[:, 0:1]             # suffix carry

        ddirs_ref[bi] = acc_ref[:, 2:5]                    # (P, 3)


def _block_tiles(t_total: int) -> int:
    """Tiles per grid step: amortize per-step pipeline overhead while
    keeping the working set inside VMEM (the per-pixel streams hold their
    tiny minor dim, so each tile's dirs/out block pads to 128 lanes in
    VMEM — ~131 KB per tile per stream). Padded tiles carry count=0 and
    skip every chunk."""
    return min(8, t_total)


def _chunk_size(k: int) -> int:
    """K-chunk size: 128 lanes when K tiles evenly, else one full chunk."""
    return 128 if k % 128 == 0 else k


def _pad_tiles(arrs, t_total, bt):
    pad = _round_up(t_total, bt) - t_total
    if pad == 0:
        return arrs
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _packed_composite(geom, featsT, dirs, count, settings: RenderSettings,
                      interpret: bool = False):
    """Packed fused composite.

    Args:
      geom:   (T, 16, K); featsT: (T, FP, K) (FP a multiple of 8, zero-
              padded); dirs: (T, P, 3) unit ray directions;
      count:  (T,) f32 last-valid-slot + 1.
    Returns (T, P, FP+2): channels [0..FP) = composited features,
      FP = alpha_acc, FP+1 = depth.
    """
    return _packed_fwd_impl(geom, featsT, dirs, count, settings,
                            interpret)


def _packed_fwd_impl(geom, featsT, dirs, count, settings, interpret):
    # Mosaic only compiles for TPU; on the CPU backend fall back to the
    # interpreter automatically (tests, debugging).
    interpret = interpret or jax.default_backend() == "cpu"
    t_total, _, k = geom.shape
    fp = featsT.shape[1]
    p = dirs.shape[1]
    kc = _chunk_size(k)
    bt = _block_tiles(t_total)
    geom, featsT, dirs, count = _pad_tiles(
        [geom, featsT, dirs, count], t_total, bt)
    tp = geom.shape[0]

    def spec(block):
        return pl.BlockSpec((bt,) + block,
                            lambda i: (i,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, settings=settings, bt=bt,
                               kc=kc, fp=fp, p=p)
    out = pl.pallas_call(
        kernel,
        grid=(tp // bt,),
        in_specs=[pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  spec((p, 3)), spec((GEOM_ROWS, k)), spec((fp, k))],
        out_specs=spec((p, fp + 2)),
        out_shape=jax.ShapeDtypeStruct((tp, p, fp + 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, fp + 8), jnp.float32),
                        pltpu.VMEM((p, 1), jnp.float32)],
        interpret=interpret,
    )(count.reshape(tp // bt, 1, bt), dirs, geom, featsT)
    return out[:t_total]


def _packed_fwd(geom, featsT, dirs, count, settings, interpret):
    out = _packed_fwd_impl(geom, featsT, dirs, count, settings, interpret)
    return out, (geom, featsT, dirs, count)


def _packed_bwd(settings, interpret, res, cot):
    geom, featsT, dirs, count = res
    interpret = interpret or jax.default_backend() == "cpu"
    t_total, _, k = geom.shape
    fp = featsT.shape[1]
    p = dirs.shape[1]
    bt = _block_tiles(t_total)
    geom_p, featsT_p, dirs_pp, count_p, cot_p = _pad_tiles(
        [geom, featsT, dirs, count, cot], t_total, bt)
    tp = geom_p.shape[0]

    def spec(block):
        return pl.BlockSpec((bt,) + block,
                            lambda i: (i,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    kc = _chunk_size(k)
    kernel = functools.partial(_bwd_kernel, settings=settings, bt=bt,
                               kc=kc, fp=fp, p=p)
    d_dirs, d_geom, d_featsT = pl.pallas_call(
        kernel,
        grid=(tp // bt,),
        in_specs=[pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  spec((p, 3)), spec((GEOM_ROWS, k)), spec((fp, k)),
                  spec((p, fp + 2))],
        out_specs=[spec((p, 3)), spec((GEOM_ROWS, k)), spec((fp, k))],
        out_shape=[
            jax.ShapeDtypeStruct((tp, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((tp, GEOM_ROWS, k), jnp.float32),
            jax.ShapeDtypeStruct((tp, fp, k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((p, 8), jnp.float32),
                        pltpu.VMEM((p, 1), jnp.float32),
                        pltpu.VMEM((p, max(8, k // _chunk_size(k))),
                                   jnp.float32)],
        interpret=interpret,
    )(count_p.reshape(tp // bt, 1, bt), dirs_pp, geom_p, featsT_p, cot_p)
    return (d_geom[:t_total], d_featsT[:t_total], d_dirs[:t_total],
            jnp.zeros_like(count))


_packed_composite.defvjp(_packed_fwd, _packed_bwd)


def _pack_inputs(packets):
    """XLA-side packing: pad featsT rows to a multiple of 8 (differentiable;
    the pad's VJP discards the pad-row cotangent contamination)."""
    featsT = packets["featsT"]
    f = featsT.shape[1]
    fp = _round_up(max(f, 8), 8)
    if fp != f:
        featsT = jnp.pad(featsT, ((0, 0), (0, fp - f), (0, 0)))
    return featsT, f, fp


def tile_composite(packets, dirs, settings: RenderSettings,
                   interpret: bool = False):
    """Fused tile compositing: Pallas forward, analytic Pallas backward.

    Args:
      packets: dict from :func:`build_tile_packets` (T-leading arrays).
      dirs: (T, P, 3) per-tile pixel ray directions.
    Returns (out (T, P, F), alpha_acc (T, P), depth (T, P)).
    """
    featsT, f, fp = _pack_inputs(packets)
    out = _packed_composite(packets["geom"], featsT, dirs,
                            packets["count"], settings, interpret)
    return (out[..., :f], out[..., fp], out[..., fp + 1])


def _composite_math(dirs, geom, featsT, settings: RenderSettings):
    """Reference semantics for ONE tile, full-K (no chunking, no early
    termination), using the same product-space scan expansion as the
    kernel. dirs (P,3), geom (16,K), featsT (F,K). Ground truth for the
    Pallas kernels; itself allclose-tested against
    render/tiled.tile_composite_reference."""
    dpt = jnp.pad(dirs, ((0, 0), (0, 5)))
    cols = _dir_cols(dpt)
    a, b = _quadratic_ab(cols, geom)
    alpha, t, *_ = _alpha_of(a, b, geom[_ROW_C:_ROW_C + 1],
                             geom[_ROW_OPAC:_ROW_OPAC + 1], settings)
    om = 1.0 - alpha
    excl = _cumprod_excl(om)
    w = excl * alpha
    out = jnp.dot(w, featsT.T, preferred_element_type=jnp.float32,
                  precision=_HI)
    k = w.shape[-1]
    alpha_acc = 1.0 - excl[:, k - 1] * om[:, k - 1]
    depth = jnp.sum(w * t, axis=-1) / jnp.maximum(alpha_acc, 1e-8)
    return out, alpha_acc, depth


def _tile_composite_xla(packets, dirs, settings: RenderSettings):
    """Reference semantics as vmapped XLA (ground truth for the kernel)."""
    fn = functools.partial(_composite_math, settings=settings)
    return jax.vmap(fn)(dirs, packets["geom"], packets["featsT"])
