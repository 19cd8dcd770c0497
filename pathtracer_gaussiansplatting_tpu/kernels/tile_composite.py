"""Pallas TPU kernel: fused per-tile ray-Gaussian compositing.

This is the hot forward kernel (the role of raygen_camera.rgen +
closesthit.rchit's hit loop on the GPU). The math is restructured so the MXU
does the heavy lifting — for a tile with P pixels and K depth-sorted
Gaussians:

    q_pk(t) = a_pk t^2 + 2 b_pk t + c_k          (ray-Gaussian quadratic)
    a_pk = d_p^T Q_k d_p   = [d^2 terms](P,6) @ Q6(6,K)      <- MXU
    b_pk = d_p^T Q_k(o-mu) = D(P,3) @ Wb(3,K)                 <- MXU
    c_k  = (o-mu)^T Q_k (o-mu)                   (precomputed per Gaussian)

with Q_k = M_k^T M_k the world-space inverse covariance. Then
alpha = opacity * exp(-q(t*)/2) with cutoffs, transmittance by exclusive
cumsum of log1p(-alpha) along K, and the feature composite
out(P,F) = W(P,K) @ feats(K,F) is a third MXU matmul.

The packet layout is built once per frame by :func:`build_tile_packets` from
the binning tables (ops/binning.py) — a pure gather, done by XLA.

The public entry :func:`tile_composite` carries a custom VJP whose backward
is a second fused Pallas kernel (:func:`_composite_bwd_math`): it recomputes
the forward per tile in VMEM and applies the analytic compositing VJP
(suffix-sum form), so no (T,P,K)-sized residual ever lands in HBM. Both
kernels are allclose-tested against the pure-JAX reference semantics
(render/tiled.tile_composite_reference) and its jax.vjp in interpret mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, RenderSettings
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops.quaternions import (
    normalize as quat_normalize,
)


def build_tile_packets(scene: GaussianScene, feats_all, origin, tile_idx,
                       tile_mask):
    """Gather per-tile Gaussian packets for the kernel.

    Args:
      scene: the full scene; feats_all: (N, F) per-Gaussian features
        (render/tiled._packet_features); origin: (3,) camera position;
      tile_idx/tile_mask: (T, K) binning tables.

    Returns dict of arrays:
      q6:   (T, 6, K) upper-triangular Q entries [xx,yy,zz,xy,xz,yz scaled].
      wb:   (T, 3, K) Q(o-mu).
      c:    (T, K) (o-mu)^T Q (o-mu).
      opac: (T, K) opacity (0 where masked).
      feats:(T, K, F).
    """
    # Structure-of-arrays construction: every intermediate is an (N,)
    # column, so the TPU lane dimension is N. The former (N,3,3) einsum
    # path (canonical_transforms + M^T M) kept the 3-wide geometry axes
    # minor — 3/128 lane occupancy — and measured ~65 ms/pose at 1M
    # Gaussians; these scalar formulas are the same math as pure
    # elementwise (N,) work. Q = R diag(exp(-2*log_s)) R^T with R the
    # (w,x,y,z) quaternion rotation (ops/quaternions.quat_to_rotmat).
    qn = quat_normalize(scene.quats)
    w, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)
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
    width = table.shape[-1]
    if width < 128:
        table = jnp.pad(table, ((0, 0), (0, 128 - width)))
    rows = table[tile_idx][..., :width]           # (T, K, 11+F)
    opac = jnp.where(tile_mask, rows[..., 10], 0.0)
    return dict(
        q6=jnp.swapaxes(rows[..., 0:6], 1, 2),     # (T,6,K)
        wb=jnp.swapaxes(rows[..., 6:9], 1, 2),     # (T,3,K)
        c=rows[..., 9],                            # (T,K)
        opac=opac,                                 # (T,K)
        feats=rows[..., 11:11 + f],                # (T,K,F)
    )


def _dir_basis(dirs):
    """(T, P, 3) -> (T, P, 6) quadratic monomials [dx2,dy2,dz2,dxdy,dxdz,dydz]."""
    dx, dy, dz = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    return jnp.stack([dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz],
                     axis=-1)


def _cumsum_last(x):
    """Inclusive cumsum along the last axis via Hillis-Steele doubling.

    Mosaic has no cumsum primitive; log2(K) masked roll-adds are pure
    VPU work and lower cleanly (and XLA fuses them on the reference path,
    keeping both paths numerically identical).
    """
    k = x.shape[-1]
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < k:
        shifted = jnp.concatenate(
            [zeros[..., :shift], x[..., :-shift]], axis=-1)
        x = x + shifted
        shift *= 2
    return x


def _composite_math(dq, d3, q6, wb, c, opac, feats, settings: RenderSettings):
    """Shared per-tile math (traced both by XLA reference and Pallas kernel).

    dq: (P, 6), d3: (P, 3), q6: (6, K), wb: (3, K), c: (K,), opac: (K,),
    feats: (K, F). Returns (out (P, F), alpha_acc (P,), depth (P,)).
    """
    # precision=HIGHEST: the Mosaic MXU truncates f32 operands to bf16 by
    # default, which is catastrophic inside exp(quadratic); bf16x3 passes
    # restore ~f32 accuracy at modest cost.
    hi = jax.lax.Precision.HIGHEST
    a = jnp.maximum(jnp.dot(dq, q6, preferred_element_type=jnp.float32,
                            precision=hi), 1e-12)             # (P,K)
    b = jnp.dot(d3, wb, preferred_element_type=jnp.float32,
                precision=hi)                                 # (P,K)
    t = jnp.clip(-b / a, settings.t_min, settings.t_max)
    qv = a * t * t + 2.0 * b * t + c[None, :]
    gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
    alpha = opac[None, :] * gval
    cut = jnp.exp(-0.5 * settings.sigma_cut * settings.sigma_cut)
    alpha = jnp.where(gval < cut, 0.0, alpha)
    alpha = jnp.where(alpha < settings.alpha_min, 0.0,
                      jnp.minimum(alpha, settings.alpha_max))
    # Exclusive transmittance via cumsum in log space (alpha <= 0.999
    # keeps log1p finite).
    log_om = jnp.log1p(-alpha)
    cum = _cumsum_last(log_om)
    trans_incl = jnp.exp(cum)
    # exclusive transmittance: T_excl = T_incl / (1 - alpha)
    trans_excl = jnp.exp(cum - log_om)
    w = trans_excl * alpha                                    # (P,K)
    out = jnp.dot(w, feats, preferred_element_type=jnp.float32,
                  precision=hi)
    k = alpha.shape[-1]
    # static lax.slice: integer indexing would lower to dynamic_slice,
    # which Mosaic rejects
    last = jax.lax.slice(trans_incl, (0, k - 1), (trans_incl.shape[0], k))
    alpha_acc = 1.0 - last[:, 0]
    depth = jnp.sum(w * t, axis=-1) / jnp.maximum(alpha_acc, 1e-8)
    return out, alpha_acc, depth


def _kernel(dq_ref, d3_ref, q6_ref, wb_ref, c_ref, opac_ref, feats_ref,
            out_ref, acc_ref, depth_ref, *, settings):
    out, acc, depth = _composite_math(
        dq_ref[0], d3_ref[0], q6_ref[0], wb_ref[0], c_ref[0, 0],
        opac_ref[0, 0], feats_ref[0], settings)
    out_ref[0] = out
    acc_ref[0] = acc[:, None]
    depth_ref[0] = depth[:, None]


def _tile_composite_pallas(packets, dirs, settings: RenderSettings,
                           interpret: bool = False):
    # Mosaic only compiles for TPU; on the CPU backend fall back to the
    # interpreter automatically (tests, debugging).
    interpret = interpret or jax.default_backend() == "cpu"
    t_total, k = packets["c"].shape
    p = dirs.shape[1]
    f = packets["feats"].shape[-1]
    dq = _dir_basis(dirs)                                     # (T,P,6)

    def spec(block):
        # Mosaic needs each block's trailing dims to tile the array (or equal
        # it); per-tile (T,K) scalars ride as (T,1,K), per-pixel outputs as
        # (T,P,1).
        return pl.BlockSpec((1,) + block, lambda i: (i,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, settings=settings)
    out, acc, depth = pl.pallas_call(
        kernel,
        grid=(t_total,),
        in_specs=[spec((p, 6)), spec((p, 3)), spec((6, k)), spec((3, k)),
                  spec((1, k)), spec((1, k)), spec((k, f))],
        out_specs=[spec((p, f)), spec((p, 1)), spec((p, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, p, f), jnp.float32),
            jax.ShapeDtypeStruct((t_total, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((t_total, p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(dq, dirs, packets["q6"], packets["wb"], packets["c"][:, None, :],
      packets["opac"][:, None, :], packets["feats"])
    return out, acc[..., 0], depth[..., 0]


def _suffix_sum_last(x):
    """Inclusive suffix sum along the last axis (reverse Hillis-Steele)."""
    k = x.shape[-1]
    zeros = jnp.zeros_like(x)
    shift = 1
    while shift < k:
        shifted = jnp.concatenate(
            [x[..., shift:], zeros[..., :shift]], axis=-1)
        x = x + shifted
        shift *= 2
    return x


def _composite_bwd_math(dq, d3, q6, wb, c, opac, feats, go, ga, gd,
                        settings: RenderSettings):
    """Analytic per-tile backward of :func:`_composite_math`.

    Recomputes the forward in-register (VMEM) — no residuals ever touch HBM,
    which is the whole point vs the autodiff path (a (T,P,K) residual at
    2500 tiles x 256 px x 256 K is ~650 MB *per intermediate*).

    Key identities:
      * envelope: at the peak t* = -b/a, dq/dt = 2(at+b) = 0, so
        d_qv/da = t^2 and d_qv/db = 2t with no dt-chain; the dt-chain only
        matters for the depth output and for clipped t (where dt/da = 0).
      * compositing: w_k = alpha_k exp(e_k), e_k = sum_{j<k} log(1-alpha_j)
        so d_log_om_j = suffix_{k>j}(d_e_k), one reverse scan.

    Args mirror _composite_math plus cotangents go (P,F), ga (P,), gd (P,).
    Returns (d_dirs (P,3), d_q6, d_wb, d_c, d_opac, d_feats).
    """
    hi = jax.lax.Precision.HIGHEST

    def dot(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32, precision=hi)

    # ---- forward recompute ----
    a = jnp.maximum(dot(dq, q6), 1e-12)                        # (P,K)
    b = dot(d3, wb)                                            # (P,K)
    t_raw = -b / a
    t = jnp.clip(t_raw, settings.t_min, settings.t_max)
    t_in = (t_raw > settings.t_min) & (t_raw < settings.t_max)
    qv = a * t * t + 2.0 * b * t + c[None, :]
    gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
    alpha0 = opac[None, :] * gval
    cut = jnp.exp(-0.5 * settings.sigma_cut * settings.sigma_cut)
    live = (gval >= cut) & (alpha0 >= settings.alpha_min)
    alpha = jnp.where(live, jnp.minimum(alpha0, settings.alpha_max), 0.0)
    log_om = jnp.log1p(-alpha)
    cum = _cumsum_last(log_om)
    t_excl = jnp.exp(cum - log_om)
    w = t_excl * alpha                                         # (P,K)
    t_last = jnp.exp(cum[:, -1:])                              # (P,1)
    alpha_acc = 1.0 - t_last[:, 0]
    denom = jnp.maximum(alpha_acc, 1e-8)
    s_depth = jnp.sum(w * t, axis=-1)

    # ---- backward ----
    d_feats = dot(w.T, go)                                     # (K,F)
    d_w = dot(go, feats.T)                                     # (P,K)
    d_s = gd / denom                                           # (P,)
    live_acc = alpha_acc > 1e-8
    d_alpha_acc = ga + jnp.where(
        live_acc, -gd * s_depth / (denom * denom), 0.0)
    d_w = d_w + d_s[:, None] * t
    d_t = d_s[:, None] * w                                     # depth chain
    d_alpha = d_w * t_excl
    d_e = d_w * w
    # e_k = cum_k - log_om_k: d_log_om_j = sum_{k>j} d_e_k (strict suffix).
    suf = _suffix_sum_last(d_e)
    k = d_e.shape[-1]
    d_log_om = jnp.concatenate(
        [suf[..., 1:], jnp.zeros_like(suf[..., :1])], axis=-1)
    # alpha_acc = 1 - exp(sum_k log_om_k): every k gets -d_alpha_acc*T_last.
    d_log_om = d_log_om - (d_alpha_acc[:, None] * t_last)
    d_alpha = d_alpha - d_log_om / jnp.maximum(1.0 - alpha, 1e-6)
    grad_live = live & (alpha0 <= settings.alpha_max)
    d_alpha0 = jnp.where(grad_live, d_alpha, 0.0)
    d_opac = jnp.sum(d_alpha0 * gval, axis=0)                  # (K,)
    d_g = d_alpha0 * opac[None, :]
    d_qv = jnp.where(qv > 0.0, -0.5 * d_g * gval, 0.0)
    # qv chain: dt picks up 2(at+b) (zero at the interior peak, nonzero at
    # clipped t); a/b/c get the direct partials.
    d_t = d_t + d_qv * 2.0 * (a * t + b)
    d_a = d_qv * t * t + jnp.where(t_in, d_t * (b / (a * a)), 0.0)
    d_b = d_qv * 2.0 * t + jnp.where(t_in, -d_t / a, 0.0)
    d_c = jnp.sum(d_qv, axis=0)                                # (K,)
    d_q6 = dot(dq.T, d_a)                                      # (6,K)
    d_wb = dot(d3.T, d_b)                                      # (3,K)
    d_dq = dot(d_a, q6.T)                                      # (P,6)
    d_d3 = dot(d_b, wb.T)                                      # (P,3)
    # dq basis chain: dq = [dx2, dy2, dz2, dxdy, dxdz, dydz].
    dx, dy, dz = d3[:, 0], d3[:, 1], d3[:, 2]
    d_dirs = jnp.stack([
        2.0 * dx * d_dq[:, 0] + dy * d_dq[:, 3] + dz * d_dq[:, 4],
        2.0 * dy * d_dq[:, 1] + dx * d_dq[:, 3] + dz * d_dq[:, 5],
        2.0 * dz * d_dq[:, 2] + dx * d_dq[:, 4] + dy * d_dq[:, 5],
    ], axis=-1) + d_d3
    return d_dirs, d_q6, d_wb, d_c, d_opac, d_feats


def _bwd_kernel(dq_ref, d3_ref, q6_ref, wb_ref, c_ref, opac_ref, feats_ref,
                go_ref, ga_ref, gd_ref,
                ddirs_ref, dq6_ref, dwb_ref, dc_ref, dopac_ref, dfeats_ref,
                *, settings):
    d_dirs, d_q6, d_wb, d_c, d_opac, d_feats = _composite_bwd_math(
        dq_ref[0], d3_ref[0], q6_ref[0], wb_ref[0], c_ref[0, 0],
        opac_ref[0, 0], feats_ref[0], go_ref[0], ga_ref[0][:, 0],
        gd_ref[0][:, 0], settings)
    ddirs_ref[0] = d_dirs
    dq6_ref[0] = d_q6
    dwb_ref[0] = d_wb
    dc_ref[0] = d_c[None, :]
    dopac_ref[0] = d_opac[None, :]
    dfeats_ref[0] = d_feats


def _tile_composite_bwd_pallas(packets, dirs, cot, settings: RenderSettings,
                               interpret: bool = False):
    interpret = interpret or jax.default_backend() == "cpu"
    go, ga, gd = cot
    t_total, k = packets["c"].shape
    p = dirs.shape[1]
    f = packets["feats"].shape[-1]
    dq = _dir_basis(dirs)

    def spec(block):
        return pl.BlockSpec((1,) + block, lambda i: (i,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_bwd_kernel, settings=settings)
    d_dirs, d_q6, d_wb, d_c, d_opac, d_feats = pl.pallas_call(
        kernel,
        grid=(t_total,),
        in_specs=[spec((p, 6)), spec((p, 3)), spec((6, k)), spec((3, k)),
                  spec((1, k)), spec((1, k)), spec((k, f)),
                  spec((p, f)), spec((p, 1)), spec((p, 1))],
        out_specs=[spec((p, 3)), spec((6, k)), spec((3, k)), spec((1, k)),
                   spec((1, k)), spec((k, f))],
        out_shape=[
            jax.ShapeDtypeStruct((t_total, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 6, k), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 3, k), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((t_total, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((t_total, k, f), jnp.float32),
        ],
        interpret=interpret,
    )(dq, dirs, packets["q6"], packets["wb"], packets["c"][:, None, :],
      packets["opac"][:, None, :], packets["feats"],
      go, ga[..., None], gd[..., None])
    d_packets = dict(q6=d_q6, wb=d_wb, c=d_c[:, 0, :], opac=d_opac[:, 0, :],
                     feats=d_feats)
    return d_packets, d_dirs


def _tile_composite_xla(packets, dirs, settings: RenderSettings):
    """Reference semantics as vmapped XLA (ground truth for the kernel,
    and the recompute path for the backward)."""
    dq = _dir_basis(dirs)
    fn = functools.partial(_composite_math, settings=settings)
    return jax.vmap(fn)(dq, dirs, packets["q6"], packets["wb"],
                        packets["c"], packets["opac"], packets["feats"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tile_composite(packets, dirs, settings: RenderSettings,
                   interpret: bool = False):
    """Fused tile compositing: Pallas forward, recompute-XLA backward.

    Args:
      packets: dict from :func:`build_tile_packets` (T-leading arrays).
      dirs: (T, P, 3) per-tile pixel ray directions.
    Returns (out (T,P,F), alpha_acc (T,P), depth (T,P)).
    """
    return _tile_composite_pallas(packets, dirs, settings, interpret)


def _tc_fwd(packets, dirs, settings, interpret):
    return _tile_composite_pallas(packets, dirs, settings, interpret), \
        (packets, dirs)


def _tc_bwd(settings, interpret, res, cot):
    packets, dirs = res
    return _tile_composite_bwd_pallas(packets, dirs, cot, settings,
                                      interpret)


tile_composite.defvjp(_tc_fwd, _tc_bwd)
