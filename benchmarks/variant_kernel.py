"""Ablation harness for the forward tile kernel.

Times modified copies of kernels/tile_composite._fwd_kernel with individual
stages disabled or re-lowered, to locate where the per-sample milliseconds
actually go before redesigning. Run on the TPU:

    python benchmarks/variant_kernel.py [variant ...]

Variants:
  full      the production math (should match profile_kernel's number)
  noquad    alpha from opacity alone (skips a/b/qv build: 9 rank-1 FMAs)
  noexp     gval = max(0, 1 - 0.5*qv) (skips the transcendental)
  nodiv     t fixed at 1.0 (skips -b/a divide + clip)
  noscan    w = trans*alpha (skips the Hillis-Steele cumprod)
  nodepth   skip the w*t depth accumulation
  onechunk  kc = K (no chunking / no early termination)
  hoist     pre-broadcast dir columns to (P, kc) once per tile
  mxu       a,b via dot_general(HIGHEST) instead of rank-1 FMAs
  mxu3      a,b via manual bf16 hi/lo 3-pass MXU split
  floor     only the W @ feats MXU composite (w = alpha const)
  skeleton  no matmul at all (acc += slice of w): loop machinery + DMA only
  lowdot    full math, composite at Precision.DEFAULT (1 bf16 pass)
  dot3      full math, composite via manual hi/lo 3-pass (~f32 quality)
  skel16/skel32   skeleton with bt=16/32 (grid-overhead share)
  noif      full math, no pl.when (unconditional chunks)
  nodirs    skeleton, dirs stream never read (alpha from geom only)
  noout     skeleton, out written as (P, 8) lanes only
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_gaussiansplatting_tpu.kernels import tile_composite as tc
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings

_HI = jax.lax.Precision.HIGHEST


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


_SKEL = ("noquad", "floor", "skeleton", "skel16", "skel32", "nodirs",
         "noout")


def _variant_kernel(count_ref, dirs_ref, geom_ref, feats_ref, out_ref,
                    acc_ref, trans_ref, *, settings, bt, kc, fp, p, mode):
    n_chunks = geom_ref.shape[-1] // kc
    for bi in range(bt):
        if mode == "nodirs":
            cols = None
        else:
            dpt = dirs_ref[bi]
            cols = tc._dir_cols(dpt)
        if mode == "hoist":
            bcols = [jnp.broadcast_to(c, (p, kc)) for c in cols]
        if mode in ("mxu", "mxu3"):
            mono6 = jnp.concatenate(cols[3:9], axis=-1)      # (P, 6)
            d3 = jnp.concatenate(cols[0:3], axis=-1)         # (P, 3)
            if mode == "mxu3":
                m_hi, m_lo = _split_bf16(mono6)
                d_hi, d_lo = _split_bf16(d3)
        geom = geom_ref[bi]
        feats = feats_ref[bi]
        trans_ref[:] = jnp.ones((p, 1), jnp.float32)
        acc_ref[:] = jnp.zeros((p, fp + 8), jnp.float32)
        for ci in range(n_chunks):
            start = ci * kc

            def body(start=start):
                g = geom[:, start:start + kc]
                opac = g[tc._ROW_OPAC:tc._ROW_OPAC + 1]
                if mode == "nodirs":
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (p, kc), 0).astype(jnp.float32) * 1e-5
                    alpha = jnp.minimum(jnp.abs(row * opac), 0.03)
                    t = alpha + 1.0
                elif mode in _SKEL:
                    # rank-1 product materializes a true (P, KC) layout —
                    # Mosaic's layout pass crashes slicing splat/broadcast
                    # values inside scf.if (vector_extract_strided_slice).
                    alpha = jnp.minimum(jnp.abs(cols[3] * opac), 0.03)
                    t = alpha + 1.0
                else:
                    if mode == "hoist":
                        a = (bcols[3] * g[0:1] + bcols[4] * g[1:2]
                             + bcols[5] * g[2:3] + bcols[6] * g[3:4]
                             + bcols[7] * g[4:5] + bcols[8] * g[5:6])
                        b = (bcols[0] * g[6:7] + bcols[1] * g[7:8]
                             + bcols[2] * g[8:9])
                        a = jnp.maximum(a, 1e-12)
                    elif mode == "mxu":
                        a = jax.lax.dot_general(
                            mono6, g[0:6], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
                        b = jax.lax.dot_general(
                            d3, g[6:9], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
                        a = jnp.maximum(a, 1e-12)
                    elif mode == "mxu3":
                        g6 = g[0:6]
                        g3 = g[6:9]
                        g6h, g6l = _split_bf16(g6)
                        g3h, g3l = _split_bf16(g3)

                        def mm(x, y):
                            return jax.lax.dot_general(
                                x, y, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                        a = mm(m_hi, g6h) + mm(m_hi, g6l) + mm(m_lo, g6h)
                        b = mm(d_hi, g3h) + mm(d_hi, g3l) + mm(d_lo, g3h)
                        a = jnp.maximum(a, 1e-12)
                    else:
                        a, b = tc._quadratic_ab(cols, g)
                    c = g[tc._ROW_C:tc._ROW_C + 1]
                    if mode == "nodiv":
                        t = jnp.ones((p, kc), jnp.float32)
                        t = jnp.broadcast_to(t, a.shape)
                    else:
                        t = jnp.clip(-b / a, settings.t_min, settings.t_max)
                    qv = (a * t + 2.0 * b) * t + c
                    if mode == "noexp":
                        gval = jnp.maximum(0.0, 1.0 - 0.5 * qv)
                    else:
                        gval = jnp.exp(-0.5 * jnp.maximum(qv, 0.0))
                    alpha0 = opac * gval
                    cut = math.exp(-0.5 * settings.sigma_cut ** 2)
                    live = (gval >= cut) & (alpha0 >= settings.alpha_min)
                    alpha = jnp.where(
                        live, jnp.minimum(alpha0, settings.alpha_max), 0.0)
                om = 1.0 - alpha
                if mode in ("noscan", "floor") + _SKEL[2:]:
                    w = trans_ref[:] * alpha
                    last = om[:, kc - 1:kc]
                else:
                    excl = tc._cumprod_excl(om)
                    w = trans_ref[:] * excl * alpha
                    last = excl[:, kc - 1:kc] * om[:, kc - 1:kc]
                fc = feats[:, start:start + kc]
                if mode in _SKEL[2:]:
                    acc_ref[:, :fp] += w[:, :fp]
                elif mode == "lowdot":
                    acc_ref[:, :fp] += jax.lax.dot_general(
                        w, fc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif mode == "dot3":
                    w_hi = w.astype(jnp.bfloat16).astype(jnp.float32)
                    w_lo = w - w_hi
                    f_hi = fc.astype(jnp.bfloat16).astype(jnp.float32)
                    f_lo = fc - f_hi

                    def mmT(x, y):
                        return jax.lax.dot_general(
                            x, y, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    acc_ref[:, :fp] += (mmT(w_hi, f_hi) + mmT(w_hi, f_lo)
                                        + mmT(w_lo, f_hi))
                else:
                    acc_ref[:, :fp] += tc._dotT(w, fc)
                if mode not in ("nodepth", "floor") + _SKEL[2:]:
                    acc_ref[:, fp:fp + 1] += jnp.sum(
                        w * t, axis=-1, keepdims=True)
                trans_ref[:] *= last

            if mode == "noif":
                body()
            else:
                alive = count_ref[0, 0, bi] > float(start)
                if ci > 0:
                    alive &= (jnp.max(trans_ref[:])
                              > settings.transmittance_min)
                pl.when(alive)(body)
        alpha_acc = 1.0 - trans_ref[:]
        depth = acc_ref[:, fp:fp + 1] / jnp.maximum(alpha_acc, 1e-8)
        if mode == "noout":
            out_ref[bi] = jnp.concatenate(
                [acc_ref[:, :6], alpha_acc, depth], axis=-1)
        else:
            out_ref[bi] = jnp.concatenate(
                [acc_ref[:, :fp], alpha_acc, depth], axis=-1)


def run_variant(mode, geom, featsT, dirs, count, settings):
    t_total, _, k = geom.shape
    fp = featsT.shape[1]
    p = dirs.shape[1]
    kc = k if mode == "onechunk" else tc._chunk_size(k)
    bt = {"skel16": 16, "skel32": 32}.get(mode, tc._block_tiles(t_total))
    geom, featsT, dirs, count = tc._pad_tiles(
        [geom, featsT, dirs, count], t_total, bt)
    tp = geom.shape[0]

    def spec(block):
        return pl.BlockSpec((bt,) + block,
                            lambda i: (i,) + (0,) * len(block),
                            memory_space=pltpu.VMEM)

    dirs_spec = spec((p, 3))
    if mode == "nodirs":
        dirs_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_ch = 8 if mode == "noout" else fp + 2
    kernel = functools.partial(_variant_kernel, settings=settings, bt=bt,
                               kc=kc, fp=fp, p=p, mode=mode)
    fn = pl.pallas_call(
        kernel,
        grid=(tp // bt,),
        in_specs=[pl.BlockSpec((1, 1, bt), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  dirs_spec, spec((tc.GEOM_ROWS, k)), spec((fp, k))],
        out_specs=spec((p, out_ch)),
        out_shape=jax.ShapeDtypeStruct((tp, p, out_ch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, fp + 8), jnp.float32),
                        pltpu.VMEM((p, 1), jnp.float32)],
    )
    jitted = jax.jit(lambda c, d, g, f: fn(c, d, g, f))
    return jitted, count.reshape(tp // bt, 1, bt), dirs, geom, featsT


def main():
    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        _tile_dirs, prepare_tiles,
    )

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 20))

    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)

    pk = prepare_tiles(scene, cam, settings, cfg)
    featsT, f, fp = tc._pack_inputs(pk)
    dirs_t, _ = _tile_dirs(cam, cfg)
    args = [jax.block_until_ready(jax.jit(lambda x: x)(a))
            for a in (pk["geom"], featsT, dirs_t, pk["count"])]

    variants = sys.argv[1:] or [
        "full", "floor", "noquad", "noexp", "nodiv", "noscan", "nodepth",
        "onechunk", "hoist", "mxu", "mxu3", "skeleton", "lowdot", "dot3"]
    def fence(out):
        return float(jnp.sum(out))

    ref = None
    for mode in variants:
        jitted, *jargs = run_variant(mode, *args, settings)
        out = jitted(*jargs)
        fence(out)  # compile + drain
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*jargs)
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        note = ""
        if mode == "full":
            ref = np.asarray(out)
        elif ref is not None and mode in ("hoist", "mxu", "mxu3", "onechunk",
                                          "lowdot", "dot3"):
            o = np.asarray(out)
            err = np.max(np.abs(o - ref)) / (np.max(np.abs(ref)) + 1e-12)
            note = f"  max rel err vs full: {err:.2e}"
        print(f"{mode:>10s}: {dt * 1e3:8.2f} ms{note}", flush=True)


if __name__ == "__main__":
    main()
