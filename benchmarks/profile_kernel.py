"""Stage-level profile of the per-sample forward (the Pallas tile kernel).

Separates: the packed kernel itself, the untile transpose, chunk-occupancy
(how much work early termination actually skips), and a VPU-slot roofline
estimate, so optimization lands on the real bottleneck.

Run on the TPU:  python benchmarks/profile_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        _tile_dirs, prepare_tiles, render_prepared,
    )
    from pathtracer_gaussiansplatting_tpu.kernels import tile_composite as tc

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 20))

    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timeit(name, fn, iters=iters):
        out = fn()
        fence(out)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>44s}: {dt * 1e3:8.2f} ms")
        return out, dt

    pk = prepare_tiles(scene, cam, settings, cfg)
    fence(pk)
    dirs_t, _ = _tile_dirs(cam, cfg)
    dirs_t = jax.block_until_ready(jax.jit(lambda d: d)(dirs_t))

    # --- occupancy statistics ---
    count = np.asarray(pk["count"])
    t_total = count.shape[0]
    kc = tc._chunk_size(k)
    n_chunks = k // kc if k % kc == 0 else 1
    full = float(np.mean(count >= k))
    print(f"tiles: {t_total}, K={k}, kc={kc}, chunks/tile={n_chunks}")
    print(f"count: mean {count.mean():.1f}, median {np.median(count):.0f}, "
          f"frac full {full:.2f}, frac empty {float(np.mean(count == 0)):.2f}")

    # chunk-alive by count only (transmittance exit needs the kernel run)
    alive_by_count = sum(
        float(np.mean(count > ci * kc)) for ci in range(n_chunks))
    print(f"chunks alive by count: {alive_by_count:.2f}/{n_chunks} per tile")

    # --- end-to-end sample paths ---
    timeit("render_prepared(color+alpha)",
           lambda: render_prepared(pk, cam, settings, cfg,
                                   outputs=("color", "alpha_acc")))
    timeit("render_prepared(tile_feats only)",
           lambda: render_prepared(pk, cam, settings, cfg,
                                   outputs=("tile_feats",)))

    # --- the packed kernel alone (no _tile_dirs, no untile, no pack) ---
    featsT, f, fp = tc._pack_inputs(pk)
    featsT = jax.block_until_ready(jax.jit(lambda x: x)(featsT))
    kern = jax.jit(lambda g, ft, d, c: tc._packed_composite(
        g, ft, d, c, settings, False))
    _, dt_kern = timeit(
        "_packed_composite (F=16)",
        lambda: kern(pk["geom"], featsT, dirs_t, pk["count"]))

    # rgb-only features: does the F width matter?
    feats_rgb = jax.block_until_ready(jnp.asarray(featsT[:, :8]))
    timeit("_packed_composite (F=8)",
           lambda: kern(pk["geom"], feats_rgb, dirs_t, pk["count"]))

    # --- roofline ---
    p = dirs_t.shape[1]
    # HBM bytes: geom + featsT + dirs + out, once each
    bytes_hbm = (pk["geom"].size + featsT.size + dirs_t.size
                 + t_total * p * (fp + 2)) * 4
    # VPU element-ops per (pixel, gaussian) element in the live chunks:
    # 9 fma*2 + recip/div ~8 + exp ~8 + qv 5 + cmp/sel 8 + scan 2*log2(kc)
    # + w/acc ~6
    slots = 9 * 2 + 8 + 8 + 5 + 8 + 2 * np.log2(kc) + 6
    elems = alive_by_count * t_total * p * kc
    print(f"HBM traffic {bytes_hbm / 1e6:.0f} MB "
          f"-> {bytes_hbm / dt_kern / 1e9:.0f} GB/s (v5e peak ~819)")
    print(f"VPU model: {elems:.2e} live elems x {slots:.0f} slots "
          f"= {elems * slots / 1e9:.1f} G-slots; at {dt_kern * 1e3:.2f} ms "
          f"-> {elems * slots / dt_kern / 1e12:.2f} T-slots/s")


if __name__ == "__main__":
    main()
