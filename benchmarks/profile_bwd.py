"""Decompose the fwd+bwd residual (142.7 - 104.3 = 38.4 ms at r5 profile):
kernel backward vs packet-gather scatter-add vs projection chains.

Run: python benchmarks/profile_bwd.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.ops.binning import (
        BinningConfig, bin_gaussians, num_tiles, project_gaussians,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        _tile_dirs, prepare_tiles,
    )
    from pathtracer_gaussiansplatting_tpu.kernels import tile_composite as tc

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)

    def fence(*t):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(t)))

    def timed(label, f, iters=5):
        out = f()
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        print(f"{label:>40s}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
              flush=True)
        return out

    pk = prepare_tiles(scene, cam, settings, cfg)
    dirs_t, _ = _tile_dirs(cam, cfg)
    dirs_t = jax.block_until_ready(jax.jit(lambda d: d)(dirs_t))
    featsT, f, fp = tc._pack_inputs(pk)
    featsT = jax.block_until_ready(jnp.asarray(featsT))
    fence(pk)

    # 1. kernel fwd+bwd alone (VJP of the packed composite)
    def kern_fb(geom, ft, d, c):
        out, vjp = jax.vjp(
            lambda g, ftt: tc._packed_composite(g, ftt, d, c, settings,
                                                False), geom, ft)
        return vjp(jnp.ones_like(out))

    kfb = jax.jit(kern_fb)
    timed("kernel fwd+bwd (vjp, geom+feats)",
          lambda: kfb(pk["geom"], featsT, dirs_t, pk["count"]))

    # 2. the packet-gather backward: scatter-add rows into the table
    tiles_x, tiles_y = num_tiles(cam, cfg)
    proj = jax.jit(lambda s, c: project_gaussians(s, c, cfg))(scene, cam)
    tile_idx, tile_mask, _, _ = jax.jit(
        lambda p: bin_gaussians(p, tiles_x, tiles_y, cfg))(proj)
    t_total = tile_idx.shape[0]
    d_rows_128 = jnp.ones((t_total, k, 128), jnp.float32)
    d_rows_32 = jnp.ones((t_total, k, 32), jnp.float32)
    fence(tile_idx, d_rows_128, d_rows_32)

    sc128 = jax.jit(lambda dr, idx: jnp.zeros((n, 128)).at[idx].add(dr))
    timed("scatter-add (N,128) rows", lambda: sc128(d_rows_128, tile_idx))
    sc32 = jax.jit(lambda dr, idx: jnp.zeros((n, 32)).at[idx].add(dr))
    timed("scatter-add (N,32) rows", lambda: sc32(d_rows_32, tile_idx))

    # 3. sort-and-segment-sum alternative to the scatter
    def seg32(dr, idx):
        flat = idx.reshape(-1)
        order = jnp.argsort(flat)
        sorted_rows = dr.reshape(-1, 32)[order]
        return jax.ops.segment_sum(sorted_rows, flat[order], n)

    sg = jax.jit(seg32)
    timed("argsort+segment_sum (N,32)", lambda: sg(d_rows_32, tile_idx))


if __name__ == "__main__":
    main()
