"""Stage-level profile of prepare_tiles (projection / binning / packets).

Breaks the per-pose preprocessing cost (BASELINE.md: 235 ms at 1M
Gaussians, 800x800, K=256) into its stages so optimization effort lands on
the real bottleneck. Run on the TPU:  python benchmarks/profile_binning.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.ops.binning import (
        BinningConfig, bin_gaussians, num_tiles, project_gaussians,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        _packet_features, prepare_tiles,
    )
    from pathtracer_gaussiansplatting_tpu.kernels.tile_composite import (
        build_tile_packets,
    )

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 5))

    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)
    tiles_x, tiles_y = num_tiles(cam, cfg)

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timeit(name, fn):
        out = fn()
        fence(out)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>28s}: {dt * 1e3:8.2f} ms")
        return out

    # Scene/camera pass through the jit boundary (matching bench.py and the
    # prepare_tiles row): zero-arg closures would bake them as compile-time
    # constants, letting XLA constant-fold part of the stage and duplicating
    # the arrays into each executable's device memory.
    proj_fn = jax.jit(lambda s, c: project_gaussians(s, c, cfg))
    proj = timeit("project_gaussians", lambda: proj_fn(scene, cam))
    binfn = jax.jit(lambda p: bin_gaussians(p, tiles_x, tiles_y, cfg))
    tile_idx, tile_mask, _, _ = timeit("bin_gaussians(sort)",
                                       lambda: binfn(proj))
    origin = cam.c2w[:3, 3]
    feats_fn = jax.jit(lambda s, o: _packet_features(s, o, settings))
    feats = timeit("_packet_features", lambda: feats_fn(scene, origin))
    pk_fn = jax.jit(lambda s, f, o, ti, tm: build_tile_packets(
        s, f, o, ti, tm))
    timeit("build_tile_packets",
           lambda: pk_fn(scene, feats, origin, tile_idx, tile_mask))
    timeit("prepare_tiles (total)",
           lambda: prepare_tiles(scene, cam, settings, cfg))
    n_valid = int(jnp.sum(proj["valid"]))
    import numpy as np
    r = np.asarray(proj["radius"])
    v = np.asarray(proj["valid"])
    ts = cfg.tile_size
    if n_valid > 0:
        # Clamp per-Gaussian coverage by the max_tiles_per_gaussian cap that
        # bin_gaussians applies (and ignore the screen-edge bbox clamp, so
        # this remains a slight overestimate of the sorted pair count).
        bw = np.ceil(2 * r[v] / ts) + 1
        cov = np.minimum(bw * bw, cfg.max_tiles_per_gaussian)
        print(f"valid gaussians: {n_valid}/{n} "
              f"({100.0 * n_valid / n:.1f}%), mean tiles/g "
              f"(capped at {cfg.max_tiles_per_gaussian}): "
              f"{float(np.mean(cov)):.2f}")
    else:
        print(f"valid gaussians: 0/{n}")


if __name__ == "__main__":
    main()
