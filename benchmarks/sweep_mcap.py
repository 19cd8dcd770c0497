"""max_tiles_per_gaussian sweep: sort cost vs image accuracy.

The binning sort (65.6 ms of the 94 ms pose prep at the bench config) is
linear in the M*N pair expansion; on the 1M random-cloud bench scene
every Gaussian saturates the M=16 cap (profile_binning). This measures
prep time + fwd image PSNR for M in {16, 12, 8} (M=16 as reference).

Run: python benchmarks/sweep_mcap.py
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
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )
    from pathtracer_gaussiansplatting_tpu.utils.metrics import psnr

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))

    def fence(*t):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(t)))

    ref_img = None
    for m in (16, 12, 8):
        cfg = BinningConfig(max_per_tile=k, max_tiles_per_gaussian=m)
        prep = lambda: prepare_tiles(scene, cam, settings, cfg)
        pk = prep()
        fence(pk)
        t0 = time.perf_counter()
        for _ in range(5):
            pk = prep()
        fence(pk)
        dt = (time.perf_counter() - t0) / 5
        img = render_prepared(pk, cam, settings, cfg,
                              outputs=("color",))["color"]
        fence(img)
        if ref_img is None:
            ref_img = img
            print(f"M={m}: prep {dt * 1e3:.1f} ms (reference image)",
                  flush=True)
        else:
            p = float(psnr(img, ref_img, max_val=1.0))
            print(f"M={m}: prep {dt * 1e3:.1f} ms  PSNR vs M=16: "
                  f"{p:.1f} dB  cap_dropped={float(pk['stat_cap_dropped_tiles']):.3g}",
                  flush=True)


if __name__ == "__main__":
    main()
