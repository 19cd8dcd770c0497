"""Measure the multi-bounce path (BASELINE config #4: 500k Gaussians,
4 bounces, 1080p, grid backend) on the real TPU.

Breaks the pose into: per-pose prep (binning + grid accel upload), the
primary fused tile pass, and the bounce continuation (pathtrace_camera's
chunked lax.map over the grid DDA). Run:  python benchmarks/profile_bounce.py
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
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.lights import build_light_tables
    from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
        pathtrace_camera,
    )
    from pathtracer_gaussiansplatting_tpu.render.pipeline import (
        make_trace_backend,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import prepare_tiles

    n = int(os.environ.get("GSPT_BENCH_N", 500_000))
    w = int(os.environ.get("GSPT_BENCH_W", 1920))
    h = int(os.environ.get("GSPT_BENCH_H", 1080))
    depth = int(os.environ.get("GSPT_BENCH_DEPTH", 4))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 3))
    chunk = int(os.environ.get("GSPT_BENCH_CHUNK", 16384))

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    # Surface-structured Cornell-style room at trained-3DGS splat scales
    # (the reference's rt_box showcase geometry, engine.cpp:181-335).
    scene = surface_scene(n, seed=13)
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    settings = RenderSettings(background=(0.0, 0.0, 0.0), max_depth=depth,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    cfg = BinningConfig()
    tables = build_light_tables(scene)
    trace_fn, vis_fn = make_trace_backend(scene, settings, "grid")
    key = jax.random.key(13)

    t0 = time.perf_counter()
    pk = prepare_tiles(scene, cam, settings, cfg)
    fence(pk)
    print(f"prep (compile+run): {time.perf_counter() - t0:.2f} s")

    pt = jax.jit(lambda s, p, tb, tf, vf, k: pathtrace_camera(
        s, cam, settings, k, packets=p, tables=tb, trace_fn=tf,
        visibility_fn=vf, config=cfg, chunk=chunk))
    t0 = time.perf_counter()
    img = pt(scene, pk, tables, trace_fn, vis_fn, key)
    fence(img)
    print(f"pathtrace compile+first run: {time.perf_counter() - t0:.2f} s")

    t0 = time.perf_counter()
    for i in range(iters):
        img = pt(scene, pk, tables, trace_fn, vis_fn,
                 jax.random.fold_in(key, i))
    fence(img)
    dt = (time.perf_counter() - t0) / iters
    rays = w * h
    print(f"pathtrace sample: {dt * 1e3:.1f} ms  "
          f"({rays / dt / 1e6:.2f} M primary rays/s, depth={depth}, "
          f"chunk={chunk})")


if __name__ == "__main__":
    main()
