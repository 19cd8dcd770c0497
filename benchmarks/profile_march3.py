"""Phase-level cost breakdown of the v3 grid marcher on the real TPU.

Times the flagship bounce march (500k-Gaussian surface scene, 1080p
primary hits, cosine-sampled bounce rays) under schedule prefixes and
with phase B stubbed out, so the A/B split and per-round cost are
measured — the inputs the round-5 10x work steers by (VERDICT r4 #2).

Run: python benchmarks/profile_march3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import (
        Rays, RenderSettings,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt
    from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
        interaction_from_tile_arrays,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    n = int(os.environ.get("GSPT_BENCH_N", 500_000))
    w = int(os.environ.get("GSPT_BENCH_W", 1920))
    h = int(os.environ.get("GSPT_BENCH_H", 1080))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 2))

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timed(label, f):
        out = f()
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:>42s}: {dt * 1e3:8.1f} ms", flush=True)
        return out, dt

    scene = surface_scene(n, seed=13)
    settings = RenderSettings(max_depth=4, ambient=(0.05, 0.05, 0.06, 1.0))
    cfg = BinningConfig()
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    accel = gt.build_grid_accel(scene)
    pk = prepare_tiles(scene, cam, settings, cfg)
    out = render_prepared(pk, cam, settings, cfg,
                          outputs=("tile_feats", "tile_alpha",
                                   "tile_depth", "tile_dirs"))
    t, p, _ = out["tile_dirs"].shape
    r = t * p
    dirs0 = out["tile_dirs"].reshape(r, 3)
    origins0 = jnp.broadcast_to(cam.c2w[:3, 3][None], (r, 3))
    prim = interaction_from_tile_arrays(out, origins0, dirs0, settings)
    key = jax.random.key(7)
    u = jax.random.uniform(key, (r, 2))
    nrm = prim["normal"]
    a = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    tx = jnp.cross(nrm, a)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(nrm, tx)
    phi = 2 * jnp.pi * u[:, 0]
    st = jnp.sqrt(u[:, 1])
    ct = jnp.sqrt(1 - u[:, 1])
    bdirs = (tx * (jnp.cos(phi) * st)[:, None]
             + ty * (jnp.sin(phi) * st)[:, None] + nrm * ct[:, None])
    borig = prim["position"] + nrm * settings.shadow_eps
    alive = prim["hit"]
    borig, bdirs, alive = jax.device_put((borig, bdirs, alive))
    fence(borig, bdirs, alive)
    print(f"rays={r} alive={float(jnp.mean(alive)):.3f}", flush=True)

    sched = gt._DEFAULT_SCHEDULE

    def trace(schedule, o=borig, d=bdirs, m=alive):
        return gt.trace_grid(scene, Rays(o, d), settings, accel,
                             active=m, schedule=schedule)

    # shadow march: rays toward a fixed overhead point at the scene top
    light = jnp.asarray([0.0, 1.2, 0.0])
    to_l = light[None] - borig
    dist = jnp.linalg.norm(to_l, axis=-1)
    sdirs = to_l / dist[:, None]

    def vis(schedule):
        return gt.visibility_grid(scene, accel, borig, sdirs,
                                  dist - 0.01, settings, active=alive,
                                  schedule=schedule)

    full, dt_full = timed("trace full schedule", lambda: trace(sched))
    print(f"    frozen_alive: {int(full['frozen_alive'])} "
          f"({int(full['frozen_alive']) / r:.2%})", flush=True)
    for k in range(1, len(sched)):
        pre = sched[:k]
        timed(f"trace rounds[0:{k}]", lambda pre=pre: trace(pre))

    # Phase B stubbed: pure traversal cost (phase A + sort/compaction).
    real_b = gt._phase_b

    def stub_b(accel_, origins, dirs, settings_, slots, t_ent, t_exd,
               count, trans, acc, alive_, with_features, t_cap=None):
        return trans * 0.999, acc, alive_

    gt._phase_b = stub_b
    gt.trace_grid.clear_cache()
    gt.visibility_grid.clear_cache()
    timed("trace full, phase B stubbed", lambda: trace(sched))
    timed("vis full, phase B stubbed", lambda: vis(sched))
    gt._phase_b = real_b
    gt.trace_grid.clear_cache()
    gt.visibility_grid.clear_cache()

    timed("vis full schedule", lambda: vis(sched))
    for k in range(1, len(sched)):
        pre = sched[:k]
        timed(f"vis rounds[0:{k}]", lambda pre=pre: vis(pre))


if __name__ == "__main__":
    main()
