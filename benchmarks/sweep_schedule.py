"""Schedule sweep for the v3 marcher on the flagship bounce workload.

profile_march3.py decomposed a trace march (2.04 s) into phase A 0.73 s /
phase B 1.31 s, with round 0 (M=8) alone at 1.42 s. Phase B cost is
~ linear in R*M gathered packet rows, and most rays saturate after ~3-5
occupied cells — a smaller round-0 M should cut both A iterations and B
rows. This sweeps schedules for the trace and the vis march.

Run: python benchmarks/sweep_schedule.py
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

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timed(label, f, iters=2):
        out = f()
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:>34s}: {dt * 1e3:8.1f} ms", flush=True)
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

    light = jnp.asarray([0.0, 1.2, 0.0])
    to_l = light[None] - borig
    dist = jnp.linalg.norm(to_l, axis=-1)
    sdirs = to_l / dist[:, None]

    SCHEDS = {
        "cur(8,16,32,64)": gt._DEFAULT_SCHEDULE,
        "m4(4,8,32,64)": ((1.0, 4, 48, 0.07, 0.0),
                          (0.25, 8, 72, 0.03, 0.0),
                          (0.0625, 32, 160, 0.005, 0.0),
                          (0.015625, 64, 320, 0.0, 0.0)),
        "m6(6,16,32,64)": ((1.0, 6, 56, 0.06, 0.0),
                           (0.25, 16, 96, 0.02, 0.0),
                           (0.0625, 32, 160, 0.005, 0.0),
                           (0.015625, 64, 320, 0.0, 0.0)),
        "exit(8@.10)": ((1.0, 8, 64, 0.10, 0.0),
                        (0.25, 16, 96, 0.04, 0.0),
                        (0.0625, 32, 160, 0.01, 0.0),
                        (0.015625, 64, 320, 0.0, 0.0)),
    }
    ref_img = None
    for name, sched in SCHEDS.items():
        f = lambda o, d, m, s=sched: gt.trace_grid(
            scene, Rays(o, d), settings, accel, active=m, schedule=s)
        outd, dt = timed(f"trace {name}", lambda: f(borig, bdirs, alive))
        alb = outd["albedo"]
        if ref_img is None:
            ref_img = alb
        else:
            err = float(jnp.abs(alb - ref_img).mean())
            print(f"{'':>34s}  mean|albedo-ref|={err:.5f} "
                  f"frozen={int(outd['frozen_alive'])}", flush=True)
    for name, sched in SCHEDS.items():
        f = lambda o, d, t_, m, s=sched: gt.visibility_grid(
            scene, accel, o, d, t_, settings, active=m, schedule=s)
        timed(f"vis {name}",
              lambda: f(borig, sdirs, dist - 0.01, alive))


if __name__ == "__main__":
    main()
