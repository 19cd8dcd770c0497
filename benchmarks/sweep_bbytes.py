"""Phase-B chunk-budget sweep: is the barrier chain the hidden cost?

profile_march3 gives round-0 phase B ~0.7 s where the row-gather +
VPU model predicts ~0.3 s; the difference is consistent with the 13-26
barrier-chained chunks (GSPT_B_BYTES=2e9 default) serializing with
pipeline bubbles. Run each budget in a FRESH process:

    for b in 2e9 4e9 8e9; do GSPT_B_BYTES=$b python benchmarks/sweep_bbytes.py; done
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
    w, h = 1920, 1080

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timed(label, f, iters=2):
        out = f()
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        print(f"{label:>30s}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:8.1f} ms",
              flush=True)

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

    bb = gt._B_BYTES
    print(f"GSPT_B_BYTES={bb:.1e}", flush=True)
    f = lambda o, d, m: gt.trace_grid(
        scene, Rays(o, d), settings, accel, active=m)
    timed("trace", lambda: f(borig, bdirs, alive))
    g = lambda o, d, t_, m: gt.visibility_grid(
        scene, accel, o, d, t_, settings, active=m)
    timed("vis", lambda: g(borig, sdirs, dist - 0.01, alive))


if __name__ == "__main__":
    main()
