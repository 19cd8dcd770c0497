"""Component breakdown of the flagship multi-bounce frame (round 4).

Measures, on the real TPU at the BENCH config (500k-Gaussian surface
scene, 1920x1080, depth 4):
  * trace_grid (bounce aggregate trace) at full 2.07M rays with a
    REALISTIC bounce-ray distribution (cosine around primary normals)
    and a given alive fraction,
  * visibility_grid (NEE shadow march) at the same scale,
  * the cost of a full-batch argsort + gather permutation (the proposed
    pre-march compaction/coherence sort),
  * an alive-rays-vs-heavy-steps census of the march.

Run: python benchmarks/profile_march.py [all|trace|vis|sort|census]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    alive_frac = float(os.environ.get("GSPT_ALIVE_FRAC", 1.0))

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
        print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
        return out, dt

    scene = surface_scene(n, seed=13)
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    settings = RenderSettings(background=(0.0, 0.0, 0.0), max_depth=4,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    cfg = BinningConfig()
    t0 = time.perf_counter()
    accel = gt.build_grid_accel(scene)
    print(f"grid build: {time.perf_counter() - t0:.2f} s  "
          f"stats={accel.stats_dict}", flush=True)

    # Realistic bounce-1 rays: primary hit points + cosine-sampled dirs.
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
    # cosine hemisphere about nrm
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
    alive = (jax.random.uniform(jax.random.key(3), (r,)) < alive_frac) \
        & prim["hit"]
    frac = float(jnp.mean(alive))
    print(f"rays={r}  alive={frac:.3f}", flush=True)
    borig, bdirs, alive = jax.device_put((borig, bdirs, alive))
    fence(borig, bdirs, alive)

    if which in ("all", "trace"):
        f = jax.jit(lambda a, o, d, m: gt.trace_grid(
            scene, Rays(o, d), settings, a, active=m))
        timed("trace_grid 2.07M", lambda: f(accel, borig, bdirs, alive))

    if which in ("all", "vis"):
        t_end = jnp.full((r,), 4.0)
        fv = jax.jit(lambda a, o, d, te, m: gt.visibility_grid(
            scene, a, o, d, te, settings, active=m))
        timed("visibility_grid 2.07M",
              lambda: fv(accel, borig, bdirs, t_end, alive))

    if which in ("all", "sort"):
        def sortperm(o, d, m):
            # pack (dead, morton16) into one int32 key
            cell = jnp.clip(((o - accel.lo[None])
                             / (accel.hi - accel.lo)[None] * 63), 0, 63)
            c = cell.astype(jnp.int32)
            keym = (c[:, 0] << 12) | (c[:, 1] << 6) | c[:, 2]
            key = jnp.where(m, keym, 1 << 30)
            sel = jnp.argsort(key)
            return o[sel], d[sel], m[sel], sel
        fs = jax.jit(sortperm)
        timed("argsort+permute 2.07M",
              lambda: fs(borig, bdirs, alive))

    if which in ("all", "census"):
        # alive fraction after k heavy steps of the raw phase marcher
        def census(a, o, d, m, steps):
            setup_alive = m
            r_ = o.shape[0]
            carry = dict(
                t=jnp.zeros((r_,)), trans=jnp.ones((r_,)),
                alive=setup_alive, step=jnp.int32(0),
                acc={k: jnp.zeros((r_,)) for k in gt._ACC_KEYS})
            # use _march internals honestly: recompute setup
            setup = gt._ray_setup(o, d, a, settings.t_min)
            carry["t"] = setup["t_entry"]
            carry["alive"] = setup["inside"] & m
            out = gt._march_phase(a, o, d, settings, steps, None, True,
                                  1, carry)
            return jnp.sum(out["alive"])
        sub = 262144
        fc = jax.jit(lambda a, o, d, m, s: census(a, o, d, m, s),
                     static_argnames=("s",))
        for steps in (4, 8, 16, 24, 32, 48, 64, 96, 128):
            na = fc(accel, borig[:sub], bdirs[:sub], alive[:sub], steps)
            print(f"  alive after {steps:4d} heavy steps: "
                  f"{float(na) / sub:.4f}", flush=True)


if __name__ == "__main__":
    main()
