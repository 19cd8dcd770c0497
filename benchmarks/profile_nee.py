"""Dissect the in-frame NEE shadow march (round 4).

Reconstructs the EXACT depth-1 NEE visibility inputs (positions/dirs/
t_end/active from the primary interaction + emissive sampling) and times
visibility_grid standalone, reporting active fraction, frozen count, and
sensitivity to the active mask and t_end.

Run: python benchmarks/profile_nee.py
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

    from pathtracer_gaussiansplatting_tpu.core import rng as rng_mod
    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt
    from pathtracer_gaussiansplatting_tpu.render import lights as lights_mod
    from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
        interaction_from_tile_arrays,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    def fence(*t):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(t)))

    scene = surface_scene(500_000, seed=13)
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=1920, height=1080)
    settings = RenderSettings(background=(0, 0, 0), max_depth=4,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    accel = gt.build_grid_accel(scene)
    tables = lights_mod.build_light_tables(scene)
    pk = prepare_tiles(scene, cam, settings, BinningConfig())
    out = render_prepared(pk, cam, settings, BinningConfig(),
                          outputs=("tile_feats", "tile_alpha",
                                   "tile_depth", "tile_dirs"))
    t_, p_, _ = out["tile_dirs"].shape
    r = t_ * p_
    dirs0 = out["tile_dirs"].reshape(r, 3)
    origins0 = jnp.broadcast_to(cam.c2w[:3, 3][None], (r, 3))
    inter = interaction_from_tile_arrays(out, origins0, dirs0, settings)

    key = jax.random.fold_in(jax.random.key(13), 0)
    u_strat = rng_mod.ray_uniform(key, r, 10)[:, 0]
    u_sel = rng_mod.ray_uniform(key, r, 7)[:, 0]
    u_disk = rng_mod.ray_uniform(key, r, 8, 2)
    take_emissive = u_strat < tables.p_emissive
    em = lights_mod.sample_emissive(u_sel, u_disk, scene, tables)
    pos = inter["position"]
    n = inter["normal"]
    to_l = em["position"] - pos
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-4))
    l_dir = to_l / dist[:, None]
    n_dot_l = jnp.sum(n * l_dir, -1)
    cos_light = jnp.abs(jnp.sum(-l_dir * em["normal"], -1))
    ok = (n_dot_l > 1e-3) & (cos_light > 1e-3)
    active = ok & take_emissive & (tables.emissive_flux > 0)
    eps = settings.shadow_eps
    o = pos + n * eps
    te = dist - 2 * eps
    o, l_dir, te, active = jax.device_put((o, l_dir, te, active))
    fence(o, l_dir, te, active)
    print(f"rays={r} active={float(jnp.mean(active)):.3f} "
          f"t_end p50={float(jnp.median(te)):.2f}", flush=True)

    def timed(label, f, iters=2):
        outp = f()
        fence(outp)
        t0 = time.perf_counter()
        for _ in range(iters):
            outp = f()
        fence(outp)
        print(f"{label}: {(time.perf_counter() - t0) / iters * 1e3:.0f} ms",
              flush=True)
        return outp

    fv = jax.jit(lambda a_, o_, d_, t__, m: gt.visibility_grid(
        scene, a_, o_, d_, t__, settings, active=m, return_frozen=True))
    v, fr = timed("NEE vis (exact frame inputs)",
                  lambda: fv(accel, o, l_dir, te, active))
    print(f"  frozen={int(fr)}  vis p50={float(jnp.median(v)):.3f}",
          flush=True)
    timed("NEE vis, no active mask",
          lambda: fv(accel, o, l_dir, te, jnp.ones_like(active)))
    timed("NEE vis, t_end=10",
          lambda: fv(accel, o, l_dir, jnp.full_like(te, 10.0), active))


if __name__ == "__main__":
    main()
