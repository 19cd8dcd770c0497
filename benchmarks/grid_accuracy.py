"""Grid-backend accuracy vs the dense oracle at flagship scale (VERDICT r4 #5).

Renders one pose's PRIMARY interaction of the flagship 500k-Gaussian
surface scene through (a) the exact dense oracle and (b) the grid
marcher at several per-cell capacities, and reports PSNR / mean-abs
errors of the composited channels. This isolates the acceleration
structure's error sources (extent-percentile clamp + per-cell capacity
eviction) from path-tracing noise.

Run: python benchmarks/grid_accuracy.py  (writes GRID_ACCURACY.json)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, generate_rays, look_at,
    )
    from pathtracer_gaussiansplatting_tpu.core.types import (
        Rays, RenderSettings,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt
    from pathtracer_gaussiansplatting_tpu.render.reference import trace_dense
    from pathtracer_gaussiansplatting_tpu.utils.metrics import psnr

    n = int(os.environ.get("GSPT_BENCH_N", 500_000))
    w = int(os.environ.get("GSPT_ACC_W", 320))
    h = int(os.environ.get("GSPT_ACC_H", 180))
    # dense oracle materializes (N, chunk, 3): 512 rays x 500k = 3 GB
    chunk = int(os.environ.get("GSPT_ACC_CHUNK", 512))

    scene = surface_scene(n, seed=13)
    settings = RenderSettings(max_depth=4, ambient=(0.05, 0.05, 0.06, 1.0))
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    rays = generate_rays(cam)
    r = rays.num_rays

    def run_dense():
        dense = jax.jit(lambda o, d: trace_dense(
            scene, Rays(o, d), settings))
        outs = []
        for s in range(0, r, chunk):
            e = min(s + chunk, r)
            inter = dense(rays.origins[s:e], rays.directions[s:e])
            outs.append({k: np.asarray(inter[k])
                         for k in ("albedo", "alpha_acc", "depth")})
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}

    def run_grid(accel):
        # trace_grid is itself jitted: scene/accel ride as ARGUMENTS
        # (closure capture bakes the tables into the HLO -> HTTP 413
        # on the axon remote-compile service).
        inter = gt.trace_grid(scene, Rays(rays.origins, rays.directions),
                              settings, accel)
        return ({k: np.asarray(inter[k])
                 for k in ("albedo", "alpha_acc", "depth")},
                int(inter["frozen_alive"]))

    t0 = time.perf_counter()
    ref = run_dense()
    print(f"dense oracle: {time.perf_counter() - t0:.1f}s "
          f"({r} rays x {n})", flush=True)

    def compare(out):
        # albedo is an alpha-weighted sum in [0, ~1]; PSNR over it and
        # over alpha directly; depth error only where both sides hit.
        res = {}
        res["psnr_albedo"] = float(psnr(
            jnp.asarray(out["albedo"]), jnp.asarray(ref["albedo"]),
            max_val=1.0))
        res["psnr_alpha"] = float(psnr(
            jnp.asarray(out["alpha_acc"]), jnp.asarray(ref["alpha_acc"]),
            max_val=1.0))
        hit = (ref["alpha_acc"] > 0.5) & (out["alpha_acc"] > 0.5)
        res["mean_abs_depth_err_hit"] = float(
            np.abs(out["depth"] - ref["depth"])[hit].mean())
        res["mean_abs_alpha_err"] = float(
            np.abs(out["alpha_acc"] - ref["alpha_acc"]).mean())
        return res

    results = {"config": f"{n} gaussians, {w}x{h} primary interaction, "
                         "surface scene seed 13"}
    for kc, budget in ((32, 2.5e9), (64, 6.0e9)):
        t0 = time.perf_counter()
        accel = gt.build_grid_accel(scene, max_per_cell=kc,
                                    memory_budget_bytes=budget)
        out, frozen = run_grid(accel)
        stats = accel.stats_dict
        row = compare(out)
        row.update(
            kc=kc,
            dropped_frac=float(stats["dropped_frac"]),
            clamped_frac=float(stats["clamped_frac"]),
            overflow_cell_frac=float(stats["overflow_cell_frac"]),
            dims=list(stats["dims"]),
            frozen_alive=frozen,
            build_s=round(time.perf_counter() - t0, 1),
        )
        results[f"kc{kc}"] = row
        print(json.dumps(row), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "GRID_ACCURACY.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote GRID_ACCURACY.json", flush=True)


if __name__ == "__main__":
    main()
