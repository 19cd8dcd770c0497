"""Benchmark harness: rays/s on the flagship forward (and fwd+bwd) path.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "rays/s", "vs_baseline": N, ...}

Workload: the reference's capture loop renders accumulation_steps (512)
samples per camera pose (engine.cpp:2684); per-pose preprocessing (projection
+ binning + packet gathers — the TLAS-build analog) is amortized across
samples. Headline = amortized rays/s of the fused Pallas tile renderer at 1M
Gaussians, 800x800, 512 spp. The reference publishes no renderer-throughput
numbers (BASELINE.md), so vs_baseline compares against the naive dense
O(R*N) pure-JAX renderer on the same hardware (measured at a feasible N and
scaled linearly in N — dense cost is exactly linear in N).

Timing: the axon TPU tunnel dispatches asynchronously; every timed section is
fenced by pulling a scalar reduction of its outputs to the host.

Env overrides: GSPT_BENCH_N, GSPT_BENCH_RES, GSPT_BENCH_ITERS, GSPT_BENCH_K,
GSPT_BENCH_SPP.
"""
import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    iters = int(os.environ.get("GSPT_BENCH_ITERS", 10))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    spp = int(os.environ.get("GSPT_BENCH_SPP", 512))

    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, generate_rays, look_at,
    )
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings, Rays
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.reference import (
        render_radiance_dense,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    def fence(*trees):
        # The axon tunnel executes out of order across outputs: fencing ONE
        # output of a computation does not drain the rest, and leftover work
        # bleeds into the next timed section. Pull a scalar from EVERY leaf.
        leaves = jax.tree.leaves(trees)
        return float(sum(jnp.sum(a) for a in leaves))

    dev = jax.devices()[0]
    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)
    rays_per_frame = res * res

    # --- per-pose preprocessing (binning; amortized over spp) ---
    pk = prepare_tiles(scene, cam, settings, cfg)
    fence(pk)  # compile
    t0 = time.perf_counter()
    for _ in range(max(2, iters // 3)):
        pk = prepare_tiles(scene, cam, settings, cfg)
    fence(pk)
    dt_prep = (time.perf_counter() - t0) / max(2, iters // 3)

    # --- per-sample forward (Pallas tile kernel; production channels only —
    #     untiling the full 14-channel feature image is the path tracer's
    #     concern and it consumes tile-major features directly) ---
    fwd = lambda: render_prepared(pk, cam, settings, cfg,
                                  outputs=("color", "alpha_acc"))
    fence(fwd())  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd()
    fence(out["color"], out["alpha_acc"])
    dt_samp = (time.perf_counter() - t0) / iters
    rays_samp = rays_per_frame / dt_samp
    rays_amortized = spp * rays_per_frame / (dt_prep + spp * dt_samp)

    # --- forward+backward (differentiable render, fresh binning each step:
    #     the training workload where the camera changes every batch) ---
    from pathtracer_gaussiansplatting_tpu.render.tiled import render_tiled_pallas

    def loss(means):
        o = render_tiled_pallas(scene.replace(means=means), cam, settings, cfg)
        return jnp.mean(o["color"] ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    fence(grad_fn(scene.means))  # compile
    t0 = time.perf_counter()
    fb_iters = max(2, iters // 3)
    for _ in range(fb_iters):
        l, g = grad_fn(scene.means)
    fence(l, g)
    dt_fb = (time.perf_counter() - t0) / fb_iters
    rays_fb = rays_per_frame / dt_fb

    # --- naive dense baseline, measured at feasible N and scaled (O(N)) ---
    n_base = min(n, 50_000)
    base_scene = jax.tree.map(lambda x: x[:n_base], scene)
    sub = generate_rays(Camera(c2w=cam.c2w, fov_y_deg=cam.fov_y_deg,
                               width=64, height=32))
    dense_settings = RenderSettings(max_contribs=min(k, 256),
                                    background=settings.background)
    dense = jax.jit(lambda s, o, d: render_radiance_dense(
        s, Rays(o, d), dense_settings))
    fence(dense(base_scene, sub.origins, sub.directions))
    t0 = time.perf_counter()
    for _ in range(max(2, iters // 3)):
        img = dense(base_scene, sub.origins, sub.directions)
    fence(img)
    dt_dense = (time.perf_counter() - t0) / max(2, iters // 3)
    rays_dense_at_n = (sub.num_rays / dt_dense) * (n_base / n)
    vs_baseline = rays_amortized / rays_dense_at_n

    result = {
        "metric": f"amortized primary rays/s/chip, pallas tile renderer, "
                  f"{n} gaussians, {res}x{res}, K={k}, {spp}spp/pose",
        "value": round(rays_amortized),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 1),
        "per_sample_rays_per_s": round(rays_samp),
        "fwd_bwd_rays_per_s": round(rays_fb),
        "binning_ms_per_pose": round(dt_prep * 1e3, 1),
        "sample_ms": round(dt_samp * 1e3, 2),
        "dense_baseline_rays_per_s_scaled": round(rays_dense_at_n),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
