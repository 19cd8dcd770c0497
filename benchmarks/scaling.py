"""Multi-device scaling benchmark: rays/s efficiency over mesh sizes.

BASELINE target: >=85% rays/s scaling efficiency from 1 chip to N hosts.
Real multi-chip hardware is not attached in round 1, so this harness runs
the SAME sharded programs on virtual host-CPU devices:

  * the ray-DP renderer (scene replicated, rays sharded — the primary
    scaling axis) is the efficiency measurement;
  * the gauss-ring renderer (parallel/shard.py ppermute ring) is exercised
    functionally at 2 devices.

On virtual CPU devices the efficiency numbers reflect host-thread emulation,
NOT ICI — they validate program structure; run this file unchanged on a real
slice (JAX_PLATFORMS=tpu) for hardware numbers.

Output: one JSON line per mesh size + a summary efficiency line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") != "tpu":
    # Default to 8 virtual CPU devices; neutralize the axon single-chip env
    # (the container pins JAX_PLATFORMS=axon) since scaling needs >1 device.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")  # undo axon sitecustomize
import jax.numpy as jnp  # noqa: E402


def main(n_gauss: int = 5000, rays_per_device: int = 4096, iters: int = 3):
    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, generate_rays, look_at,
    )
    from pathtracer_gaussiansplatting_tpu.core.types import Rays, RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.parallel import mesh as mesh_mod
    from pathtracer_gaussiansplatting_tpu.parallel.shard import (
        render_dense_ray_sharded, ring_topk_radiance,
    )

    devs = jax.devices()
    settings = RenderSettings(max_contribs=32)
    scene = random_cloud(n_gauss, seed=13, spread=1.2)

    def rays_for(nd):
        # exactly rays_per_device * nd rays (divisibility by the mesh axis)
        cam = Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
                     width=rays_per_device, height=nd)
        return generate_rays(cam)

    results = []
    for nd in [s for s in (1, 2, 4, 8) if s <= len(devs)]:
        mesh = mesh_mod.make_mesh((nd, 1), devices=devs[:nd])
        rays = rays_for(nd)
        out = render_dense_ray_sharded(scene, rays, settings, mesh)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = render_dense_ray_sharded(scene, rays, settings, mesh)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        rps = rays.num_rays / dt
        results.append(dict(mode="ray-dp", devices=nd,
                            rays_per_s=round(rps),
                            rays_per_s_per_device=round(rps / nd)))
        print(json.dumps(results[-1]), flush=True)

    # functional check of the gauss ring at 2 devices
    if len(devs) >= 2:
        mesh = mesh_mod.make_mesh((1, 2), devices=devs[:2])
        padded = mesh_mod.pad_to_multiple(scene, 2)
        sharded = mesh_mod.shard_scene(padded, mesh)
        rays = rays_for(1)
        origins = jax.device_put(rays.origins, mesh_mod.ray_sharding(mesh))
        dirs = jax.device_put(rays.directions, mesh_mod.ray_sharding(mesh))
        out = ring_topk_radiance(sharded, Rays(origins, dirs), settings, mesh)
        ok = bool(jnp.isfinite(out).all())
        print(json.dumps(dict(mode="gauss-ring", devices=2,
                              functional_ok=ok)), flush=True)

    base = results[0]["rays_per_s_per_device"]
    effs = {r["devices"]: round(r["rays_per_s_per_device"] / base, 3)
            for r in results}
    print(json.dumps(dict(
        summary="weak-scaling efficiency vs 1 device (CPU-emulated "
                "collectives; run on a real slice for ICI numbers)",
        efficiencies=effs)))


if __name__ == "__main__":
    main()
