"""Break down the fwd+bwd training-step cost (bench fwd_bwd_rays_per_s).

Components at the bench config (1M Gaussians, 800x800, K=256):
  * fwd-only render (binning + kernel)
  * fwd+bwd with packets DETACHED (kernel fwd+bwd only; binning/packet
    build prunes from the backward)
  * full fwd+bwd (adds the packet-gather scatter-add backward + SoA
    projection chains)

Run: python benchmarks/profile_fwdbwd.py
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
        prepare_tiles, render_prepared, render_tiled_pallas,
    )

    def fence(*t):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(t)))

    n = int(os.environ.get("GSPT_BENCH_N", 1_000_000))
    res = int(os.environ.get("GSPT_BENCH_RES", 800))
    k = int(os.environ.get("GSPT_BENCH_K", 256))
    scene = random_cloud(n, seed=13, spread=1.5)
    cam = Camera(c2w=look_at((0.0, 0.5, 4.0), (0.0, 0.0, 0.0)),
                 fov_y_deg=50.0, width=res, height=res)
    settings = RenderSettings(background=(0.1, 0.2, 0.3))
    cfg = BinningConfig(max_per_tile=k)

    def timed(label, f, iters=3):
        out = f()
        fence(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        print(f"{label}: {(time.perf_counter() - t0) / iters * 1e3:.1f} ms",
              flush=True)

    fwd = jax.jit(lambda m: jnp.mean(render_tiled_pallas(
        scene.replace(means=m), cam, settings, cfg)["color"] ** 2))
    timed("fwd only (fresh binning)", lambda: fwd(scene.means))

    def loss_detached(m):
        pk = prepare_tiles(scene.replace(means=m), cam, settings, cfg)
        pk = {kk: (jax.lax.stop_gradient(v) if kk != "count" else v)
              for kk, v in pk.items()}
        o = render_prepared(pk, cam, settings, cfg,
                            outputs=("color", "alpha_acc"))
        return jnp.mean(o["color"] ** 2)

    g1 = jax.jit(jax.value_and_grad(loss_detached))
    timed("fwd+bwd, packets detached", lambda: g1(scene.means))

    def loss(m):
        o = render_tiled_pallas(scene.replace(means=m), cam, settings,
                                cfg)
        return jnp.mean(o["color"] ** 2)

    g2 = jax.jit(jax.value_and_grad(loss))
    timed("fwd+bwd full", lambda: g2(scene.means))


if __name__ == "__main__":
    main()
