"""Bisect the TPU worker fault in the capture-pose program (VERDICT r4 #1).

The failing shape: make_tiled_pose_renderer's pose_loop — a
lax.fori_loop over spp whose body is pathtrace_camera (Pallas tile
primary + grid bounce marches) at 800x800 depth-4 — kills the v5e
worker ("kernel fault").  Known prior trigger (round 2, DESIGN.md):
scan-of-(while_loop + large gather).  This script runs ONE configuration
per process so a crash doesn't poison later runs:

    python benchmarks/debug_pose_fault.py MODE RES SPP [DEPTH]

MODE:
  jit1     pathtrace_camera as a plain jit, SPP sequential host calls
  fori     pose_loop (lax.fori_loop over spp) in one jit   <- faulting shape
  unroll   python-unrolled spp samples inside one jit
  forinp   fori_loop over spp but WITHOUT the Pallas primary (flat
           pathtrace over generate_rays chunks)
"""
import sys
import time
import os


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    mode = sys.argv[1]
    res_arg = sys.argv[2]           # "800" or "1920x1080"
    spp = int(sys.argv[3])
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, toroidal_c2w,
    )
    from pathtracer_gaussiansplatting_tpu.core import rng as rng_mod
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
        build_grid_accel,
    )
    from pathtracer_gaussiansplatting_tpu.render.lights import (
        build_light_tables,
    )
    from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
        accumulate, pathtrace_camera,
    )
    from pathtracer_gaussiansplatting_tpu.render.pipeline import (
        make_trace_backend,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import prepare_tiles

    if "x" in res_arg:
        res_w, res_h = (int(v) for v in res_arg.split("x"))
    else:
        res_w = res_h = int(res_arg)
    res = res_h  # kept for log labels
    n = int(os.environ.get("GSPT_N", 500_000))
    scene = surface_scene(n, seed=13)
    settings = RenderSettings(max_depth=depth,
                              opaque_depth=4 if depth > 4 else 0,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    accel = build_grid_accel(scene)
    trace_fn, vis_fn = make_trace_backend(scene, settings, "grid",
                                          accel=accel)
    tables = build_light_tables(scene)
    cfg = BinningConfig()
    c2w = toroidal_c2w(123.0, 20.0, 2.5, 0.3)
    cam = Camera(c2w=c2w, fov_y_deg=45.0, width=res_w, height=res_h)
    pk = prepare_tiles(scene, cam, settings, cfg)
    base_key = jax.random.PRNGKey(13)

    def fence(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    t_compile = time.perf_counter()
    if mode == "jit1":
        fn = jax.jit(lambda s, p, tb, tf, vf, key, jit_: pathtrace_camera(
            s, cam, settings, key, packets=p, tables=tb, trace_fn=tf,
            visibility_fn=vf, config=cfg, jitter=jit_))
        jit0 = rng_mod.subpixel_jitter(base_key, res_h, res_w, 0)
        fence(fn(scene, pk, tables, trace_fn, vis_fn,
                 rng_mod.frame_key(base_key, 0), jit0))
        print(f"[ok] compile {time.perf_counter() - t_compile:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        acc = jnp.zeros((res_w * res_h, 3))
        for i in range(spp):
            cur = fn(scene, pk, tables, trace_fn, vis_fn,
                     rng_mod.frame_key(base_key, i),
                     rng_mod.subpixel_jitter(base_key, res_h, res_w, i))
            acc = accumulate(acc, cur, i)
        fence(acc)
        dt = time.perf_counter() - t0
    elif mode in ("fori", "unroll"):
        @jax.jit
        def pose(scene_, pk_, tb_, tf_, vf_, acc0):
            def body(i, acc):
                fkey = rng_mod.frame_key(base_key, i)
                jit_ = rng_mod.subpixel_jitter(base_key, res_h, res_w, i)
                cur = pathtrace_camera(
                    scene_, cam, settings, fkey, packets=pk_, tables=tb_,
                    trace_fn=tf_, visibility_fn=vf_, config=cfg,
                    jitter=jit_)
                return accumulate(acc, cur, i)
            if mode == "fori":
                return jax.lax.fori_loop(0, spp, body, acc0)
            acc = acc0
            for i in range(spp):
                acc = body(i, acc)
            return acc

        acc0 = jnp.zeros((res_w * res_h, 3))
        fence(pose(scene, pk, tables, trace_fn, vis_fn, acc0))
        print(f"[ok] compile {time.perf_counter() - t_compile:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        fence(pose(scene, pk, tables, trace_fn, vis_fn, acc0))
        dt = time.perf_counter() - t0
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"[ok] {mode} res={res_arg} spp={spp} depth={depth}: {dt:.2f}s "
          f"({dt / spp:.2f} s/sample)", flush=True)


if __name__ == "__main__":
    main()
