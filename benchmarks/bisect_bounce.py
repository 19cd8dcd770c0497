"""Bisect the TPU worker crash in the multi-bounce grid path (VERDICT r2 #1).

Each stage isolates one component of pathtrace_camera on the real TPU.
Run:  python benchmarks/bisect_bounce.py <stage>
Stages:
  primary      - Pallas tile primary alone at WxH (default 1920x1080)
  grid_build   - build_grid_accel host-side at N Gaussians
  trace        - one trace_grid aggregate trace on a CHUNK-ray batch
  trace2       - two chained traces (bounce continuation shape)
  grid_vis     - visibility_grid on a flat CHUNK-ray batch
  pt_flat      - pathtrace (grid backend) on a flat CHUNK-ray batch
  pt_nonee     - pathtrace with NEE disabled (isolates shadow marches)
  pt_map       - lax.map over 4 CHUNK-ray chunks of pathtrace
  combo        - Pallas primary + one grid march in ONE jit
  ptprim       - pathtrace with precomputed tile primary (no untile)
  ptprim_notile- same, primary detached via stop_gradient
  pt_untile    - ptprim + the final untile transpose
  full         - pathtrace_camera end to end
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    stage = sys.argv[1]
    known = ("primary", "grid_build", "trace", "trace2", "grid_vis",
             "pt_flat", "pt_nonee", "pt_map", "combo", "ptprim",
             "ptprim_notile", "pt_untile", "full")
    if stage not in known:
        raise SystemExit(f"unknown stage {stage!r}; choose from {known}")
    import jax
    import jax.numpy as jnp

    from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
    from pathtracer_gaussiansplatting_tpu.core.types import (
        Rays, RenderSettings,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.lights import (
        build_light_tables,
    )
    from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
        pathtrace, pathtrace_camera,
    )
    from pathtracer_gaussiansplatting_tpu.render.pipeline import (
        make_trace_backend,
    )
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    n = int(os.environ.get("GSPT_BENCH_N", 500_000))
    w = int(os.environ.get("GSPT_BENCH_W", 1920))
    h = int(os.environ.get("GSPT_BENCH_H", 1080))
    depth = int(os.environ.get("GSPT_BENCH_DEPTH", 4))
    chunk = int(os.environ.get("GSPT_BENCH_CHUNK", 16384))

    def fence(*trees):
        return float(sum(jnp.sum(a) for a in jax.tree.leaves(trees)))

    def timed(label, f, iters=3):
        t0 = time.perf_counter()
        out = f()
        fence(out)
        print(f"{label} compile+run: {time.perf_counter() - t0:.2f} s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        fence(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
        return out

    scene = surface_scene(n, seed=13)
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    settings = RenderSettings(background=(0.0, 0.0, 0.0), max_depth=depth,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    cfg = BinningConfig()
    key = jax.random.key(13)
    print(f"stage={stage} n={n} {w}x{h} depth={depth} chunk={chunk}",
          flush=True)

    if stage == "primary":
        pk = prepare_tiles(scene, cam, settings, cfg)
        fence(pk)
        print("prep done", flush=True)
        f = jax.jit(lambda p: render_prepared(
            p, cam, settings, cfg,
            outputs=("tile_feats", "tile_alpha", "tile_depth", "tile_dirs")))
        timed("primary", lambda: f(pk))
        return

    # grid stages need the accel
    t0 = time.perf_counter()
    trace_fn, vis_fn = make_trace_backend(scene, settings, "grid")
    print(f"grid build: {time.perf_counter() - t0:.2f} s", flush=True)
    if stage == "grid_build":
        return

    o = jax.random.normal(jax.random.key(0), (chunk, 3)) * 0.5
    d = jax.random.normal(jax.random.key(1), (chunk, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(o, d)

    if stage == "trace":
        f = jax.jit(lambda s, tf, r: tf(s, r, settings))
        timed("trace", lambda: f(scene, trace_fn, rays))
        return

    if stage == "trace2":
        def run(s, tf, r):
            i1 = tf(s, r, settings)
            o2 = i1["position"] + i1["normal"] * 0.05
            d2 = jnp.where((i1["normal"][:, :1] != 0), -r.directions,
                           r.directions)
            i2 = tf(s, Rays(o2, d2), settings)
            return i1["albedo"] + i2["albedo"]
        f = jax.jit(run)
        timed("trace2", lambda: f(scene, trace_fn, rays), iters=1)
        return

    if stage == "grid_vis":
        timed("grid_vis", lambda: vis_fn(o, d, jnp.full((chunk,), 10.0)))
        return

    tables = build_light_tables(scene)

    if stage in ("pt_flat", "pt_nonee"):
        if stage == "pt_nonee":
            settings = RenderSettings(background=(0.1, 0.2, 0.3),
                                      max_depth=depth, nee=False)
        f = jax.jit(lambda s, r, tb, tf, vf, k: pathtrace(
            s, r, settings, k, tables=tb, trace_fn=tf, visibility_fn=vf))
        timed(stage, lambda: f(scene, rays, tables, trace_fn, vis_fn,
                               key))
        return

    if stage == "pt_map":
        os4 = jnp.stack([o] * 4)
        ds4 = jnp.stack([d] * 4)

        def run(s, tb, tf, vf, k):
            def chunk_fn(args):
                i, oo, dd = args
                return pathtrace(s, Rays(oo, dd), settings,
                                 jax.random.fold_in(k, i), tables=tb,
                                 trace_fn=tf, visibility_fn=vf)
            return jax.lax.map(chunk_fn, (jnp.arange(4), os4, ds4))

        f = jax.jit(run)
        timed("pt_map", lambda: f(scene, tables, trace_fn, vis_fn, key))
        return

    if stage == "combo":
        # Minimal Pallas-primary + grid-march in ONE jit (no pathtrace).
        pk = prepare_tiles(scene, cam, settings, cfg)
        fence(pk)
        print("prep done", flush=True)

        def run(s, p, tf):
            out = render_prepared(
                p, cam, settings, cfg,
                outputs=("tile_alpha", "tile_dirs"))
            t, pp, _ = out["tile_dirs"].shape
            dd = out["tile_dirs"].reshape(t * pp, 3)[:chunk]
            oo = jnp.broadcast_to(cam.c2w[:3, 3][None], (chunk, 3))
            inter = tf(s, Rays(oo, dd), settings)
            return jnp.sum(inter["albedo"]) + jnp.sum(out["tile_alpha"])

        f = jax.jit(run)
        timed("combo", lambda: f(scene, pk, trace_fn))
        return

    if stage in ("ptprim", "ptprim_notile"):
        # pathtrace with a PRECOMPUTED primary interaction (the full
        # pipeline minus lax.map and minus the final untile).
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            interaction_from_tile_arrays,
        )
        pk = prepare_tiles(scene, cam, settings, cfg)
        fence(pk)
        print("prep done", flush=True)

        use_pallas = stage == "ptprim"

        def run(s, p, tb, tf, vf, k):
            out = render_prepared(
                p, cam, settings, cfg,
                outputs=("tile_feats", "tile_alpha", "tile_depth",
                         "tile_dirs"))
            t, pp, _ = out["tile_dirs"].shape
            dd = out["tile_dirs"].reshape(t * pp, 3)[:chunk]
            oo = jnp.broadcast_to(cam.c2w[:3, 3][None], (chunk, 3))
            prim = interaction_from_tile_arrays(
                out, jnp.broadcast_to(cam.c2w[:3, 3][None], (t * pp, 3)),
                out["tile_dirs"].reshape(t * pp, 3), settings)
            prim = {kk: v[:chunk] for kk, v in prim.items()}
            if not use_pallas:
                prim = jax.tree.map(jax.lax.stop_gradient, prim)
            return pathtrace(s, Rays(oo, dd), settings, k, tables=tb,
                             trace_fn=tf, visibility_fn=vf,
                             primary_interaction=prim)

        f = jax.jit(run)
        timed(stage, lambda: f(scene, pk, tables, trace_fn, vis_fn, key),
              iters=1)
        return

    if stage == "pt_untile":
        # ptprim + the final untile transpose (the full path minus lax.map)
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            interaction_from_tile_arrays,
        )
        from pathtracer_gaussiansplatting_tpu.render.tiled import (
            untile_image,
        )
        pk = prepare_tiles(scene, cam, settings, cfg)
        fence(pk)
        print("prep done", flush=True)

        def run(s, p, tb, tf, vf, k):
            out = render_prepared(
                p, cam, settings, cfg,
                outputs=("tile_feats", "tile_alpha", "tile_depth",
                         "tile_dirs"))
            t, pp, _ = out["tile_dirs"].shape
            dd = out["tile_dirs"].reshape(t * pp, 3)
            oo = jnp.broadcast_to(cam.c2w[:3, 3][None], (t * pp, 3))
            prim = interaction_from_tile_arrays(out, oo, dd, settings)
            rad = pathtrace(s, Rays(oo, dd), settings, k, tables=tb,
                            trace_fn=tf, visibility_fn=vf,
                            primary_interaction=prim)
            img = untile_image(rad.reshape(t, pp, 3), cam, cfg)
            return img.reshape(-1, 3)

        f = jax.jit(run)
        timed(stage, lambda: f(scene, pk, tables, trace_fn, vis_fn, key),
              iters=1)
        return

    if stage == "full":
        pk = prepare_tiles(scene, cam, settings, cfg)
        fence(pk)
        print("prep done", flush=True)
        f = jax.jit(lambda s, p, tb, tf, vf, k: pathtrace_camera(
            s, cam, settings, k, packets=p, tables=tb, trace_fn=tf,
            visibility_fn=vf, config=cfg, chunk=chunk))
        timed("full", lambda: f(scene, pk, tables, trace_fn, vis_fn, key))
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
