"""March parameter sweeps on the real TPU (round 4 design probes).

  * jump_steps sweep: how many cheap probe-jumps per heavy step pay off
  * transmittance_min sweep: how much earlier rays can be declared dead
  * composite census: of all heavy steps executed, what fraction land on
    an OCCUPIED cell (the rest waste the packet gathers)
  * gather microbench: row-rate for int32 probes vs packet rows of
    various widths, at 2.07M rows

Run: python benchmarks/profile_march2.py [jump|trans|census|gather|all]
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

    if which == "gather":
        # Row-gather microbench: 2.07M random rows from (S, width) tables.
        r = 2 ** 21
        key = jax.random.key(0)
        for s, width, dtype in ((20000, 1, jnp.int32),
                                (330000, 1, jnp.int32),
                                (5300000, 1, jnp.int32),
                                (20000, 128, jnp.int32),
                                (20000, 384, jnp.float32),
                                (20000, 512, jnp.float32),
                                (20000, 768, jnp.float32),
                                (20000, 384 + 256, jnp.float32),
                                (20000, 1024, jnp.float32),
                                (20000, 768, jnp.bfloat16),
                                (20000, 1536, jnp.bfloat16)):
            if width == 1:
                tab = jnp.zeros((s,), dtype)
            else:
                tab = jnp.zeros((s, width), dtype)
            idx = jax.random.randint(key, (r,), 0, s)
            f = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32),
                                             -1 if t.ndim > 1 else None))
            fence(f(tab, idx))
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(tab, idx)
            fence(out)
            dt = (time.perf_counter() - t0) / 3
            by = width * jnp.dtype(dtype).itemsize
            print(f"gather S={s} row={by}B {np.dtype(dtype).name}: "
                  f"{dt * 1e3:.2f} ms = {dt / r * 1e9:.2f} ns/row, "
                  f"{r * by / dt / 1e9:.0f} GB/s", flush=True)
        return

    scene = surface_scene(n, seed=13)
    cam = Camera(c2w=look_at((0.0, 0.2, 1.7), (0.0, -0.4, -0.5)),
                 fov_y_deg=60.0, width=w, height=h)
    settings = RenderSettings(background=(0.0, 0.0, 0.0), max_depth=4,
                              ambient=(0.05, 0.05, 0.06, 1.0))
    cfg = BinningConfig()
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
    print(f"rays={r} alive={float(jnp.mean(alive)):.3f}", flush=True)

    if which in ("all", "jump"):
        for js in (1, 2, 3, 4):
            f = jax.jit(lambda a_, o, d, m, js=js: gt.trace_grid(
                scene, Rays(o, d), settings, a_, jump_steps=js, active=m))
            timed(f"trace jump_steps={js}",
                  lambda: f(accel, borig, bdirs, alive))

    if which in ("all", "trans"):
        for tm in (1e-4, 1e-3, 1e-2):
            s2 = RenderSettings(
                background=(0.0, 0.0, 0.0), max_depth=4,
                ambient=(0.05, 0.05, 0.06, 1.0), transmittance_min=tm)
            f = jax.jit(lambda a_, o, d, m, s2=s2: gt.trace_grid(
                scene, Rays(o, d), settings, a_, active=m))
            timed(f"trace trans_min={tm}",
                  lambda: f(accel, borig, bdirs, alive))

    if which in ("all", "census"):
        # fraction of heavy steps that composite an occupied cell, and
        # distribution of occupied-composite count per ray
        sub = 262144
        o, d, m = borig[:sub], bdirs[:sub], alive[:sub]
        setup = gt._ray_setup(o, d, accel, settings.t_min)
        dims = accel.dims
        dims_arr = jnp.asarray(dims)
        n_cells = accel.cell_map.shape[0]

        def census(o, d, m):
            setup = gt._ray_setup(o, d, accel, settings.t_min)
            t_ = setup["t_entry"]
            alive_ = setup["inside"] & m
            occ_steps = jnp.zeros((sub,), jnp.int32)
            tot_steps = jnp.zeros((sub,), jnp.int32)
            cell_size = setup["cell_size"]
            inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            eps = 1e-3 * setup["min_delta"]
            lo = accel.lo[None]

            def body(c):
                t_, alive_, occ, tot = c
                ppos = o + (t_ + 0.25 * eps)[:, None] * d
                cell = jnp.clip(jnp.floor((ppos - lo) / cell_size[None]),
                                0, dims_arr.astype(jnp.float32) - 1)
                icell = cell.astype(jnp.int32)
                lin = jnp.clip(gt._cell_linear(icell, dims), 0, n_cells - 1)
                cm = accel.cell_map[jnp.where(alive_, lin, 0)]
                bnd = lo + (cell + setup["step_pos"]) * cell_size[None]
                t_exit = jnp.maximum(
                    jnp.min((bnd - o) * inv_d, -1), t_ + eps)
                occupied = cm >= 0
                occ = occ + (alive_ & occupied).astype(jnp.int32)
                tot = tot + alive_.astype(jnp.int32)
                dist = (-cm).astype(jnp.float32)
                t_new = jnp.where(
                    occupied, t_exit,
                    jnp.maximum(t_exit,
                                t_ + (dist - 1.0) * setup["min_delta"]))
                t_new = jnp.where(alive_, t_new, t_)
                alive_ = alive_ & (t_new < setup["t_far"])
                return (t_new, alive_, occ, tot)

            c = (t_, alive_, occ_steps, tot_steps)
            for _ in range(192):
                c = body(c)
            return c[2], c[3]

        occ, tot = jax.jit(census)(o, d, m)
        occ, tot = np.asarray(occ), np.asarray(tot)
        print(f"iterations/ray (no jump loop): mean={tot.mean():.1f} "
              f"p50={np.percentile(tot, 50):.0f} "
              f"p90={np.percentile(tot, 90):.0f} "
              f"p99={np.percentile(tot, 99):.0f}", flush=True)
        print(f"occupied composites/ray: mean={occ.mean():.1f} "
              f"p50={np.percentile(occ, 50):.0f} "
              f"p90={np.percentile(occ, 90):.0f} "
              f"p99={np.percentile(occ, 99):.0f}", flush=True)
        print(f"occupied fraction of iterations: "
              f"{occ.sum() / max(tot.sum(), 1):.3f}", flush=True)


if __name__ == "__main__":
    main()
