"""Per-chip cost of the spatial-ring slab compositor (VERDICT r2 #5).

Real multi-chip hardware isn't reachable from this host (one v5e via the
axon tunnel), so this measures the two quantities that determine ring
scaling and records them for BASELINE.md:

  * slab compute: _slab_interaction_feats on ONE device for a slab of
    N/S Gaussians x an R-ray chunk (the per-step body of
    parallel/spatial._ring_composite) — measured on the real chip;
  * carry traffic: bytes/ray/step the ppermute ring moves (rays 6 +
    chunk id 1 + 4 x (feat_dim + 1) accumulator floats), modeled against
    v5e ICI (~186 GB/s/link usable, 45 GB/s/direction x 4 links NoC) —
    comm per step = R_chunk x carry_bytes.

Projected scaling efficiency = t_compute / (t_compute + max(0, t_comm -
overlap)); the ring overlaps ppermute with the next slab's compute, so
the projection reports both overlapped and unoverlapped bounds.

Run:  python benchmarks/spatial_chip.py
Env:  GSPT_SPATIAL_N (2_000_000), GSPT_SPATIAL_SLABS (8),
      GSPT_SPATIAL_RAYS (4096 per-chip chunk)
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

    from pathtracer_gaussiansplatting_tpu.core.types import (
        Rays, RenderSettings,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import surface_scene
    from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
        _slab_interaction_feats, partition_slabs,
    )

    n = int(os.environ.get("GSPT_SPATIAL_N", 2_000_000))
    s = int(os.environ.get("GSPT_SPATIAL_SLABS", 8))
    r = int(os.environ.get("GSPT_SPATIAL_RAYS", 4096))

    scene = surface_scene(n, seed=13)
    slabbed, axis = partition_slabs(scene, s)
    nb = slabbed.num_gaussians // s
    block = jax.tree.map(lambda x: x[:nb], slabbed)   # device-0 slab
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1.2, 1.2, (r, 3)).astype(np.float32))
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    settings = RenderSettings()
    axis_v = jnp.asarray(axis)

    f = jax.jit(lambda b, oo, dd: _slab_interaction_feats(
        b, oo, dd, axis_v, settings))

    def fence(out):
        return float(sum(jnp.sum(x) for x in jax.tree.leaves(out)))

    fence(f(block, o, d))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = f(block, o, d)
    fence(out)
    dt = (time.perf_counter() - t0) / iters

    # --- r5: the SAME slab step through the per-slab grid accel
    # (build_slab_accels / _grid_slab_trace_fn — the within-slab
    # acceleration, VERDICT r4 #8). Measured single-device; the in-ring
    # kernel body is identical compute (shard_map adds only ppermute).
    from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
        build_slab_accels,
    )
    from pathtracer_gaussiansplatting_tpu.render import grid_trace as gt

    r_g = int(os.environ.get("GSPT_SPATIAL_RAYS_GRID", 65536))
    og = jnp.asarray(rng.uniform(-1.2, 1.2, (r_g, 3)).astype(np.float32))
    dg = rng.normal(size=(r_g, 3)).astype(np.float32)
    dg /= np.linalg.norm(dg, axis=-1, keepdims=True)
    dg = jnp.asarray(dg)
    tables, meta = build_slab_accels(slabbed, s)
    accel0 = gt.GridAccel(
        btab=tables["btab"][0], geom=tables["geom"][0],
        packet=tables["packet"][0], lo=tables["lo"][0],
        hi=tables["hi"][0], dims=meta.dims, jump_unit=meta.jump_unit)
    gf = lambda oo, dd: gt.trace_grid(block, Rays(oo, dd), settings,
                                      accel0)
    fence(gf(og, dg))
    t0 = time.perf_counter()
    for _ in range(iters):
        outg = gf(og, dg)
    fence(outg)
    dt_g_total = (time.perf_counter() - t0) / iters
    dt_g = dt_g_total / r_g * r        # per-r-ray-chunk equivalent

    feat_dim = 15
    carry_bytes = 4 * (6 + 1 + 4 * (feat_dim + 1))     # per ray per step
    comm_bytes_step = r * carry_bytes
    ici_bw = 45e9                                       # v5e per-direction
    t_comm = comm_bytes_step / ici_bw
    eff_overlap = dt / max(dt, t_comm)
    eff_serial = dt / (dt + t_comm)
    t_comm_g = r_g * carry_bytes / ici_bw
    eff_g_overlap = dt_g_total / max(dt_g_total, t_comm_g)
    eff_g_serial = dt_g_total / (dt_g_total + t_comm_g)
    result = dict(
        metric="spatial-ring per-chip slab step",
        slab_gaussians=nb, rays_per_chip=r, n_slabs=s,
        slab_compute_ms=round(dt * 1e3, 2),
        pairs_per_step=r * nb,
        carry_bytes_per_ray_step=carry_bytes,
        comm_bytes_per_step=comm_bytes_step,
        comm_ms_at_45GBps=round(t_comm * 1e3, 4),
        projected_scaling_eff_overlapped=round(eff_overlap, 4),
        projected_scaling_eff_serial=round(eff_serial, 4),
        spatial_rays_per_s=round(r / (s * max(dt, t_comm))),
        grid_slab=dict(
            rays_per_chip=r_g,
            slab_march_ms=round(dt_g_total * 1e3, 2),
            comm_ms_at_45GBps=round(t_comm_g * 1e3, 4),
            projected_scaling_eff_overlapped=round(eff_g_overlap, 4),
            projected_scaling_eff_serial=round(eff_g_serial, 4),
            spatial_rays_per_s=round(
                r_g / (s * max(dt_g_total, t_comm_g))),
            vs_dense_slab_speedup=round(dt / dt_g, 1),
            note="grid accel per slab (build_slab_accels); honest "
                 "compute/comm ratio now that slabs are accelerated",
        ),
        device=str(jax.devices()[0]),
    )
    print(json.dumps(result))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SPATIAL_CHIP_r05.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
