"""Spatial partitioning ring (parallel/spatial.py) vs the dense oracle.

Runs on the 8-virtual-device CPU mesh (conftest.py, SURVEY.md §4): Gaussians
live in resident depth slabs; per-ray carry state rotates around the gauss
ring. The dense renderer with slab-axis sort keys is the exact oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pathtracer_gaussiansplatting_tpu.core.types import Rays, RenderSettings
from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
    make_mesh, shard_scene,
)
from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
    partition_slabs, render_spatial, spatial_sharding,
)
from pathtracer_gaussiansplatting_tpu.render.reference import (
    render_radiance_dense,
)
from tests.utils import random_scene


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rays(rng, r, toward=(0, 0, -1), spread=0.3):
    o = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (r, 1))
    d = np.asarray(toward, np.float32)[None] + \
        rng.normal(0, spread, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(jnp.asarray(o), jnp.asarray(d))


class TestSpatialRing:
    @pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
    def test_matches_dense_oracle(self, rng, mesh_shape):
        n, r = 96, 64
        scene = random_scene(n, rng, emissive_frac=0.1)
        mesh = make_mesh(mesh_shape)
        s = mesh_shape[1]
        axis = (0.0, 0.0, 1.0)
        slabbed, axis_v = partition_slabs(scene, s, axis)
        slabbed_sh = shard_scene(slabbed, mesh)
        rays = _rays(rng, r)
        rays = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        # Oracle: dense with the SAME ordering key (slab-axis projection,
        # signed per ray direction) and K = N (no truncation anywhere).
        settings = RenderSettings(max_contribs=n, background=(0.1, 0.2, 0.3))
        fwd = np.asarray(jnp.sum(rays.directions * jnp.asarray(axis_v), -1))
        proj = jnp.asarray(np.asarray(slabbed.means) @ axis_v)
        got = np.asarray(render_spatial(slabbed, rays, settings, mesh, axis))
        # per-direction oracle (dense sort_depths is per-scene, not per-ray)
        want = np.zeros_like(got)
        for sign, mask in ((1.0, fwd >= 0), (-1.0, fwd < 0)):
            if not mask.any():
                continue
            sub = Rays(rays.origins[mask], rays.directions[mask])
            want[mask] = np.asarray(render_radiance_dense(
                slabbed, sub, settings, sort_depths=sign * proj))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_mixed_direction_rays(self, rng):
        """Rays pointing with AND against the slab axis in one batch."""
        n = 64
        scene = random_scene(n, rng, emissive_frac=0.1)
        mesh = make_mesh((1, 8))
        slabbed, axis_v = partition_slabs(scene, 8)
        settings = RenderSettings(max_contribs=n, background=(0.05,) * 3)
        o = np.concatenate([
            np.tile([[0.0, 0.0, 4.0]], (32, 1)),
            np.tile([[0.0, 0.0, -4.0]], (32, 1))]).astype(np.float32)
        d = np.concatenate([
            np.tile([[0.05, 0.0, -1.0]], (32, 1)),
            np.tile([[0.0, 0.05, 1.0]], (32, 1))]).astype(np.float32)
        d += rng.normal(0, 0.2, d.shape).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = Rays(jnp.asarray(o), jnp.asarray(d))
        rays_sh = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        got = np.asarray(render_spatial(slabbed, rays_sh, settings, mesh))
        proj = np.asarray(slabbed.means) @ np.asarray(axis_v)
        fwd = np.asarray(d @ np.asarray(axis_v)) >= 0
        want = np.zeros_like(got)
        for sign, mask in ((1.0, fwd), (-1.0, ~fwd)):
            sub = Rays(rays.origins[mask], rays.directions[mask])
            want[mask] = np.asarray(render_radiance_dense(
                slabbed, sub, settings,
                sort_depths=jnp.asarray(sign * proj)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_trace_spatial_matches_dense(self, rng):
        """Full interaction channels over the slab ring vs trace_dense with
        the same ordering key."""
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            trace_spatial,
        )
        from pathtracer_gaussiansplatting_tpu.render.reference import (
            trace_dense,
        )

        n, r = 64, 32
        scene = random_scene(n, rng, emissive_frac=0.1)
        scene = scene.replace(
            transmission=jnp.where(jnp.arange(n) % 3 == 0, 0.5, 0.0),
            clearcoat=jnp.where(jnp.arange(n) % 4 == 0, 0.7, 0.0))
        mesh = make_mesh((2, 4))
        slabbed, axis_v = partition_slabs(scene, 4)
        settings = RenderSettings(max_contribs=n)
        rays = _rays(rng, r)
        rays_sh = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        got = trace_spatial(slabbed, rays_sh, settings, mesh)
        proj = jnp.asarray(np.asarray(slabbed.means) @ axis_v)
        want = trace_dense(slabbed, rays, settings, sort_depths=proj)
        # all rays here point forward along the axis (toward -z... the axis
        # is +z and rays look -z: fix by comparing per-direction like above)
        fwd = np.asarray(jnp.sum(rays.directions
                                 * jnp.asarray(axis_v), -1)) >= 0
        want_rev = trace_dense(slabbed, rays, settings, sort_depths=-proj)
        for key in ("albedo", "radiance_emitted", "metallic", "roughness",
                    "clearcoat", "cc_roughness", "transmission",
                    "alpha_acc", "depth", "normal"):
            w = np.where((fwd[:, None] if np.asarray(want[key]).ndim == 2
                          else fwd),
                         np.asarray(want[key]), np.asarray(want_rev[key]))
            np.testing.assert_allclose(np.asarray(got[key]), w,
                                       rtol=3e-4, atol=3e-4, err_msg=key)

    def test_pathtrace_through_spatial_backend(self, rng):
        """Multi-bounce pathtrace with trace/visibility served by the slab
        ring — radiance finite and close to the dense-backend render."""
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            trace_spatial, visibility_spatial,
        )
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            pathtrace,
        )

        n, r = 64, 32
        scene = random_scene(n, rng, emissive_frac=0.15)
        mesh = make_mesh((2, 4))
        slabbed, axis_v = partition_slabs(scene, 4)
        settings = RenderSettings(max_depth=2, max_contribs=n,
                                  ambient=(0.05, 0.05, 0.08, 1.0))
        rays = _rays(rng, r)
        rays_sh = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        key = jax.random.PRNGKey(3)

        trace_fn = lambda s, rr, st: trace_spatial(slabbed, rr, st, mesh)
        vis_fn = lambda o, d, t: visibility_spatial(
            slabbed, o, d, t, settings, mesh)
        got = np.asarray(pathtrace(slabbed, rays_sh, settings, key,
                                   trace_fn=trace_fn, visibility_fn=vis_fn))
        assert np.isfinite(got).all()
        # dense-backend render of the same scene+rays+key for comparison —
        # orderings differ slightly (exact-t vs slab-projection), so compare
        # loosely in aggregate.
        want = np.asarray(pathtrace(slabbed, rays, settings, key))
        assert abs(got.mean() - want.mean()) < 0.15 * max(want.mean(), 0.05)

    def test_visibility_spatial_matches_dense(self, rng):
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            visibility_spatial,
        )
        from pathtracer_gaussiansplatting_tpu.render.reference import (
            visibility_dense,
        )

        n, r = 48, 32
        scene = random_scene(n, rng)
        mesh = make_mesh((2, 4))
        slabbed, _ = partition_slabs(scene, 4)
        settings = RenderSettings()
        rays = _rays(rng, r)
        t_end = jnp.full((r,), 6.0)
        sharding = spatial_sharding(mesh)
        got = visibility_spatial(
            slabbed, jax.device_put(rays.origins, sharding),
            jax.device_put(rays.directions, sharding),
            jax.device_put(t_end, sharding), settings, mesh)
        want = visibility_dense(slabbed, rays.origins, rays.directions,
                                t_end, settings)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_partition_preserves_content(self, rng):
        scene = random_scene(50, rng)
        slabbed, _ = partition_slabs(scene, 8)
        assert slabbed.num_gaussians % 8 == 0
        # every original mean present
        orig = set(map(tuple, np.round(np.asarray(scene.means), 5).tolist()))
        new = set(map(tuple, np.round(np.asarray(slabbed.means), 5).tolist()))
        assert orig <= new
        # padding is transparent
        extra = slabbed.num_gaussians - scene.num_gaussians
        if extra:
            pad_opac = np.asarray(slabbed.opacities[-extra:])
            assert (pad_opac < 1e-3).all()


class TestSpatialGrads:
    def test_render_spatial_grads_match_single_slab(self, rng):
        """BASELINE config #5 requires the full backward through the
        spatially-partitioned path (VERDICT r1 #6). Oracle: the SAME slab
        compositor with the whole scene resident in one slab (gauss axis
        1) — this isolates the ring mechanics (ppermute carries, segment
        folds, wrap ordering) in the backward. The mean-projection-vs-
        exact-t ordering approximation vs the dense renderer is covered by
        the forward oracle tests at its own tolerance; its GRADIENTS are
        legitimately different wherever top-K truncation or ordering
        differ, so dense is not a valid grad oracle here."""
        scene = random_scene(64, rng, spread=1.0)
        slabbed, axis = partition_slabs(scene, 4)
        rays_np = _rays(rng, 64)
        settings = RenderSettings(max_contribs=96,
                                  background=(0.1, 0.2, 0.3))

        mesh = make_mesh((2, 4))
        sharded = shard_scene(slabbed, mesh)
        rays = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays_np)

        mesh1 = make_mesh((8, 1))
        slab1, _ = partition_slabs(scene, 1)
        sharded1 = shard_scene(slab1, mesh1)
        rays1 = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh1)), rays_np)

        def loss_ring(means):
            out = render_spatial(sharded.replace(means=means), rays,
                                 settings, mesh)
            return jnp.mean(out ** 2)

        def loss_one(means):
            out = render_spatial(sharded1.replace(means=means), rays1,
                                 settings, mesh1)
            return jnp.mean(out ** 2)

        g_ring = np.asarray(jax.grad(loss_ring)(sharded.means))
        g_one = np.asarray(jax.grad(loss_one)(sharded1.means))
        # forward parity first (same contributor sets, same ordering key)
        np.testing.assert_allclose(
            np.asarray(render_spatial(sharded, rays, settings, mesh)),
            np.asarray(render_spatial(sharded1, rays1, settings, mesh1)),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g_ring, g_one, rtol=2e-3, atol=2e-5)

    def test_trace_spatial_grads_flow(self, rng):
        """Gradients also flow through the full-interaction trace path
        (opacity channel feeds alpha/depth)."""
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            trace_spatial,
        )

        mesh = make_mesh((2, 4))
        scene = random_scene(48, rng, spread=1.0)
        slabbed, _ = partition_slabs(scene, 4)
        sharded = shard_scene(slabbed, mesh)
        rays = _rays(rng, 32)
        rays = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        settings = RenderSettings(max_contribs=24)

        def loss(logits):
            inter = trace_spatial(sharded.replace(opacity_logits=logits),
                                  rays, settings, mesh)
            return jnp.mean(inter["albedo"] ** 2) + jnp.mean(
                inter["alpha_acc"])

        g = np.asarray(jax.grad(loss)(sharded.opacity_logits))
        assert np.isfinite(g).all() and np.abs(g).max() > 0


class TestSpatialScaleSmoke:
    @pytest.mark.slow
    def test_2m_gaussians_4k_tile_memory_layout(self, rng):
        """Config #5 dryrun-scale smoke: 2M Gaussians partitioned over the
        8-device mesh, a small ray tile of a 4K render, forward + backward.
        Proves the memory layout (resident slabs, per-shard top-K working
        set) holds at production parameter counts."""
        from pathtracer_gaussiansplatting_tpu.models.scene import (
            random_cloud,
        )

        mesh = make_mesh((1, 8))
        scene = random_cloud(2_000_000, seed=13, spread=2.0)
        slabbed, _ = partition_slabs(scene, 8)
        sharded = shard_scene(slabbed, mesh)
        rays = _rays(rng, 64)   # a 64-ray tile of the 3840x2160 grid
        rays = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        settings = RenderSettings(max_contribs=64)
        out = render_spatial(sharded, rays, settings, mesh)
        assert np.isfinite(np.asarray(out)).all()

        def loss(opacity_logits):
            o = render_spatial(sharded.replace(opacity_logits=opacity_logits),
                               rays, settings, mesh)
            return jnp.mean(o ** 2)

        g = jax.grad(loss)(sharded.opacity_logits)
        assert np.isfinite(np.asarray(jnp.sum(g)))


class TestGridSlabBackend:
    """r5 (VERDICT r4 #8): the per-slab interaction through the v3 grid
    marcher — the within-slab acceleration (per-object-BLAS analog,
    engine.cpp:534-655) the dense top-K ring lacked."""

    def test_grid_slabs_match_dense_slabs(self, rng):
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            build_slab_accels, partition_slabs, spatial_sharding,
            trace_spatial,
        )

        scene = random_scene(160, rng, spread=1.0)
        settings = RenderSettings(max_contribs=160)
        mesh = make_mesh((1, 8))
        slabbed, axis = partition_slabs(scene, 8)
        slabbed_sh = shard_scene(slabbed, mesh)
        tables, meta = build_slab_accels(slabbed, 8, max_per_cell=64,
                                         radius_percentile=100.0)
        tables = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P("gauss"))), tables)
        rays = _rays(rng, 64)
        rays = jax.tree.map(
            lambda x: jax.device_put(x, spatial_sharding(mesh)), rays)
        ref = trace_spatial(slabbed_sh, rays, settings, mesh, axis)
        got = trace_spatial(slabbed_sh, rays, settings, mesh, axis,
                            slab_accel=tables, accel_meta=meta,
                            max_steps=256)
        # transmittance is ordering-independent -> tight; feature sums
        # differ only by in-slab ordering (t_peak vs mean-projection)
        np.testing.assert_allclose(np.asarray(got["trans"]),
                                   np.asarray(ref["trans"]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(got["albedo"]),
                                   np.asarray(ref["albedo"]), atol=8e-2)
        np.testing.assert_allclose(np.asarray(got["depth"]),
                                   np.asarray(ref["depth"]), atol=0.3)

    def test_grid_slab_visibility(self, rng):
        from pathtracer_gaussiansplatting_tpu.parallel.spatial import (
            build_slab_accels, partition_slabs, spatial_sharding,
            visibility_spatial,
        )

        scene = random_scene(160, rng, spread=1.0)
        settings = RenderSettings(max_contribs=160)
        mesh = make_mesh((1, 8))
        slabbed, axis = partition_slabs(scene, 8)
        slabbed_sh = shard_scene(slabbed, mesh)
        tables, meta = build_slab_accels(slabbed, 8, max_per_cell=64,
                                         radius_percentile=100.0)
        tables = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(
                mesh, P("gauss"))), tables)
        rays = _rays(rng, 64)
        sharding = spatial_sharding(mesh)
        o = jax.device_put(rays.origins, sharding)
        d = jax.device_put(rays.directions, sharding)
        t_end = jax.device_put(np.full((64,), 3.0, np.float32), sharding)
        # The correct invariant is ring == single-device marcher (the
        # slab split must not change the march). Marcher-vs-dense
        # boundary-response semantics at a t_end inside the medium is a
        # separate, known approximation (dense gives every Gaussian its
        # clamped-boundary response; the marcher composites only cells
        # whose slab owns the peak) quantified in GRID_ACCURACY.json.
        from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
            build_grid_accel, visibility_grid,
        )

        accel1 = build_grid_accel(slabbed, max_per_cell=64,
                                  radius_percentile=100.0)
        ref = visibility_grid(slabbed, accel1, rays.origins,
                              rays.directions,
                              jnp.full((64,), 3.0), settings,
                              max_steps=256)
        got = visibility_spatial(slabbed_sh, o, d, t_end, settings, mesh,
                                 axis, slab_accel=tables, accel_meta=meta,
                                 max_steps=256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
