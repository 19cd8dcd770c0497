"""Spatial partitioning ring (parallel/spatial.py) vs the dense oracle.

Runs on the 8-virtual-device CPU mesh (conftest.py, SURVEY.md §4): Gaussians
live in resident depth slabs; per-ray carry state rotates around the gauss
ring. The dense renderer with slab-axis sort keys is the exact oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
