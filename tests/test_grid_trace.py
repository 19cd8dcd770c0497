"""Uniform-grid tracer vs dense oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, generate_rays, look_at
from pathtracer_gaussiansplatting_tpu.core.types import Rays, RenderSettings
from pathtracer_gaussiansplatting_tpu.render import reference as ref
from pathtracer_gaussiansplatting_tpu.render.grid_trace import (
    build_grid_accel, trace_grid, visibility_grid,
)

from utils import random_scene


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    scene = random_scene(300, rng, spread=1.0)
    accel = build_grid_accel(scene, dims=(16, 16, 16), max_per_cell=128)
    cam = Camera(c2w=look_at((0, 0.3, 4.0), (0, 0, 0)), fov_y_deg=45.0,
                 width=24, height=16)
    rays = generate_rays(cam)
    settings = RenderSettings(max_contribs=64)
    return scene, accel, rays, settings


class TestGridTrace:
    def test_matches_dense_interaction(self, setup):
        scene, accel, rays, settings = setup
        out_g = trace_grid(scene, rays, settings, accel, max_steps=64)
        out_d = ref.trace_dense(scene, rays, settings)
        np.testing.assert_allclose(np.asarray(out_g["alpha_acc"]),
                                   np.asarray(out_d["alpha_acc"]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(out_g["albedo"]),
                                   np.asarray(out_d["albedo"]), atol=2e-2)
        hit = np.asarray(out_d["hit"])
        np.testing.assert_allclose(np.asarray(out_g["depth"])[hit],
                                   np.asarray(out_d["depth"])[hit], atol=2e-2)

    def test_autofit_build_and_stats(self, setup):
        scene, _, rays, settings = setup
        accel = build_grid_accel(scene)  # auto-fitted dims + radius cap
        stats = accel.stats_dict
        assert set(stats) >= {"clamped_frac", "dropped_frac",
                              "overflow_cell_frac", "dims", "max_per_cell"}
        assert stats["clamped_frac"] <= 0.02  # p99 cap by construction
        out = trace_grid(scene, rays, settings, accel)
        assert np.isfinite(np.asarray(out["albedo"])).all()

    def test_visibility_matches_dense(self, setup):
        scene, accel, rays, settings = setup
        r = rays.num_rays
        t_end = jnp.full((r,), 6.0)
        v_g = visibility_grid(scene, accel, rays.origins, rays.directions,
                              t_end, settings, max_steps=64)
        v_d = ref.visibility_dense(scene, rays.origins, rays.directions,
                                   t_end, settings)
        np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_d),
                                   atol=2e-2)

    def test_rays_missing_grid(self, setup):
        scene, accel, _, settings = setup
        rays = Rays(origins=jnp.array([[50.0, 50.0, 50.0]]),
                    directions=jnp.array([[0.0, 1.0, 0.0]]))
        out = trace_grid(scene, rays, settings, accel, max_steps=16)
        assert float(out["alpha_acc"][0]) == 0.0

    def test_pathtrace_with_grid_backend(self, setup):
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import pathtrace

        scene, accel, rays, settings = setup
        settings = RenderSettings(max_contribs=64, max_depth=2,
                                  ambient=(0.05, 0.05, 0.05, 1.0))
        trace_fn = lambda s, r, st: trace_grid(s, r, st, accel, max_steps=64)
        vis_fn = lambda o, d, t: visibility_grid(scene, accel, o, d, t,
                                                 settings, max_steps=64)
        out_g = pathtrace(scene, rays, settings, jax.random.PRNGKey(13),
                          trace_fn=trace_fn, visibility_fn=vis_fn)
        out_d = pathtrace(scene, rays, settings, jax.random.PRNGKey(13))
        a, b = np.asarray(out_g), np.asarray(out_d)
        assert np.isfinite(a).all()
        # same RNG stream + near-identical interactions -> close radiance
        assert np.abs(a - b).mean() < 2e-2
