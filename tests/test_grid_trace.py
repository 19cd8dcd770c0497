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


class TestCompactionPath:
    """The production-scale march path (sorted compaction rounds +
    sub-batched while loops) against the single-batch path, with the
    engagement thresholds shrunk so it runs at CPU test sizes
    (VERDICT r3 weak #3: the >=32768-ray code was TPU-bench-only)."""

    def test_compacted_trace_matches_single_batch(self, setup):
        scene, accel, _, settings = setup
        rng = np.random.default_rng(5)
        r = 2048
        o = jnp.asarray(rng.normal(0, 0.8, (r, 3)), jnp.float32)
        d = rng.normal(size=(r, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        rays = Rays(o, d)
        full_cov = ((1.0, 8, 24), (1.0, 16, 64), (1.0, 40, 160))
        base = trace_grid(scene, rays, settings, accel, max_steps=64,
                          schedule=full_cov)
        compact = trace_grid(scene, rays, settings, accel, max_steps=64,
                             compact_min=256, sub_rays=512,
                             schedule=full_cov)
        for k in ("alpha_acc", "albedo", "depth", "trans"):
            np.testing.assert_allclose(np.asarray(compact[k]),
                                       np.asarray(base[k]), atol=1e-5,
                                       rtol=1e-5)

    def test_compacted_trace_with_active_mask(self, setup):
        scene, accel, _, settings = setup
        rng = np.random.default_rng(7)
        r = 1024
        o = jnp.asarray(rng.normal(0, 0.8, (r, 3)), jnp.float32)
        d = rng.normal(size=(r, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        active = jnp.asarray(rng.uniform(size=r) < 0.5)
        rays = Rays(o, d)
        full_cov = ((1.0, 8, 24), (1.0, 16, 64), (1.0, 40, 160))
        base = trace_grid(scene, rays, settings, accel, max_steps=64,
                          active=active, schedule=full_cov)
        compact = trace_grid(scene, rays, settings, accel, max_steps=64,
                             active=active, compact_min=128, sub_rays=256,
                             schedule=full_cov)
        np.testing.assert_allclose(np.asarray(compact["alpha_acc"]),
                                   np.asarray(base["alpha_acc"]),
                                   atol=1e-5)
        # masked-off rays composite nothing
        assert float(jnp.max(jnp.where(active, 0.0,
                                       compact["alpha_acc"]))) == 0.0

    def test_compacted_visibility_matches_single_batch(self, setup):
        scene, accel, _, settings = setup
        rng = np.random.default_rng(9)
        r = 1024
        o = jnp.asarray(rng.normal(0, 0.8, (r, 3)), jnp.float32)
        d = rng.normal(size=(r, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.float32)
        t_end = jnp.full((r,), 5.0)
        full_cov = ((1.0, 8, 24), (1.0, 16, 64), (1.0, 40, 160))
        base = visibility_grid(scene, accel, o, d, t_end, settings,
                               max_steps=64, schedule=full_cov)
        compact = visibility_grid(scene, accel, o, d, t_end, settings,
                                  max_steps=64, compact_min=128,
                                  sub_rays=256, schedule=full_cov)
        np.testing.assert_allclose(np.asarray(compact), np.asarray(base),
                                   atol=1e-5)

    def test_frozen_rays_are_counted_not_silent(self, setup):
        """Rays still alive when the schedule ends are counted in
        frozen_alive (ADVICE r3 medium: no silent mid-march freezing)."""
        scene, accel, _, settings = setup
        rng = np.random.default_rng(11)
        r = 512
        # rays through the cloud center cross many occupied cells
        o = jnp.asarray(rng.normal(0, 0.1, (r, 3)) + [0, 0, 3.0],
                        jnp.float32)
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (r, 3))
        rays = Rays(o, d)
        # a 1-composite budget must freeze translucent rays mid-march
        tiny = trace_grid(scene, rays, settings, accel, max_steps=1)
        full = trace_grid(scene, rays, settings, accel, max_steps=128)
        assert int(tiny["frozen_alive"]) > 0
        assert int(full["frozen_alive"]) == 0
        # frozen rays return PARTIAL accumulation (less than full)
        assert float(jnp.sum(tiny["alpha_acc"])) < \
            float(jnp.sum(full["alpha_acc"]))
