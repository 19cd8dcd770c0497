"""Production pipeline: tiled primary + grid/dense bounces."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import (
    Camera, generate_rays, look_at, view_matrix,
)
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
    interaction_from_tiles, pathtrace, pathtrace_camera,
)
from pathtracer_gaussiansplatting_tpu.render.reference import trace_dense
from pathtracer_gaussiansplatting_tpu.render.tiled import render_tiled_pallas

from utils import random_scene

KEY = jax.random.PRNGKey(13)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    # mild emission: strong emitters amplify the mean-depth ordering
    # approximation, which is not what these comparisons measure
    scene = random_scene(200, rng, spread=1.0, emissive_frac=0.05)
    scene = scene.replace(emission=scene.emission * 0.2)
    cam = Camera(c2w=look_at((0, 0.3, 4.0), (0, 0, 0)), fov_y_deg=45.0,
                 width=32, height=16)
    settings = RenderSettings(max_contribs=64, max_depth=2,
                              ambient=(0.05, 0.05, 0.08, 1.0))
    return scene, cam, settings


class TestInteractionFromTiles:
    def test_matches_trace_dense(self, setup):
        from pathtracer_gaussiansplatting_tpu.core.camera import view_matrix

        scene, cam, settings = setup
        cfg = BinningConfig(max_per_tile=200)
        out = render_tiled_pallas(scene, cam, settings, cfg, interpret=True)
        rays = generate_rays(cam)
        inter_t = interaction_from_tiles(out, rays, settings)
        # oracle with the SAME mean-depth ordering the tile path uses
        w2c = np.asarray(view_matrix(cam))
        depth_mean = -(np.asarray(scene.means) @ w2c[:3, :3].T
                       + w2c[:3, 3])[:, 2]
        inter_d = trace_dense(scene, rays, settings,
                              sort_depths=jnp.asarray(depth_mean))
        np.testing.assert_allclose(np.asarray(inter_t["alpha_acc"]),
                                   np.asarray(inter_d["alpha_acc"]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(inter_t["radiance_emitted"]),
                                   np.asarray(inter_d["radiance_emitted"]),
                                   atol=5e-2)
        hit = np.asarray(inter_d["hit"])
        np.testing.assert_allclose(np.asarray(inter_t["depth"])[hit],
                                   np.asarray(inter_d["depth"])[hit],
                                   atol=0.1)

    def test_position_on_ray(self, setup):
        scene, cam, settings = setup
        cfg = BinningConfig(max_per_tile=200)
        out = render_tiled_pallas(scene, cam, settings, cfg, interpret=True)
        rays = generate_rays(cam)
        inter = interaction_from_tiles(out, rays, settings)
        d = np.asarray(inter["position"]) - np.asarray(rays.origins)
        d_norm = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True),
                                1e-9)
        dirs = np.asarray(rays.directions)
        hit = np.asarray(inter["hit"])
        assert (np.abs((d_norm * dirs).sum(-1)[hit] - 1.0) < 1e-4).all()


class TestPathtraceCamera:
    def test_close_to_dense_pathtrace(self, setup):
        scene, cam, settings = setup
        rays = generate_rays(cam)
        ref = np.asarray(pathtrace(scene, rays, settings, KEY))
        out = np.asarray(pathtrace_camera(
            scene, cam, settings, KEY,
            config=BinningConfig(max_per_tile=200)))
        assert np.isfinite(out).all()
        # same RNG + near-identical primary interaction => close radiance
        assert np.abs(out - ref).mean() < 3e-2

    def test_packets_reuse_across_samples(self, setup):
        from pathtracer_gaussiansplatting_tpu.render.tiled import prepare_tiles

        scene, cam, settings = setup
        cfg = BinningConfig(max_per_tile=200)
        pk = prepare_tiles(scene, cam, settings, cfg)
        a = np.asarray(pathtrace_camera(scene, cam, settings, KEY,
                                        packets=pk, config=cfg))
        b = np.asarray(pathtrace_camera(scene, cam, settings,
                                        jax.random.PRNGKey(99),
                                        packets=pk, config=cfg))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert np.abs(a - b).max() > 0  # different sample keys differ


class TestFreeCamera:
    """Free-fly mode parity (camera.cpp:31-96)."""

    def test_default_looks_down_neg_z(self):
        from pathtracer_gaussiansplatting_tpu.core.camera import FreeCamera

        fc = FreeCamera()
        np.testing.assert_allclose(fc.forward, [0.0, 0.0, -1.0], atol=1e-6)
        cam = fc.camera(8, 8)
        np.testing.assert_allclose(np.asarray(-cam.c2w[:3, 2]),
                                   [0.0, 0.0, -1.0], atol=1e-6)

    def test_pitch_clamp_and_rotate(self):
        from pathtracer_gaussiansplatting_tpu.core.camera import FreeCamera

        fc = FreeCamera()
        fc.rotate(0.0, 10_000.0)  # huge cursor delta
        assert fc.pitch_deg == 89.0
        fc.rotate(900.0, 0.0)  # yaw 90 deg at default sensitivity 0.1
        np.testing.assert_allclose(fc.yaw_deg % 360.0, 0.0, atol=1e-6)

    def test_move_in_local_frame(self):
        from pathtracer_gaussiansplatting_tpu.core.camera import FreeCamera

        fc = FreeCamera()
        fc.move(dt=1.0, forward=1.0)  # toward -Z at speed 2.5
        np.testing.assert_allclose(fc.position, [0.0, 0.0, 0.5], atol=1e-6)
        fc.move(dt=1.0, strafe=1.0)  # right = forward x up = +X
        np.testing.assert_allclose(fc.position, [2.5, 0.0, 0.5], atol=1e-6)

    def test_reset_and_modifiers(self):
        from pathtracer_gaussiansplatting_tpu.core.camera import FreeCamera

        fc = FreeCamera()
        fc.adjust_fov(30.0)
        fc.adjust_speed(4.0)
        fc.rotate(50.0, -20.0)
        fc.move(1.0, forward=-1.0, ascend=1.0)
        assert fc.fov_y_deg == 75.0 and fc.speed == 10.0
        fc.reset()
        assert fc.fov_y_deg == 45.0 and fc.pitch_deg == 0.0
        np.testing.assert_allclose(fc.position, [0.0, 0.0, 3.0])

    def test_rays_flow_through_renderer(self):
        from pathtracer_gaussiansplatting_tpu.core.camera import FreeCamera

        fc = FreeCamera()
        rays = generate_rays(fc.camera(4, 4))
        assert rays.origins.shape == (16, 3)
        assert np.isfinite(np.asarray(rays.directions)).all()


class TestChunkedCamera:
    """pathtrace_camera_chunked: the bounded-dispatch variant for samples
    longer than the worker's per-dispatch limit (DESIGN.md 'dispatch
    watchdog'). Chunking must only re-seed per chunk, not change the
    estimator."""

    def test_shape_finite_and_aux(self, setup):
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            pathtrace_camera_chunked,
        )

        scene, cam, settings = setup
        img, aux = pathtrace_camera_chunked(
            scene, cam, settings, KEY, 2, config=BinningConfig(),
            return_aux=True)
        img = np.asarray(img)
        assert img.shape == (cam.width * cam.height, 3)
        assert np.isfinite(img).all()
        assert int(aux["frozen_alive"]) == 0  # dense backend: exact

    def test_single_chunk_matches_unchunked(self, setup):
        """With n_chunks=1 the fold_in(key, 0) seed differs from the
        unchunked key only by the chunk fold — compare against the same
        fold so the paths must agree exactly."""
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            pathtrace_camera_chunked,
        )

        scene, cam, settings = setup
        a = np.asarray(pathtrace_camera_chunked(
            scene, cam, settings, KEY, 1, config=BinningConfig()))
        b = np.asarray(pathtrace_camera(
            scene, cam, settings, jax.random.fold_in(KEY, 0),
            config=BinningConfig()))
        np.testing.assert_allclose(a, b, atol=2e-5)
