"""Point-cloud rasterizer (render/points.py) vs the reference pass semantics
(shaders/pointcloud/pointcloud.vert:50-89: modes 0/1, miss discard, depth
test, 2px points)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
from pathtracer_gaussiansplatting_tpu.core.torus import TorusConfig
from pathtracer_gaussiansplatting_tpu.render.points import (
    render_point_cloud, rasterize_points,
)


@pytest.fixture
def cam():
    return Camera(c2w=look_at((0.0, 0.0, 5.0), (0.0, 0.0, 0.0)),
                  fov_y_deg=45.0, width=64, height=64)


class TestRasterize:
    def test_single_point_lands_center(self, cam):
        img = rasterize_points(jnp.array([[0.0, 0.0, 0.0]]),
                               jnp.array([[1.0, 0.0, 0.0]]),
                               jnp.array([True]), cam)
        img = np.asarray(img)
        assert img[32, 32, 0] == pytest.approx(1.0)
        assert img.sum() == pytest.approx(2 * 2 * 1.0)  # 2px splat, red only

    def test_depth_test_nearest_wins(self, cam):
        pts = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]])  # second nearer
        cols = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        img = np.asarray(rasterize_points(pts, cols,
                                          jnp.array([True, True]), cam))
        assert img[32, 32, 1] == pytest.approx(1.0)  # green (nearer) wins
        assert img[32, 32, 0] == pytest.approx(0.0)

    def test_invalid_points_discarded(self, cam):
        img = np.asarray(rasterize_points(
            jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[1.0, 1.0, 1.0]]),
            jnp.array([False]), cam))
        assert img.sum() == 0.0

    def test_behind_camera_discarded(self, cam):
        img = np.asarray(rasterize_points(
            jnp.array([[0.0, 0.0, 10.0]]), jnp.array([[1.0, 1.0, 1.0]]),
            jnp.array([True]), cam))
        assert img.sum() == 0.0


class TestModes:
    def test_torus_mode_reprojects(self):
        torus = TorusConfig(major_radius=4.0, minor_radius=0.5, height=0.0,
                            num_rays=64)
        cam = Camera(c2w=look_at((0.0, 12.0, 0.1), (0.0, 0.0, 0.0)),
                     fov_y_deg=60.0, width=64, height=64)
        rng = np.random.default_rng(13)
        uv = rng.uniform(0, 1, (64, 2)).astype(np.float32)
        pos = rng.normal(0, 1, (64, 3)).astype(np.float32)  # ignored in torus mode
        col = np.ones((64, 3), np.float32)
        flags = np.ones((64,), np.float32)
        img_t = np.asarray(render_point_cloud(pos, col, flags, cam,
                                              mode="torus", uv=uv,
                                              torus=torus))
        img_w = np.asarray(render_point_cloud(pos, col, flags, cam,
                                              mode="world"))
        assert img_t.sum() > 0
        assert not np.allclose(img_t, img_w)

    def test_bad_mode_raises(self, cam):
        with pytest.raises(ValueError):
            render_point_cloud(np.zeros((1, 3)), np.ones((1, 3)),
                               np.ones((1,)), cam, mode="nope")
        with pytest.raises(ValueError):
            render_point_cloud(np.zeros((1, 3)), np.ones((1, 3)),
                               np.ones((1,)), cam, mode="torus")
