"""Headless interactive session driver (engine.cpp run/drawFrame analog):
accumulation-reset-on-input, live torus resize, mode switches."""
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.render.session import InteractiveSession

from utils import random_scene


@pytest.fixture(scope="module")
def sess():
    scene = random_scene(200, np.random.default_rng(5), spread=1.0)
    return InteractiveSession(
        scene, RenderSettings(max_depth=2, ambient=(0.05, 0.05, 0.05, 1.0)),
        width=48, height=32, backend="dense")


class TestSession:
    def test_step_accumulates(self, sess):
        img1 = sess.step()
        assert img1.shape == (32, 48, 3)
        assert sess.frame == 1
        img2 = sess.step()
        assert sess.frame == 2
        assert np.isfinite(img2).all()

    def test_input_resets_accumulation(self, sess):
        sess.step()
        assert sess.frame >= 1
        sess.key("w")                      # camera moved
        assert sess.frame == 0             # engine.cpp:2070-2072
        sess.look(15.0, -5.0)
        assert sess.frame == 0

    def test_camera_mode_toggle(self, sess):
        assert sess.camera_mode == "free"
        sess.key("c")
        assert sess.camera_mode == "toroidal"
        c2w = np.asarray(sess.camera.c2w)
        sess.look(90.0, 0.0)               # toroidal alpha sweep
        assert not np.allclose(np.asarray(sess.camera.c2w), c2w)
        sess.key("c")
        assert sess.camera_mode == "free"

    def test_torus_live_resize(self, sess):
        r0 = sess.torus.major_radius
        sess.step()
        sess.key("z")                      # major radius +
        assert sess.torus.major_radius == r0 + 0.5
        assert sess.frame == 0             # resize resets accumulation
        sess.key("x")
        assert sess.torus.major_radius == r0

    def test_sampling_hotkeys(self, sess):
        sess.key("3")
        assert sess.sampling.value == "stratified"

    def test_pointcloud_mode(self, sess):
        sess.key("p")
        assert sess.render_mode == "pointcloud"
        img = sess.step()
        assert img.shape == (32, 48, 3)
        sess.key("p")
        assert sess.render_mode == "camera"
