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


class TestImportanceFeedback:
    """Session IMP hotkeys re-sample from the LIVE hit buffer
    (sampling.cpp:366-434 via engine.cpp:766-802) instead of silently
    degrading to RANDOM (VERDICT r3 #10)."""

    def test_imp_hit_uses_previous_pass(self):
        from pathtracer_gaussiansplatting_tpu.sampling.strategies import (
            SamplingMethod, generate_samples,
        )

        scene = random_scene(200, np.random.default_rng(5), spread=1.0)
        s = InteractiveSession(
            scene, RenderSettings(max_depth=1), width=16, height=16,
            backend="dense")
        s.key("p")                             # pointcloud mode
        s.key("7")                             # IMP_HIT
        assert s.sampling == SamplingMethod.IMP_HIT
        s.step()                               # pass 1: no data -> random
        assert s._prev_uv is not None and s._prev_flags is not None
        uv1 = s._prev_uv.copy()
        flags1 = s._prev_flags.copy()
        s.step()                               # pass 2: feedback resample
        # the second pass's samples are exactly the importance resample
        # of the first pass's hit buffer (deterministic seed)
        n = len(uv1)
        expect = generate_samples(SamplingMethod.IMP_HIT, n,
                                  prev_uv=uv1, prev_flags=flags1)
        np.testing.assert_allclose(s._prev_uv, expect, atol=1e-6)
        # and they differ from the bootstrap (feedback actually engaged)
        assert np.abs(s._prev_uv - uv1).max() > 1e-3
