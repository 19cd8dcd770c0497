"""utils (checkpoint/logging/profiling) + CLI smoke tests."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.utils import checkpoint as ckpt
from pathtracer_gaussiansplatting_tpu.utils.logging import MetricsLogger
from pathtracer_gaussiansplatting_tpu.utils.profiling import RaysPerSecondMeter

from utils import random_scene


class TestCheckpoint:
    def test_render_state_roundtrip(self, tmp_path, rng):
        acc = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        key = jax.random.PRNGKey(13)
        path = str(tmp_path / "state.npz")
        ckpt.save_render_state(path, acc, 37, key, extra=dict(pose=4))
        back = ckpt.load_render_state(path)
        np.testing.assert_array_equal(np.asarray(back["accumulation"]),
                                      np.asarray(acc))
        assert back["frames_done"] == 37
        np.testing.assert_array_equal(np.asarray(back["base_key"]),
                                      np.asarray(key))
        assert back["extra"]["pose"] == 4

    def test_resume_continues_accumulation(self, rng):
        # accumulate(…) from a restored (acc, n) equals uninterrupted stream.
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import accumulate

        xs = rng.normal(size=(10, 4)).astype(np.float32)
        full = jnp.zeros((4,))
        for i, x in enumerate(xs):
            full = accumulate(full, jnp.asarray(x), i)
        part = jnp.zeros((4,))
        for i in range(6):
            part = accumulate(part, jnp.asarray(xs[i]), i)
        resumed = part  # as if reloaded
        for i in range(6, 10):
            resumed = accumulate(resumed, jnp.asarray(xs[i]), i)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   atol=1e-6)

    def test_scene_roundtrip(self, tmp_path, rng):
        scene = random_scene(12, rng, sh_degree=1)
        path = str(tmp_path / "scene.npz")
        ckpt.save_scene(path, scene)
        back = ckpt.load_scene(path)
        np.testing.assert_array_equal(np.asarray(back.means),
                                      np.asarray(scene.means))
        np.testing.assert_array_equal(np.asarray(back.sh_coeffs),
                                      np.asarray(scene.sh_coeffs))

    def test_capture_progress(self, tmp_path):
        path = str(tmp_path / "p.json")
        j = ckpt.CaptureProgress(path)
        assert not j.is_done(3)
        j.mark(3)
        j.mark(7)
        j2 = ckpt.CaptureProgress(path)
        assert j2.is_done(3) and j2.is_done(7) and not j2.is_done(5)


class TestLoggingProfiling:
    def test_metrics_jsonl(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        m = MetricsLogger(path)
        m.log(0, rays_per_s=1e6, loss=0.5)
        m.log(1, rays_per_s=2e6)
        m.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["rays_per_s"] == 1e6 and lines[1]["step"] == 1

    def test_rays_meter(self):
        m = RaysPerSecondMeter()
        m.add(1000)
        assert m.rays_per_s > 0


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop axon sitecustomize
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "pathtracer_gaussiansplatting_tpu.cli"] + args,
        capture_output=True, text=True, cwd=cwd, env=env, timeout=600)


class TestCli:
    @pytest.fixture
    def scene_json(self, tmp_path):
        p = tmp_path / "scene.json"
        p.write_text(json.dumps({
            "settings": {
                "ambient_light": [0.1, 0.1, 0.15, 1.0],
                "torus_settings": {"major_radius": 16.0, "height": 8.0,
                                   "num_rays": 300},
                "accumulation_steps": 2, "total_positions": 2,
                "width": 16, "height": 16, "max_depth": 1,
            },
            "objects": [
                {"model": "builtin:debug_cube?size=8", "position": [0, 8, 0]},
            ],
        }))
        return str(p)

    def test_render_command(self, scene_json, tmp_path):
        out = str(tmp_path / "frame.png")
        r = _run_cli(["render", "--scene", scene_json, "--output", out,
                      "--spp", "2", "--width", "16", "--height", "16",
                      "--chunk", "256"], str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        from PIL import Image

        assert Image.open(out).size == (16, 16)

    def test_capture_command(self, scene_json, tmp_path):
        out = str(tmp_path / "ds")
        r = _run_cli(["capture-dataset", "--scene", scene_json, "--output",
                      out, "--spp", "2", "--chunk", "256"], str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(os.path.join(out, "transforms_train.json"))
        assert os.path.exists(os.path.join(out, "points3d.ply"))
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["train"] == 1 and stats["test"] == 1  # i%4==0 split of 2


class TestBackendSelection:
    """--backend / config backend exposure (VERDICT r3 #6): the production
    capture path (tiled primary + grid bounces) must be reachable from the
    CLI and selected automatically above the dense threshold."""

    def test_resolve_backend_auto(self):
        from pathtracer_gaussiansplatting_tpu.data.capture import (
            resolve_backend,
        )
        from pathtracer_gaussiansplatting_tpu.render.pipeline import (
            AUTO_DENSE_LIMIT,
        )

        assert resolve_backend("auto", AUTO_DENSE_LIMIT + 1) == "tiled+grid"
        assert resolve_backend("auto", 1000) == "dense"
        assert resolve_backend("grid", 10 ** 9) == "grid"
        assert resolve_backend("tiled+dense", 10) == "tiled+dense"

    def test_config_backend_key(self, tmp_path):
        import json as _json

        from pathtracer_gaussiansplatting_tpu.utils.config import (
            load_scene_config,
        )

        p = tmp_path / "s.json"
        p.write_text(_json.dumps(
            {"settings": {"backend": "tiled+grid"}, "objects": []}))
        assert load_scene_config(str(p)).backend == "tiled+grid"
        p.write_text(_json.dumps({"settings": {}, "objects": []}))
        assert load_scene_config(str(p)).backend == "auto"

    def test_capture_uses_tiled_path(self, tmp_path, monkeypatch):
        """capture_scene_data with backend='tiled+grid' drives the fused
        tile pose renderer (the path bench.py advertises)."""
        import numpy as np

        from pathtracer_gaussiansplatting_tpu.core.types import (
            RenderSettings,
        )
        from pathtracer_gaussiansplatting_tpu.core.torus import TorusConfig
        from pathtracer_gaussiansplatting_tpu.data import capture as cap
        from utils import random_scene

        calls = []
        real = cap.make_tiled_pose_renderer

        def spy(*a, **kw):
            calls.append(kw.get("bounce_backend"))
            return real(*a, **kw)

        monkeypatch.setattr(cap, "make_tiled_pose_renderer", spy)
        scene = random_scene(200, np.random.default_rng(0), spread=1.0)
        settings = RenderSettings(max_depth=1)
        out = cap.capture_scene_data(
            scene, str(tmp_path / "ds"), settings, torus=TorusConfig(),
            accumulation_steps=1, total_positions=1, width=16, height=16,
            capture_pointcloud=False, backend="tiled+grid",
            progress=None)
        assert calls == ["grid"]
        # pose 0 goes to the test split (i%4==0, engine.cpp:2763-2764)
        assert len(out["test_frames"]) == 1


class TestMidPoseCheckpoint:
    """Mid-pose accumulation checkpointing (VERDICT r3 #8 / SURVEY §5):
    a pose interrupted mid-accumulation resumes BIT-identically."""

    def test_interrupt_and_resume_bit_identical(self, tmp_path):
        import numpy as np

        from pathtracer_gaussiansplatting_tpu.core.camera import (
            toroidal_c2w,
        )
        from pathtracer_gaussiansplatting_tpu.core.types import (
            RenderSettings,
        )
        from pathtracer_gaussiansplatting_tpu.data.capture import (
            make_tiled_pose_renderer,
        )
        from utils import random_scene

        scene = random_scene(150, np.random.default_rng(3), spread=1.0)
        settings = RenderSettings(max_depth=1)
        render = make_tiled_pose_renderer(scene, settings, None, spp=6)
        c2w = toroidal_c2w(30.0, 10.0, 4.0, 0.5)
        ref_img = render(c2w, 16, 16, 45.0)

        state = str(tmp_path / "pose.npz")
        # "crash" after the first 2-sample segment
        out = render(c2w, 16, 16, 45.0, state_path=state,
                     checkpoint_every=2, stop_after_segments=1)
        assert out is None and os.path.exists(state)
        from pathtracer_gaussiansplatting_tpu.utils.checkpoint import (
            load_render_state,
        )

        assert load_render_state(state)["frames_done"] == 2
        # resume -> completes, state cleaned up, bitwise-equal image
        resumed = render(c2w, 16, 16, 45.0, state_path=state,
                         checkpoint_every=2)
        assert not os.path.exists(state)
        np.testing.assert_array_equal(resumed, ref_img)


class TestFrozenAliveReport:
    """frozen_alive rides pathtrace_camera into capture's per-pose stats
    (VERDICT r4 #6: marcher truncation must be reported, never silent)."""

    def test_pose_stats_include_marcher_truncation(self, tmp_path):
        import numpy as np

        from pathtracer_gaussiansplatting_tpu.core.camera import (
            toroidal_c2w,
        )
        from pathtracer_gaussiansplatting_tpu.core.types import (
            RenderSettings,
        )
        from pathtracer_gaussiansplatting_tpu.data.capture import (
            make_tiled_pose_renderer,
        )
        from utils import random_scene

        scene = random_scene(600, np.random.default_rng(5), spread=0.6)
        settings = RenderSettings(max_depth=2)
        # max_steps=1 clips the march schedule to ONE occupied-cell
        # composite: bounce/shadow rays in a dense cloud must freeze.
        render = make_tiled_pose_renderer(scene, settings, None, spp=1,
                                          bounce_backend="grid",
                                          max_steps=1)
        stats = {}
        img = render(toroidal_c2w(30.0, 10.0, 2.0, 0.3), 24, 24, 45.0,
                     stats_out=stats)
        assert img.shape == (24, 24, 3)
        assert stats.get("frozen_alive", 0.0) > 0

    def test_full_schedule_freezes_nothing(self, tmp_path):
        import numpy as np

        from pathtracer_gaussiansplatting_tpu.core.camera import (
            toroidal_c2w,
        )
        from pathtracer_gaussiansplatting_tpu.core.types import (
            RenderSettings,
        )
        from pathtracer_gaussiansplatting_tpu.data.capture import (
            make_tiled_pose_renderer,
        )
        from utils import random_scene

        scene = random_scene(200, np.random.default_rng(5), spread=1.0)
        settings = RenderSettings(max_depth=2)
        render = make_tiled_pose_renderer(scene, settings, None, spp=1,
                                          bounce_backend="grid")
        stats = {}
        render(toroidal_c2w(30.0, 10.0, 2.0, 0.3), 16, 16, 45.0,
               stats_out=stats)
        assert stats.get("frozen_alive", -1.0) == 0.0


class TestDispatchSegmentation:
    """Dispatch-bounded spp segmentation must not change numerics
    (DESIGN.md 'dispatch watchdog'): the accumulation is a pure fold
    over the absolute frame index, so any segment grouping is exact."""

    def test_flat_renderer_segmenting_is_exact(self):
        import numpy as np

        from pathtracer_gaussiansplatting_tpu.core.camera import (
            generate_rays, Camera, look_at,
        )
        from pathtracer_gaussiansplatting_tpu.core.types import (
            RenderSettings,
        )
        from pathtracer_gaussiansplatting_tpu.data.capture import (
            make_accumulating_renderer,
        )
        from utils import random_scene

        scene = random_scene(120, np.random.default_rng(2), spread=1.0)
        settings = RenderSettings(max_depth=2)
        cam = Camera(c2w=look_at((0, 0.3, 4.0), (0, 0, 0)),
                     fov_y_deg=45.0, width=8, height=8)
        rays = generate_rays(cam)
        # huge budget -> one segment; tiny budget -> per-sample dispatches
        one = make_accumulating_renderer(scene, settings, None, spp=12,
                                         max_dispatch_s=1e9)
        many = make_accumulating_renderer(scene, settings, None, spp=12,
                                          max_dispatch_s=1e-9)
        a = np.asarray(one(rays.origins, rays.directions))
        b = np.asarray(many(rays.origins, rays.directions))
        np.testing.assert_allclose(a, b, atol=2e-6)


class TestJournalFingerprint:
    """A capture journal written under a different configuration is
    discarded on resume (r5: a radius-changed resume silently produced a
    dataset mixing old images with new transforms)."""

    def test_mismatched_fingerprint_discards_journal(self, tmp_path):
        path = str(tmp_path / "p.json")
        j = ckpt.CaptureProgress(path, fingerprint="cfg-A")
        j.mark(0)
        j.mark(1)
        same = ckpt.CaptureProgress(path, fingerprint="cfg-A")
        assert same.is_done(1)
        other = ckpt.CaptureProgress(path, fingerprint="cfg-B")
        assert not other.is_done(0) and not other.is_done(1)
        # legacy journals without a fingerprint still resume
        legacy = ckpt.CaptureProgress(path, fingerprint=None)
        assert legacy.is_done(1)
