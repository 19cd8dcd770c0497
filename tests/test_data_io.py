"""Data layer: torus rays, PLY round-trips, transforms.json, images, config,
scene builders, and a miniature end-to-end capture."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, toroidal_c2w
from pathtracer_gaussiansplatting_tpu.core.torus import (
    TorusConfig, torus_point_normal, torus_rays,
)
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings, make_scene
from pathtracer_gaussiansplatting_tpu.data import images as img_mod
from pathtracer_gaussiansplatting_tpu.data.capture import capture_scene_data
from pathtracer_gaussiansplatting_tpu.data.ply import (
    load_3dgs_ply, load_point_cloud_ply, save_3dgs_ply, save_point_cloud_ply,
)
from pathtracer_gaussiansplatting_tpu.data.transforms import (
    load_transforms_json, save_transforms_json,
)
from pathtracer_gaussiansplatting_tpu.models.scene import (
    concat_scenes, debug_cube_scene, random_cloud, rtbox_scene, transform_scene,
)
from pathtracer_gaussiansplatting_tpu.utils.config import (
    load_rtbox_config, load_scene_config,
)


class TestTorus:
    def test_point_on_torus(self):
        cfg = TorusConfig(major_radius=16.0, minor_radius=1.0, height=8.0)
        uv = jnp.array([[0.0, 0.0], [0.25, 0.0], [0.0, 0.5]])
        pos, nrm = torus_point_normal(uv, cfg)
        p = np.asarray(pos)
        np.testing.assert_allclose(p[0], [17.0, 8.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(p[1], [0.0, 8.0, 17.0], atol=1e-4)
        np.testing.assert_allclose(p[2], [15.0, 8.0, 0.0], atol=1e-4)
        n = np.asarray(nrm)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(n[0], [1.0, 0.0, 0.0], atol=1e-5)

    def test_rays_point_outward(self, rng):
        cfg = TorusConfig()
        uv = jnp.asarray(rng.uniform(size=(256, 2)), jnp.float32)
        rays = torus_rays(uv, cfg)
        pos, nrm = torus_point_normal(uv, cfg)
        np.testing.assert_allclose(np.asarray(rays.origins),
                                   np.asarray(pos) + 0.05 * np.asarray(nrm),
                                   atol=1e-5)
        # Moving along the ray increases distance from the tube center ring.
        o = np.asarray(rays.origins)
        d = np.asarray(rays.directions)
        def tube_dist(p):
            ring = p - np.array([0, cfg.height, 0])
            radial = np.linalg.norm(ring[:, [0, 2]], axis=1)
            return np.sqrt((radial - cfg.major_radius) ** 2 + ring[:, 1] ** 2)
        assert (tube_dist(o + 0.1 * d) > tube_dist(o)).all()


class TestPly:
    def test_point_cloud_roundtrip(self, tmp_path, rng):
        n = 50
        pos = rng.normal(size=(n, 3)).astype(np.float32)
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        col = rng.uniform(size=(n, 3)).astype(np.float32)
        flags = (rng.uniform(size=n) > 0.3).astype(np.float32)
        path = str(tmp_path / "points3d.ply")
        kept = save_point_cloud_ply(path, pos, nrm, col, flags)
        assert kept == int((flags > 0).sum())
        back = load_point_cloud_ply(path)
        np.testing.assert_allclose(back["positions"], pos[flags > 0],
                                   rtol=1e-4, atol=1e-5)

    def test_ply_header_format(self, tmp_path):
        path = str(tmp_path / "p.ply")
        save_point_cloud_ply(path, np.zeros((1, 3)), np.zeros((1, 3)),
                             np.ones((1, 3)), np.ones(1))
        head = open(path).read().splitlines()[:13]
        # exact header layout of engine.cpp:2869-2881
        assert head[0] == "ply" and head[1] == "format ascii 1.0"
        assert head[2] == "element vertex 1"
        assert head[3:9] == [f"property float {p}" for p in
                             ("x", "y", "z", "nx", "ny", "nz")]
        assert head[9:12] == [f"property uchar {c}" for c in
                              ("red", "green", "blue")]
        assert head[12] == "end_header"

    def test_3dgs_roundtrip(self, tmp_path, rng):
        from utils import random_scene

        scene = random_scene(20, rng, sh_degree=2)
        path = str(tmp_path / "ckpt.ply")
        save_3dgs_ply(path, scene)
        back = load_3dgs_ply(path)
        np.testing.assert_allclose(back.means, scene.means, atol=1e-6)
        np.testing.assert_allclose(back.sh_coeffs, scene.sh_coeffs, atol=1e-6)
        np.testing.assert_allclose(back.log_scales, scene.log_scales, atol=1e-6)
        np.testing.assert_allclose(back.quats, scene.quats, atol=1e-6)
        np.testing.assert_allclose(back.opacity_logits, scene.opacity_logits,
                                   atol=1e-6)


class TestTransforms:
    def test_roundtrip_and_schema(self, tmp_path):
        c2w = np.asarray(toroidal_c2w(30.0, 10.0, 16.0, 8.0))
        path = str(tmp_path / "transforms_train.json")
        save_transforms_json(path, 1.0471,
                             [dict(file_path="./train/r_0",
                                   transform_matrix=c2w)])
        raw = json.load(open(path))
        assert set(raw.keys()) == {"camera_angle_x", "frames"}
        assert raw["frames"][0]["file_path"] == "./train/r_0"
        assert len(raw["frames"][0]["transform_matrix"]) == 4
        back = load_transforms_json(path)
        np.testing.assert_allclose(back["frames"][0]["transform_matrix"],
                                   c2w, atol=1e-6)

    def test_camera_angle_x(self):
        cam = Camera(c2w=jnp.eye(4), fov_y_deg=45.0, width=800, height=600)
        # fov_x = 2*atan(tan(fov_y/2)*aspect) (engine.cpp:2822-2824)
        expected = 2 * np.arctan(np.tan(np.radians(45.0) / 2) * 800 / 600)
        assert cam.fov_x_rad == pytest.approx(expected)


class TestImages:
    def test_srgb_roundtrip(self, rng):
        x = rng.uniform(size=(8, 8, 3))
        np.testing.assert_allclose(
            img_mod.srgb_to_linear(img_mod.linear_to_srgb(x)), x, atol=1e-6)

    def test_box_downscale(self):
        img = np.arange(16, dtype=np.float64).reshape(4, 4, 1)
        out = img_mod.box_downscale(img, 2)
        assert out.shape == (2, 2, 1)
        np.testing.assert_allclose(out[0, 0, 0], (0 + 1 + 4 + 5) / 4)

    def test_save_jpg(self, tmp_path, rng):
        path = str(tmp_path / "x.jpg")
        img_mod.save_jpg(path, rng.uniform(size=(16, 16, 3)))
        from PIL import Image

        assert Image.open(path).size == (16, 16)


class TestConfig:
    def test_scene_schema_defaults(self, tmp_path):
        p = tmp_path / "scene.json"
        p.write_text(json.dumps({
            "settings": {"torus_settings": {"major_radius": 12.0,
                                            "num_rays": 1000},
                         "sun": {"color": [1, 0.9, 0.8],
                                 "direction": [0, -1, 0.2]},
                         "ambient_light": [0.1, 0.1, 0.2, 1.0]},
            "objects": [{"model": "builtin:random_cloud?n=50",
                         "position": [1, 2, 3]}],
        }))
        cfg = load_scene_config(str(p))
        assert cfg.torus.major_radius == 12.0
        assert cfg.torus.minor_radius == 1.0  # default
        assert cfg.capture.accumulation_steps == 512  # engine.cpp:1247
        assert cfg.capture.total_positions == 336
        assert cfg.capture.min_beta == -45.0
        assert cfg.capture.image_divisor == 2
        assert cfg.sun.intensity == 1.0
        assert cfg.objects[0].position == (1.0, 2.0, 3.0)

    def test_main_scene_indirection(self, tmp_path):
        (tmp_path / "sub.json").write_text(json.dumps(
            {"settings": {"total_positions": 7}, "objects": []}))
        main = tmp_path / "main_scene.json"
        main.write_text(json.dumps({"scene": "sub.json"}))
        cfg = load_scene_config(str(main))
        assert cfg.capture.total_positions == 7

    def test_rtbox_schema(self, tmp_path):
        p = tmp_path / "rtbox.json"
        p.write_text(json.dumps({
            "position": [0, 0, 0], "dimensions": [4, 4, 4],
            "panels": {"floor": {"material": {"base_color": [0.5, 0.5, 0.5]},
                                 "light": {"intensity": 10.0}}},
        }))
        box = load_rtbox_config(str(p))
        assert box["panels"]["floor"]["light_intensity"] == 10.0
        assert box["panels"]["floor"]["roughness"] == 1.0


class TestSceneBuilders:
    def test_rtbox_scene(self):
        box = dict(position=(0, 0, 0), dimensions=(4, 4, 4), panels={
            "floor": dict(base_color=(0.8, 0.8, 0.8), metallic=0.0,
                          roughness=1.0, light_intensity=0.0),
            "ceiling": dict(base_color=(1, 1, 1), metallic=0.0,
                            roughness=1.0, light_intensity=100.0),
        })
        scene = rtbox_scene(box, res=8)
        assert scene.num_gaussians == 2 * 64
        em = np.asarray(scene.emission)
        assert (em[:64] == 0).all() and em[64:].max() > 0
        # floor surfels at y=-2, ceiling at y=+2
        m = np.asarray(scene.means)
        np.testing.assert_allclose(m[:64, 1], -2.0, atol=1e-5)
        np.testing.assert_allclose(m[64:, 1], 2.0, atol=1e-5)

    def test_debug_cube(self):
        scene = debug_cube_scene(size=2.0, res=4)
        assert scene.num_gaussians == 6 * 16
        assert np.asarray(scene.emission).max() > 0

    def test_transform_scene_translation_rotation(self, rng):
        scene = random_cloud(10, seed=1)
        out = transform_scene(scene, position=(1, 2, 3),
                              rotation_euler_deg=(0, 90, 0))
        m0 = np.asarray(scene.means)
        m1 = np.asarray(out.means)
        # y-rotation by 90deg: (x,y,z) -> (z,y,-x), then translate
        expected = np.stack([m0[:, 2], m0[:, 1], -m0[:, 0]], -1) + [1, 2, 3]
        np.testing.assert_allclose(m1, expected, atol=1e-5)

    def test_transform_scene_scale(self):
        scene = random_cloud(5, seed=2)
        out = transform_scene(scene, scale=(2.0, 2.0, 2.0))
        np.testing.assert_allclose(np.asarray(out.log_scales),
                                   np.asarray(scene.log_scales) + np.log(2.0),
                                   atol=1e-5)

    def test_concat_pads_sh(self):
        a = random_cloud(4, sh_degree=0)
        b = random_cloud(6, sh_degree=2)
        c = concat_scenes([a, b])
        assert c.sh_coeffs.shape == (10, 9, 3)


class TestCaptureEndToEnd:
    def test_miniature_capture(self, tmp_path):
        # Tiny but complete: 4 poses, 2 spp, 16x16, 500 torus rays. The cube
        # sits at the torus axis so inward-pointing sensor rays (v ~ pi) and
        # the toroidal cameras (which look at the axis) both see it.
        scene = debug_cube_scene(center=(0.0, 8.0, 0.0), size=8.0, res=4)
        settings = RenderSettings(max_depth=1, max_contribs=32,
                                  ambient=(0.1, 0.1, 0.1, 1.0))
        torus = TorusConfig(num_rays=500)
        out = capture_scene_data(
            scene, str(tmp_path), settings, torus=torus,
            accumulation_steps=2, total_positions=4, image_divisor=2,
            width=16, height=16, progress=None, chunk=512)
        # file layout parity (engine.cpp:2756, 2802-2807)
        assert os.path.exists(tmp_path / "train" / "r_0.jpg")
        assert os.path.exists(tmp_path / "train" / "r_3.jpg")
        assert os.path.exists(tmp_path / "transforms_train.json")
        assert os.path.exists(tmp_path / "transforms_test.json")
        assert os.path.exists(tmp_path / "points3d.ply")
        tr = load_transforms_json(str(tmp_path / "transforms_train.json"))
        te = load_transforms_json(str(tmp_path / "transforms_test.json"))
        assert len(tr["frames"]) == 3 and len(te["frames"]) == 1  # i%4==0
        from PIL import Image

        assert Image.open(tmp_path / "train" / "r_0.jpg").size == (8, 8)
        pc = load_point_cloud_ply(str(tmp_path / "points3d.ply"))
        assert out["num_points"] == len(pc["positions"]) > 0

    def test_importance_feedback_capture(self, tmp_path):
        """IMP_HIT capture runs the bootstrap->resample loop (the reference's
        GPU->CPU->GPU feedback, sampling.cpp:366-434) and concentrates rays
        where the bootstrap pass found hits."""
        scene = debug_cube_scene(center=(0.0, 8.0, 0.0), size=8.0, res=4)
        settings = RenderSettings(max_depth=1, max_contribs=32,
                                  ambient=(0.1, 0.1, 0.1, 1.0))
        torus = TorusConfig(num_rays=400)
        out = capture_scene_data(
            scene, str(tmp_path), settings, torus=torus,
            accumulation_steps=1, total_positions=0, capture_images=False,
            sampling_method="imp_hit", progress=None, chunk=512)
        uniform_dir = tmp_path / "uniform"
        out_u = capture_scene_data(
            scene, str(uniform_dir), settings, torus=torus,
            accumulation_steps=1, total_positions=0, capture_images=False,
            sampling_method="uniform", progress=None, chunk=512)
        # importance sampling should land at least as many hit points
        assert out["num_points"] >= out_u["num_points"] > 0
