"""Tiled renderer vs dense reference (BASELINE config #2 milestone)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, generate_rays, look_at
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.ops.binning import (
    BinningConfig, bin_gaussians, num_tiles, project_gaussians,
)
from pathtracer_gaussiansplatting_tpu.render import reference as ref
from pathtracer_gaussiansplatting_tpu.render.tiled import render_tiled

from utils import random_scene


@pytest.fixture
def cam():
    return Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
                  width=64, height=48)


class TestProjection:
    def test_center_gaussian_projects_to_center(self, cam, rng):
        scene = random_scene(1, rng, spread=0.0)
        proj = project_gaussians(scene, cam, BinningConfig())
        xy = np.asarray(proj["xy"])[0]
        # Scene mean is origin; camera looks at origin -> near image center.
        assert abs(xy[0] - 32) < 1.5 and abs(xy[1] - 24) < 1.5
        assert np.asarray(proj["valid"])[0]

    def test_behind_camera_culled(self, cam, rng):
        scene = random_scene(1, rng, spread=0.0)
        scene = scene.replace(means=jnp.array([[0.0, 0.5, 10.0]]))  # behind
        proj = project_gaussians(scene, cam, BinningConfig())
        assert not np.asarray(proj["valid"])[0]

    def test_radius_grows_with_scale(self, cam, rng):
        scene = random_scene(1, rng, spread=0.0)
        cfg = BinningConfig()
        r1 = float(project_gaussians(scene, cam, cfg)["radius"][0])
        s2 = scene.replace(log_scales=scene.log_scales + 1.0)
        r2 = float(project_gaussians(s2, cam, cfg)["radius"][0])
        assert r2 > 2.0 * r1

    def test_binning_covers_projection(self, cam, rng):
        scene = random_scene(50, rng, spread=1.0)
        cfg = BinningConfig(max_per_tile=64)
        tx, ty = num_tiles(cam, cfg)
        proj = project_gaussians(scene, cam, cfg)
        tile_idx, tile_mask, cnt, stats = bin_gaussians(proj, tx, ty, cfg)
        assert tile_idx.shape == (tx * ty, 64)
        # Every valid on-screen Gaussian must appear in the tile containing
        # its center.
        xy = np.asarray(proj["xy"]); valid = np.asarray(proj["valid"])
        ti = np.asarray(tile_idx); tm = np.asarray(tile_mask)
        for g in range(50):
            if not valid[g]:
                continue
            cx = min(max(int(xy[g, 0] // cfg.tile_size), 0), tx - 1)
            cy = min(max(int(xy[g, 1] // cfg.tile_size), 0), ty - 1)
            t = cy * tx + cx
            assert g in set(ti[t][tm[t]]), f"gaussian {g} missing from tile {t}"

    def test_tile_lists_depth_sorted(self, cam, rng):
        scene = random_scene(80, rng, spread=1.0)
        cfg = BinningConfig(max_per_tile=80)
        tx, ty = num_tiles(cam, cfg)
        proj = project_gaussians(scene, cam, cfg)
        tile_idx, tile_mask, _, _ = bin_gaussians(proj, tx, ty, cfg)
        depth = np.asarray(proj["depth"])
        ti = np.asarray(tile_idx); tm = np.asarray(tile_mask)
        for t in range(tx * ty):
            d = depth[ti[t][tm[t]]]
            assert (np.diff(d) >= -1e-6).all()


class TestTiledRender:
    def test_matches_dense(self, cam, rng):
        from pathtracer_gaussiansplatting_tpu.core.camera import view_matrix

        scene = random_scene(200, rng, spread=1.2)
        settings = RenderSettings(max_contribs=200, background=(0.1, 0.2, 0.3))
        cfg = BinningConfig(max_per_tile=200, tile_size=16)
        out = render_tiled(scene, cam, settings, cfg)
        img_t = np.asarray(out["color"]).reshape(-1, 3)

        # Exact comparison against a dense oracle using the SAME mean-depth
        # ordering (the 3DGS sorting approximation the tile path uses).
        w2c = np.asarray(view_matrix(cam))
        depth_mean = -(np.asarray(scene.means) @ w2c[:3, :3].T + w2c[:3, 3])[:, 2]
        img_md = np.asarray(ref.render_radiance_dense(
            scene, generate_rays(cam), settings,
            sort_depths=jnp.asarray(depth_mean)))
        np.testing.assert_allclose(img_t, img_md, atol=3e-4)

        # Exact per-ray ordering differs only by the known approximation:
        # bounded mean error on this heavily-overlapping scene.
        img_d = np.asarray(ref.render_radiance_dense(
            scene, generate_rays(cam), settings))
        diff = np.abs(img_t - img_d).max(-1)
        assert diff.mean() < 2e-2 and diff.max() < 0.5

    def test_truncation_graceful(self, cam, rng):
        # K smaller than overlapping gaussians: image stays finite & close.
        scene = random_scene(300, rng, spread=0.8)
        settings = RenderSettings(background=(0, 0, 0))
        out = render_tiled(scene, cam, settings,
                           BinningConfig(max_per_tile=32))
        a = np.asarray(out["color"])
        assert np.isfinite(a).all() and a.max() > 0

    def test_gradients_flow(self, cam, rng):
        scene = random_scene(50, rng, spread=1.0)
        settings = RenderSettings()
        cfg = BinningConfig(max_per_tile=64)

        def loss(means):
            out = render_tiled(scene.replace(means=means), cam, settings, cfg)
            return jnp.mean(out["color"] ** 2)

        g = jax.grad(loss)(scene.means)
        ga = np.asarray(g)
        assert np.isfinite(ga).all() and np.abs(ga).max() > 0

    def test_feats_channels(self, cam, rng):
        scene = random_scene(50, rng, spread=1.0, emissive_frac=0.2)
        out = render_tiled(scene, cam, RenderSettings(),
                           BinningConfig(max_per_tile=64))
        assert out["feats"].shape == (48, 64, 14)
        # emission channel nonzero somewhere
        assert float(np.abs(np.asarray(out["feats"][..., 3:6])).sum()) > 0
        n = np.asarray(out["feats"][..., 8:11])
        assert np.isfinite(n).all()


class TestTruncationStats:
    def test_dense_cluster_reports_truncation(self, rng):
        """A dense cluster overflowing per-tile K and the per-Gaussian tile
        cap must be COUNTED, not silent (VERDICT r1: no silent caps)."""
        from utils import random_scene

        scene = random_scene(600, rng, spread=0.01)  # all in one spot
        cam = Camera(c2w=look_at((0, 0, 2.0), (0, 0, 0)), fov_y_deg=50.0,
                     width=64, height=64)
        cfg = BinningConfig(max_per_tile=32, max_tiles_per_gaussian=4)
        tx_, ty_ = num_tiles(cam, cfg)
        proj = project_gaussians(scene, cam, cfg)
        _, _, counts, stats = bin_gaussians(proj, tx_, ty_, cfg)
        assert float(stats["tile_dropped"]) > 0          # K overflow counted
        assert int(stats["tile_overflow"]) >= 1
        assert float(stats["cap_dropped_tiles"]) > 0     # cap counted
        assert int(counts.max()) == cfg.max_per_tile
