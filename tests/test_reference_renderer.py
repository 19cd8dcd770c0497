"""Dense reference renderer: images, gradients vs finite differences.

Covers BASELINE config #1: 100 isotropic Gaussians, 64x64 ortho, CPU —
image + grad checks (SURVEY.md §7 step 1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import (
    Camera, generate_rays, look_at, orthographic_rays,
)
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings, make_scene
from pathtracer_gaussiansplatting_tpu.render import reference as ref

from utils import fd_grad, random_scene


def baseline_config1_scene(rng):
    """100 isotropic Gaussians in a ball (BASELINE.json config #1)."""
    n = 100
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    log_scales = np.full((n, 3), np.log(0.08), np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opacity_logits = rng.uniform(0.0, 2.0, (n,)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return make_scene(means=means, log_scales=log_scales, quats=quats,
                      opacity_logits=opacity_logits, colors=colors)


@pytest.fixture
def ortho_rays():
    return orthographic_rays(center=(0, 0, -3), direction=(0, 0, 1),
                             up=(0, 1, 0), extent=1.2, width=64, height=64)


class TestDenseRender:
    def test_image_shape_and_range(self, rng, ortho_rays):
        scene = baseline_config1_scene(rng)
        settings = RenderSettings(max_contribs=64)
        img = ref.render_radiance_dense(scene, ortho_rays, settings)
        assert img.shape == (64 * 64, 3)
        a = np.asarray(img)
        assert np.all(np.isfinite(a)) and a.min() >= 0.0

    def test_background_where_empty(self, rng):
        scene = baseline_config1_scene(rng)
        rays = orthographic_rays(center=(0, 50, -3), direction=(0, 0, 1),
                                 up=(0, 1, 0), extent=1.0, width=4, height=4)
        settings = RenderSettings(background=(0.25, 0.5, 0.75))
        img = np.asarray(ref.render_radiance_dense(scene, rays, settings))
        np.testing.assert_allclose(img, np.tile([0.25, 0.5, 0.75], (16, 1)),
                                   atol=1e-6)

    def test_depth_ordering_matters(self, ortho_rays, rng):
        # A red Gaussian in front of a green one: pixel should be mostly red.
        scene = make_scene(
            means=[[0, 0, -1.0], [0, 0, 1.0]],
            log_scales=np.log(0.3) * np.ones((2, 3)),
            quats=[[1, 0, 0, 0]] * 2,
            opacity_logits=[4.0, 4.0],
            colors=[[1, 0, 0], [0, 1, 0]],
        )
        rays = orthographic_rays(center=(0, 0, -3), direction=(0, 0, 1),
                                 up=(0, 1, 0), extent=0.01, width=1, height=1)
        img = np.asarray(ref.render_radiance_dense(scene, rays, RenderSettings()))
        assert img[0, 0] > 3 * img[0, 1]

    def test_perspective_camera_sees_scene(self, rng):
        scene = baseline_config1_scene(rng)
        cam = Camera(c2w=look_at((0, 0, -4), (0, 0, 0)), fov_y_deg=45.0,
                     width=32, height=32)
        img = np.asarray(ref.render_radiance_dense(
            scene, generate_rays(cam), RenderSettings()))
        assert img.sum() > 1.0  # something visible

    def test_trace_dense_surface(self, rng, ortho_rays):
        scene = baseline_config1_scene(rng)
        out = ref.trace_dense(scene, ortho_rays, RenderSettings())
        r = ortho_rays.num_rays
        assert out["normal"].shape == (r, 3)
        assert out["position"].shape == (r, 3)
        d = np.asarray(out["depth"])
        hit = np.asarray(out["hit"])
        assert hit.any()
        # Hits must lie in front of the ray plane (z = -3), i.e. depth > 0.
        assert (d[hit] > 0).all()
        # Composited normals face the viewer (rays go +z, normals ~ -z).
        n = np.asarray(out["normal"])[hit]
        assert (n[:, 2] < 0.2).mean() > 0.9

    def test_grad_means_vs_fd(self, rng):
        scene = random_scene(8, rng, spread=0.5)
        rays = orthographic_rays(center=(0, 0, -3), direction=(0, 0, 1),
                                 up=(0, 1, 0), extent=1.0, width=8, height=8)
        # Soft settings: the sigma/alpha cutoffs are step discontinuities that
        # break finite differences, so grad tests disable them.
        settings = RenderSettings(max_contribs=8, alpha_min=1e-6, sigma_cut=30.0)
        target = jnp.zeros((64, 3))

        def loss_of(scene):
            img = ref.render_radiance_dense(scene, rays, settings)
            return jnp.mean((img - target) ** 2)

        loss_jit = jax.jit(lambda m: loss_of(scene.replace(means=m)))
        g = jax.grad(loss_jit)(scene.means)
        f = lambda m: float(loss_jit(jnp.asarray(m, jnp.float32)))
        g_fd = fd_grad(f, np.asarray(scene.means), eps=3e-3)
        np.testing.assert_allclose(np.asarray(g), g_fd, rtol=0.05, atol=5e-4)

    @pytest.mark.parametrize("field", ["log_scales", "opacity_logits",
                                       "quats", "sh_coeffs"])
    def test_grad_other_fields_vs_fd(self, rng, field):
        scene = random_scene(6, rng, spread=0.5)
        rays = orthographic_rays(center=(0, 0, -3), direction=(0, 0, 1),
                                 up=(0, 1, 0), extent=1.0, width=6, height=6)
        settings = RenderSettings(max_contribs=6, alpha_min=1e-6, sigma_cut=30.0)

        def loss_of(scene):
            img = ref.render_radiance_dense(scene, rays, settings)
            return jnp.mean(img**2)

        x0 = getattr(scene, field)
        loss_jit = jax.jit(lambda x: loss_of(scene.replace(**{field: x})))
        g = jax.grad(loss_jit)(x0)
        f = lambda x: float(loss_jit(jnp.asarray(x, jnp.float32)))
        # eps small enough not to cross depth-sort-order discontinuities.
        g_fd = fd_grad(f, np.asarray(x0), eps=1e-3)
        np.testing.assert_allclose(np.asarray(g), g_fd, rtol=0.07, atol=1e-3)

    def test_visibility_dense(self, rng):
        # A dense opaque wall between point and light -> visibility ~ 0;
        # to the side -> ~ 1.
        scene = make_scene(
            means=[[0, 0, 0.0]],
            log_scales=np.log(np.array([[2.0, 2.0, 0.05]], np.float32)),
            quats=[[1, 0, 0, 0]],
            opacity_logits=[8.0],
            colors=[[1, 1, 1]],
        )
        origins = jnp.array([[0, 0, -2.0], [10, 0, -2.0]])
        dirs = jnp.array([[0, 0, 1.0], [0, 0, 1.0]])
        t_end = jnp.array([4.0, 4.0])
        vis = np.asarray(ref.visibility_dense(
            scene, origins, dirs, t_end, RenderSettings()))
        assert vis[0] < 0.01 and vis[1] > 0.99

    def test_jit_and_determinism(self, rng, ortho_rays):
        scene = baseline_config1_scene(rng)
        # K = N so jit/eager cannot differ via top-k tie-breaking.
        settings = RenderSettings(max_contribs=100)
        f = jax.jit(lambda s, r: ref.render_radiance_dense(s, r, settings))
        i1 = f(scene, ortho_rays)
        i2 = f(scene, ortho_rays)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        i3 = ref.render_radiance_dense(scene, ortho_rays, settings)
        # jit fuses/reassociates float32 math; allow fusion-level noise.
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i3), atol=3e-4)
