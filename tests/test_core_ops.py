"""Unit tests: quaternions, SH, ray-Gaussian response, compositing VJP."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
from pathtracer_gaussiansplatting_tpu.ops import composite as comp
from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
from pathtracer_gaussiansplatting_tpu.ops import quaternions as quat


class TestQuaternions:
    def test_identity(self):
        r = quat.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_orthonormal(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        r = quat.quat_to_rotmat(jnp.asarray(q))
        eye = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)

    def test_roundtrip(self, rng):
        q = rng.normal(size=(16, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q = np.where(q[:, :1] < 0, -q, q)  # canonical sign
        q2 = quat.rotmat_to_quat(quat.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_90deg_z(self):
        # 90 deg about z: x-axis -> y-axis
        q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], jnp.float32)
        r = quat.quat_to_rotmat(q)
        np.testing.assert_allclose(r @ jnp.array([1.0, 0, 0]),
                                   np.array([0, 1.0, 0]), atol=1e-6)


class TestSH:
    def test_dc_only(self):
        coeffs = jnp.zeros((5, 1, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.tile(jnp.array([[0.0, 0, 1]]), (5, 1))
        c = sh_mod.eval_sh(coeffs, dirs)
        np.testing.assert_allclose(c, sh_mod.SH_C0 * 1.0 + 0.5, atol=1e-6)

    def test_degrees_shape(self, rng):
        for deg in range(4):
            k = (deg + 1) ** 2
            coeffs = jnp.asarray(rng.normal(size=(7, k, 3)), jnp.float32)
            dirs = rng.normal(size=(7, 3))
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            c = sh_mod.eval_sh(coeffs, jnp.asarray(dirs, jnp.float32))
            assert c.shape == (7, 3)
            assert np.all(np.asarray(c) >= 0.0)

    def test_orthogonality_montecarlo(self, rng):
        # SH basis functions should be orthonormal under the sphere measure.
        n = 200_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh_mod.sh_basis(jnp.asarray(v, jnp.float32), 2))
        gram = basis.T @ basis / n * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


class TestRayGaussian:
    def test_peak_on_axis(self):
        # Isotropic unit Gaussian at origin; ray through it along +z.
        mean = jnp.zeros(3)
        m = jnp.eye(3)
        o = jnp.array([0.0, 0, -5.0])
        d = jnp.array([0.0, 0, 1.0])
        t, g = gops.peak_response(o, d, mean, m)
        assert np.isclose(float(t), 5.0, atol=1e-5)
        assert np.isclose(float(g), 1.0, atol=1e-6)

    def test_offset_ray(self):
        # Ray passing at distance 2 from an isotropic sigma=1 Gaussian:
        # peak response exp(-2^2/2).
        t, g = gops.peak_response(
            jnp.array([2.0, 0, -5.0]), jnp.array([0.0, 0, 1.0]),
            jnp.zeros(3), jnp.eye(3))
        assert np.isclose(float(g), np.exp(-2.0), atol=1e-5)

    def test_anisotropic_scaling(self):
        # Gaussian squashed in x (sigma_x = 0.1): same offset now 20 sigmas.
        log_s = jnp.log(jnp.array([0.1, 1.0, 1.0]))
        m = gops.canonical_transforms(log_s, jnp.array([1.0, 0, 0, 0]))
        t, g = gops.peak_response(
            jnp.array([2.0, 0, -5.0]), jnp.array([0.0, 0, 1.0]),
            jnp.zeros(3), m)
        assert float(g) < 1e-8

    def test_rotation_moves_peak(self, rng):
        # Rotating an anisotropic Gaussian changes the response of an
        # off-axis ray; verify against explicit covariance computation.
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        log_s = jnp.asarray(rng.uniform(-1, 0.5, 3), jnp.float32)
        mean = jnp.asarray(rng.normal(size=3), jnp.float32)
        m = gops.canonical_transforms(log_s, jnp.asarray(q))
        o = jnp.asarray(rng.normal(size=3) * 3, jnp.float32)
        d0 = rng.normal(size=3)
        d = jnp.asarray(d0 / np.linalg.norm(d0), jnp.float32)
        t, g = gops.peak_response(o, d, mean, m, t_min=-1e4)
        # Brute force: maximize response by dense sampling along the ray.
        r = quat.quat_to_rotmat(jnp.asarray(q))
        cov_inv = np.asarray(r) @ np.diag(np.exp(-2 * np.asarray(log_s))) @ np.asarray(r).T
        ts = np.linspace(-50, 50, 200001)
        x = np.asarray(o)[None] + ts[:, None] * np.asarray(d)[None]
        delta = x - np.asarray(mean)[None]
        qvals = np.einsum("ni,ij,nj->n", delta, cov_inv, delta)
        assert np.isclose(float(t), ts[qvals.argmin()], atol=1e-2)
        assert np.isclose(float(g), np.exp(-0.5 * qvals.min()), rtol=1e-3)

    def test_normal_isotropic_points_at_viewer(self):
        n = gops.gaussian_normal(
            jnp.array([0.0, 0, -1.0]), jnp.zeros(3), jnp.eye(3),
            view_dir=jnp.array([0.0, 0, 1.0]))
        np.testing.assert_allclose(n, [0, 0, -1.0], atol=1e-6)


class TestComposite:
    def test_weights_sum(self, rng):
        a = jnp.asarray(rng.uniform(0, 0.9, (4, 16)), jnp.float32)
        w, t = comp.composite_weights(a)
        np.testing.assert_allclose(np.asarray(w).sum(-1) + np.asarray(t),
                                   1.0, atol=1e-5)

    def test_single_opaque(self):
        a = jnp.array([[0.999, 0.5, 0.5]])
        w, t = comp.composite_weights(a)
        assert np.asarray(w)[0, 0] == pytest.approx(0.999)
        assert np.asarray(w)[0, 1] == pytest.approx(0.001 * 0.5, rel=1e-4)

    def test_vjp_matches_autodiff(self, rng):
        a = jnp.asarray(rng.uniform(0, 0.95, (3, 12)), jnp.float32)
        gw = jnp.asarray(rng.normal(size=(3, 12)), jnp.float32)
        gt = jnp.asarray(rng.normal(size=(3,)), jnp.float32)

        def loss_custom(a):
            w, t = comp.composite_weights(a)
            return jnp.sum(w * gw) + jnp.sum(t * gt)

        def loss_auto(a):
            om = 1.0 - a
            cp = jnp.cumprod(om, -1)
            trans_in = jnp.concatenate([jnp.ones_like(cp[..., :1]),
                                        cp[..., :-1]], -1)
            w = trans_in * a
            return jnp.sum(w * gw) + jnp.sum(cp[..., -1] * gt)

        g1 = jax.grad(loss_custom)(a)
        g2 = jax.grad(loss_auto)(a)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)

    def test_vjp_zero_alpha_stable(self):
        a = jnp.zeros((1, 8))
        g = jax.grad(lambda a: jnp.sum(comp.composite_weights(a)[0]))(a)
        assert np.all(np.isfinite(np.asarray(g)))
