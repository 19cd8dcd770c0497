"""Pallas tile-composite kernel vs pure-JAX oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.kernels import tile_composite as tc
from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
from pathtracer_gaussiansplatting_tpu.render.tiled import (
    render_tiled, render_tiled_pallas,
)

from utils import random_scene


@pytest.fixture
def cam():
    return Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
                  width=64, height=32)


CFG = BinningConfig(max_per_tile=128, tile_size=16)


class TestKernelMath:
    def test_composite_math_matches_reference(self, rng):
        # _composite_math (the kernel body) vs tile_composite_reference.
        from pathtracer_gaussiansplatting_tpu.ops import gaussians as gops
        from pathtracer_gaussiansplatting_tpu.render.tiled import (
            tile_composite_reference,
        )

        scene = random_scene(32, rng, spread=1.0)
        settings = RenderSettings()
        origin = jnp.array([0.0, 0.0, 4.0])
        d = rng.normal(size=(64, 3))
        d[:, 2] = -np.abs(d[:, 2]) - 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dirs = jnp.asarray(d, jnp.float32)

        m = gops.canonical_transforms(scene.log_scales, scene.quats)
        feats = jnp.concatenate(
            [jnp.asarray(rng.normal(size=(32, 5)), jnp.float32)], -1)
        mask = jnp.ones((32,), bool)
        ref_out, ref_acc, ref_depth = tile_composite_reference(
            origin, dirs, scene.means, m, scene.opacities, feats, mask,
            settings)

        idx = jnp.arange(32)[None, :]
        packets = tc.build_tile_packets(scene, feats, origin, idx,
                                        mask[None, :])
        out, acc, depth = tc._tile_composite_xla(packets, dirs[None],
                                                 settings)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref_out),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(acc[0]), np.asarray(ref_acc),
                                   rtol=1e-4, atol=1e-5)
        hit = np.asarray(ref_acc) > 1e-3
        np.testing.assert_allclose(np.asarray(depth[0])[hit],
                                   np.asarray(ref_depth)[hit], rtol=1e-3)


class TestPallasInterpret:
    def test_kernel_matches_xla(self, cam, rng):
        scene = random_scene(150, rng, spread=1.2)
        settings = RenderSettings(background=(0.1, 0.2, 0.3))
        out_k = render_tiled_pallas(scene, cam, settings, CFG,
                                    interpret=True)
        out_x = render_tiled(scene, cam, settings, CFG)
        np.testing.assert_allclose(np.asarray(out_k["color"]),
                                   np.asarray(out_x["color"]),
                                   rtol=1e-3, atol=3e-4)
        np.testing.assert_allclose(np.asarray(out_k["alpha_acc"]),
                                   np.asarray(out_x["alpha_acc"]),
                                   rtol=1e-3, atol=3e-4)

    def test_kernel_grads_flow(self, cam, rng):
        scene = random_scene(60, rng, spread=1.0)
        settings = RenderSettings()

        def loss(means):
            out = render_tiled_pallas(scene.replace(means=means), cam,
                                      settings, CFG, interpret=True)
            return jnp.mean(out["color"] ** 2)

        g = np.asarray(jax.grad(loss)(scene.means))
        assert np.isfinite(g).all() and np.abs(g).max() > 0

        # backward (recompute-XLA) must agree with full-XLA autodiff
        def loss_x(means):
            out = render_tiled(scene.replace(means=means), cam, settings, CFG)
            return jnp.mean(out["color"] ** 2)

        gx = np.asarray(jax.grad(loss_x)(scene.means))
        np.testing.assert_allclose(g, gx, rtol=5e-3, atol=1e-6)


class TestAnalyticBackward:
    def test_bwd_kernel_matches_autodiff(self, rng):
        """The analytic Pallas backward (suffix-sum VJP + envelope at t*)
        vs jax.vjp of the XLA reference, all three cotangents active."""
        t_tiles, p, k, f = 3, 16, 32, 5
        scene = random_scene(k * t_tiles, rng, spread=1.2)
        origin = jnp.array([0.0, 0.0, 4.0])
        feats = jnp.asarray(rng.normal(size=(k * t_tiles, f)), jnp.float32)
        idx = jnp.arange(k * t_tiles).reshape(t_tiles, k)
        mask = jnp.asarray(rng.uniform(size=(t_tiles, k)) > 0.2)
        packets = tc.build_tile_packets(scene, feats, origin, idx, mask)
        d = rng.normal(size=(t_tiles, p, 3))
        d[..., 2] = -np.abs(d[..., 2]) - 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        dirs = jnp.asarray(d, jnp.float32)
        settings = RenderSettings()

        cot = (jnp.asarray(rng.normal(size=(t_tiles, p, f)), jnp.float32),
               jnp.asarray(rng.normal(size=(t_tiles, p)), jnp.float32),
               jnp.asarray(rng.normal(size=(t_tiles, p)), jnp.float32) *
               jnp.asarray(  # depth cotangent only where alpha_acc > eps
                   tc._tile_composite_xla(packets, dirs, settings)[1] > 1e-3,
                   jnp.float32))

        out_ref, vjp = jax.vjp(
            lambda pk, dd: tc._tile_composite_xla(pk, dd, settings),
            packets, dirs)
        ref_pk, ref_dirs = vjp(cot)
        out_got, vjp_got = jax.vjp(
            lambda pk, dd: tc.tile_composite(pk, dd, settings, True),
            packets, dirs)
        got_pk, got_dirs = vjp_got(cot)
        # forward parity (full VJP path: pack -> kernel -> unpack)
        for o_got, o_ref in zip(out_got, out_ref):
            np.testing.assert_allclose(np.asarray(o_got), np.asarray(o_ref),
                                       rtol=2e-3, atol=2e-4)
        for key in ("geom", "featsT"):
            np.testing.assert_allclose(
                np.asarray(got_pk[key]), np.asarray(ref_pk[key]),
                rtol=2e-3, atol=2e-4, err_msg=key)
        np.testing.assert_allclose(np.asarray(got_dirs),
                                   np.asarray(ref_dirs),
                                   rtol=2e-3, atol=2e-4)
