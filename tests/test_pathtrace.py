"""Path tracer physics tests: sky, emission, NEE vs analytic, shadows, MIS."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.types import (
    RenderSettings, Rays, make_punctual_lights, make_scene,
)
from pathtracer_gaussiansplatting_tpu.render import lights as lights_mod
from pathtracer_gaussiansplatting_tpu.render.pathtrace import accumulate, pathtrace

KEY = jax.random.PRNGKey(13)


def wall_scene(albedo=(0.8, 0.8, 0.8), emissive=None, extra=None):
    """A flat, dense white wall at z=0 spanning x,y (normal +z-ish)."""
    means = [[0.0, 0.0, 0.0]]
    log_scales = [np.log([3.0, 3.0, 0.01])]
    quats = [[1.0, 0, 0, 0]]
    opac = [9.0]
    colors = [list(albedo)]
    emission = [[0, 0, 0]]
    if emissive is not None:
        means.append(emissive["mean"])
        log_scales.append(np.log(emissive.get("scales", [0.3, 0.3, 0.01])))
        quats.append(emissive.get("quat", [1.0, 0, 0, 0]))
        opac.append(9.0)
        colors.append([0, 0, 0])
        emission.append(emissive["emission"])
    if extra is not None:
        for g in extra:
            means.append(g["mean"])
            log_scales.append(np.log(g["scales"]))
            quats.append(g.get("quat", [1.0, 0, 0, 0]))
            opac.append(g.get("opacity_logit", 9.0))
            colors.append(g.get("color", [0.5, 0.5, 0.5]))
            emission.append(g.get("emission", [0, 0, 0]))
    return make_scene(means=np.array(means, np.float32),
                      log_scales=np.array(log_scales, np.float32),
                      quats=np.array(quats, np.float32),
                      opacity_logits=np.array(opac, np.float32),
                      colors=np.array(colors, np.float32),
                      emission=np.array(emission, np.float32),
                      roughness=np.full(len(means), 1.0, np.float32))


def down_rays(n=4, z=2.0, span=0.2):
    xs = np.linspace(-span, span, n, dtype=np.float32)
    o = np.stack([xs, np.zeros(n, np.float32), np.full(n, z, np.float32)], -1)
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    return Rays(origins=jnp.asarray(o), directions=jnp.asarray(d))


class TestLightTables:
    def test_cdf_normalized(self, rng):
        scene = wall_scene(emissive=dict(mean=[0, 0, 1.0], emission=[5, 5, 5]))
        t = lights_mod.build_light_tables(scene)
        cdf = np.asarray(t.emissive_cdf)
        assert cdf[-1] == pytest.approx(1.0, abs=1e-5)
        assert (np.diff(cdf) >= 0).all()
        assert float(t.p_emissive) == 1.0  # no punctual lights

    def test_p_emissive_clamp(self):
        scene = wall_scene(emissive=dict(mean=[0, 0, 1.0],
                                         emission=[1e-3] * 3))
        pl = make_punctual_lights(position=[[0, 0, 2]], intensity=[1000.0],
                                  light_type=[0])
        t = lights_mod.build_light_tables(scene, pl)
        assert 0.1 <= float(t.p_emissive) <= 0.9

    def test_punctual_flux_rule(self):
        scene = wall_scene()
        pl = make_punctual_lights(position=[[0, 0, 2], [0, 0, 3]],
                                  intensity=[1.0, 1.0], light_type=[1, 0])
        t = lights_mod.build_light_tables(scene, pl)
        # directional flux 400, point flux 4pi (engine.cpp:1798-1804)
        probs = np.asarray(t.punctual_prob)
        assert probs[0] == pytest.approx(400.0 / (400.0 + 4 * np.pi), rel=1e-5)


class TestPathtrace:
    def test_sky_only(self):
        scene = wall_scene()
        scene = scene.replace(opacity_logits=jnp.full((1,), -20.0))  # empty
        settings = RenderSettings(max_depth=2, ambient=(0.2, 0.3, 0.4, 1.0))
        out = pathtrace(scene, down_rays(), settings, KEY)
        np.testing.assert_allclose(np.asarray(out),
                                   np.tile([0.4, 0.6, 0.8], (4, 1)), atol=5e-3)

    def test_direct_emission(self):
        # Camera stares at an emissive wall: radiance ~ emission.
        scene = wall_scene(emissive=dict(mean=[0, 0, 0.5],
                                         scales=[3.0, 3.0, 0.01],
                                         emission=[2.0, 1.0, 0.5]))
        settings = RenderSettings(max_depth=1, nee=False)
        out = np.asarray(pathtrace(scene, down_rays(), settings, KEY))
        np.testing.assert_allclose(out, np.tile([2.0, 1.0, 0.5], (4, 1)),
                                   rtol=0.05)

    def test_nee_point_light_analytic(self):
        # Lambertian wall (albedo rho), point light at height h above:
        # L = rho/pi * I / h^2 for the pixel directly under the light.
        rho = 0.8
        h = 2.0
        intensity = 10.0
        scene = wall_scene(albedo=(rho, rho, rho))
        pl = make_punctual_lights(position=[[0, 0, h]], intensity=[intensity],
                                  light_type=[0], color=[[1, 1, 1]])
        settings = RenderSettings(max_depth=1, ambient=(0, 0, 0, 1.0))
        tables = lights_mod.build_light_tables(scene, pl)
        out = np.asarray(pathtrace(scene, down_rays(n=1, span=0.0), settings,
                                   KEY, tables=tables, punctual=pl))
        expected = rho / np.pi * intensity / h**2
        np.testing.assert_allclose(out[0], expected, rtol=0.1)

    def test_shadowing(self):
        # Occluder disk between light and wall darkens the lit point. The
        # light sits off the camera axis so the camera still sees the wall.
        pl = make_punctual_lights(position=[[2.0, 0, 2.0]], intensity=[10.0],
                                  light_type=[0])
        lit = wall_scene()
        blocked = wall_scene(extra=[dict(mean=[1.0, 0, 1.0],
                                         scales=[0.6, 0.6, 0.01])])
        settings = RenderSettings(max_depth=1, ambient=(0, 0, 0, 1.0))
        r = down_rays(n=1, span=0.0)
        out_lit = np.asarray(pathtrace(
            lit, r, settings, KEY,
            tables=lights_mod.build_light_tables(lit, pl), punctual=pl))
        out_blk = np.asarray(pathtrace(
            blocked, r, settings, KEY,
            tables=lights_mod.build_light_tables(blocked, pl), punctual=pl))
        # occluder alpha is capped at 0.999 -> a ~5% residual passes through
        assert out_blk[0, 0] < 0.1 * out_lit[0, 0]

    def test_mis_consistency_nee_vs_bsdf(self):
        # One emissive patch + diffuse wall: NEE estimator and BSDF-only
        # estimator must converge to the same mean (MIS unbiasedness).
        scene = wall_scene(emissive=dict(mean=[0.8, 0.0, 1.2],
                                         scales=[0.4, 0.4, 0.01],
                                         emission=[8.0, 8.0, 8.0]))
        r = down_rays(n=1, span=0.0)
        n_samples = 600

        def avg(settings):
            def one(i):
                return pathtrace(scene, r, settings,
                                 jax.random.fold_in(KEY, i))
            vals = jax.lax.map(one, jnp.arange(n_samples))
            return np.asarray(vals).mean(0)

        with_nee = avg(RenderSettings(max_depth=2, nee=True))
        no_nee = avg(RenderSettings(max_depth=2, nee=False))
        # Direct emission seen by the camera is zero here (emitter is off to
        # the side behind the ray), so everything is 1-bounce light.
        assert with_nee[0, 0] > 0.005
        np.testing.assert_allclose(with_nee[0], no_nee[0], rtol=0.35)

    def test_firefly_clamp(self):
        scene = wall_scene(emissive=dict(mean=[0, 0, 0.5],
                                         scales=[3.0, 3.0, 0.01],
                                         emission=[100.0, 100.0, 100.0]))
        settings = RenderSettings(max_depth=1, nee=False, firefly_clamp=5.0)
        out = np.asarray(pathtrace(scene, down_rays(), settings, KEY))
        assert out.max() <= 5.0 + 1e-5

    def test_grads_through_pathtrace(self):
        scene = wall_scene(emissive=dict(mean=[0.5, 0, 1.0],
                                         emission=[5, 5, 5]))
        settings = RenderSettings(max_depth=2)
        r = down_rays()

        def loss(means):
            out = pathtrace(scene.replace(means=means), r, settings, KEY)
            return jnp.mean(out)

        g = np.asarray(jax.grad(loss)(scene.means))
        assert np.isfinite(g).all() and np.abs(g).sum() > 0


class TestAccumulate:
    def test_streaming_mean(self, rng):
        xs = rng.normal(size=(10, 4, 3)).astype(np.float32)
        acc = jnp.zeros((4, 3))
        for i, x in enumerate(xs):
            acc = accumulate(acc, jnp.asarray(x), i)
        np.testing.assert_allclose(np.asarray(acc), xs.mean(0), atol=1e-5)
