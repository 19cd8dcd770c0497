"""Material-model parity tests: clearcoat, transmission/glass, spec-gloss.

Mirrors the reference's extended PBR surface (closesthit.rchit:396-620):
  * glass path: Fresnel-weighted reflect/refract at IOR 1.01 (:503-531)
  * clearcoat lobe with stochastic selection (:540-577)
  * spec-gloss workflow (:396-410, loader-side SG->MR conversion)
  * metal diffuse attenuation albedo*(1-metallic) (:423)
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import (
    Camera, generate_rays, look_at,
)
from pathtracer_gaussiansplatting_tpu.core.types import (
    RenderSettings, make_scene,
)
from pathtracer_gaussiansplatting_tpu.ops import bsdf
from pathtracer_gaussiansplatting_tpu.render.pathtrace import pathtrace
from tests.utils import random_scene


@pytest.fixture
def rng():
    return np.random.default_rng(13)


def _wall_scene(transmission=0.0, clearcoat=0.0, wall_color=(0.6, 0.6, 0.6)):
    """An emissive panel at z=-4 behind a (possibly glass) panel at z=0."""
    from pathtracer_gaussiansplatting_tpu.models.scene import concat_scenes

    def panel(z, color, emission, transmission=0.0, clearcoat=0.0, res=8):
        xs = (np.arange(res) + 0.5) / res * 4 - 2
        xx, yy = np.meshgrid(xs, xs)
        m = res * res
        means = np.stack([xx.ravel(), yy.ravel(), np.full(m, z)], -1)
        return make_scene(
            means=means.astype(np.float32),
            log_scales=np.tile(np.log([0.3, 0.3, 0.01]), (m, 1)),
            quats=np.tile([1.0, 0, 0, 0], (m, 1)),
            opacity_logits=np.full(m, 9.0, np.float32),
            colors=np.tile(color, (m, 1)),
            emission=np.tile(emission, (m, 1)),
            roughness=np.full(m, 0.8, np.float32),
            transmission=np.full(m, transmission, np.float32),
            clearcoat=np.full(m, clearcoat, np.float32),
        )

    front = panel(0.0, wall_color, (0.0, 0.0, 0.0),
                  transmission=transmission, clearcoat=clearcoat)
    emitter = panel(-4.0, (1.0, 1.0, 1.0), (6.0, 6.0, 6.0))
    return concat_scenes([front, emitter])


class TestGlass:
    def test_refract_straight_through_at_eta_1(self):
        d = jnp.array([[0.0, 0.0, -1.0]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        out, tir = bsdf.refract(d, n, 1.0)
        assert not bool(tir[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(d), atol=1e-6)

    def test_refract_tir(self):
        # Grazing exit from dense medium: eta > 1 with large incidence angle.
        d = jnp.array([[np.sin(1.4), 0.0, -np.cos(1.4)]], jnp.float32)
        n = jnp.array([[0.0, 0.0, 1.0]])
        out, tir = bsdf.refract(d, n, 1.5)
        assert bool(tir[0])
        np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)

    def test_sample_glass_reflect_vs_refract(self):
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
        v = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))  # head-on
        albedo = jnp.full((2, 3), 0.9)
        metallic = jnp.zeros((2,))
        # u = 0 -> reflect (prob_reflect ~ 0.04 at normal incidence > 0).
        out = bsdf.sample_glass(jnp.array([0.0, 0.99]), n, v, albedo,
                                metallic, 1.01)
        refl, refr = np.asarray(out["direction"])
        np.testing.assert_allclose(refl, [0, 0, 1], atol=1e-5)     # mirror
        np.testing.assert_allclose(refr, [0, 0, -1], atol=1e-2)    # through
        w = np.asarray(out["weight"])
        np.testing.assert_allclose(w[0], 1.0, atol=1e-6)           # reflect
        np.testing.assert_allclose(w[1], 0.9, atol=1e-6)           # tinted

    def test_glass_panel_passes_light(self):
        """An emitter behind a glass wall is visible; behind an opaque one
        it is not (the capability the reference's hit_flag=2 path enables)."""
        settings = RenderSettings(max_depth=4, max_contribs=48,
                                  ambient=(0.0, 0.0, 0.0, 1.0), nee=True)
        cam = Camera(c2w=look_at((0.0, 0.0, 3.0), (0.0, 0.0, -4.0)),
                     fov_y_deg=30.0, width=8, height=8)
        rays = generate_rays(cam)
        key = jax.random.PRNGKey(3)

        def mean_radiance(transmission):
            scene = _wall_scene(transmission=transmission)
            acc = jnp.zeros((rays.num_rays, 3))
            for f in range(8):
                acc += pathtrace(scene, rays, settings,
                                 jax.random.fold_in(key, f))
            return float(jnp.mean(acc / 8.0))

        glassy = mean_radiance(0.95)
        opaque = mean_radiance(0.0)
        assert glassy > opaque * 1.5, (glassy, opaque)

    def test_adaptive_depth_kills_opaque_paths(self):
        """opaque_depth caps non-glass paths; glass paths keep bouncing
        (raygen_camera.rgen:59-64)."""
        cam = Camera(c2w=look_at((0.0, 0.0, 3.0), (0.0, 0.0, -4.0)),
                     fov_y_deg=30.0, width=8, height=8)
        rays = generate_rays(cam)
        scene = _wall_scene(transmission=0.0)
        key = jax.random.PRNGKey(5)
        deep = RenderSettings(max_depth=6, max_contribs=48,
                              ambient=(0.3, 0.3, 0.3, 1.0))
        capped = RenderSettings(max_depth=6, opaque_depth=1, max_contribs=48,
                                ambient=(0.3, 0.3, 0.3, 1.0))
        r_deep = pathtrace(scene, rays, deep, key)
        r_capped = pathtrace(scene, rays, capped, key)
        # The capped render must differ (bounces suppressed) and be dimmer
        # on average (less accumulated light).
        assert float(jnp.mean(r_capped)) < float(jnp.mean(r_deep)) + 1e-6


class TestClearcoat:
    def test_zero_clearcoat_matches_base(self, rng):
        n_rays = 64
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n_rays, 1))
        v_raw = rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
        v_raw[:, 2] = np.abs(v_raw[:, 2]) + 0.2
        v = jnp.asarray(v_raw / np.linalg.norm(v_raw, axis=-1,
                                               keepdims=True))
        albedo = jnp.asarray(rng.uniform(0, 1, (n_rays, 3)), jnp.float32)
        metallic = jnp.asarray(rng.uniform(0, 1, (n_rays,)), jnp.float32)
        rough = jnp.asarray(rng.uniform(0.1, 1, (n_rays,)), jnp.float32)
        u_lobe = jnp.asarray(rng.uniform(0, 1, (n_rays,)), jnp.float32)
        u_dir = jnp.asarray(rng.uniform(0, 1, (n_rays, 2)), jnp.float32)
        u_cc = jnp.asarray(rng.uniform(0, 1, (n_rays,)), jnp.float32)
        base = bsdf.sample_bsdf(u_lobe, u_dir, n, v, albedo, metallic, rough)
        coated = bsdf.sample_clearcoated(
            u_cc, u_lobe, u_dir, n, v, albedo, metallic, rough,
            jnp.zeros((n_rays,)), jnp.full((n_rays,), 0.03))
        np.testing.assert_allclose(np.asarray(coated["direction"]),
                                   np.asarray(base["direction"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(coated["weight"]),
                                   np.asarray(base["weight"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(coated["pdf"]),
                                   np.asarray(base["pdf"]), rtol=1e-5)

    def test_clearcoat_energy_bounded(self, rng):
        """MC estimate of directional albedo with a full clearcoat stays <= 1
        (white furnace upper bound; the coat redistributes, never adds)."""
        m = 4096
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (m, 1))
        v = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]])
                     / np.linalg.norm([0.3, 0, 0.954]), (m, 1))
        albedo = jnp.full((m, 3), 1.0)
        metallic = jnp.zeros((m,))
        rough = jnp.full((m,), 0.5)
        u = jax.random.uniform(jax.random.PRNGKey(0), (m, 4))
        out = bsdf.sample_clearcoated(
            u[:, 0], u[:, 1], u[:, 2:4], n, v, albedo, metallic, rough,
            jnp.ones((m,)), jnp.full((m,), 0.1))
        # E[weight] estimates the directional albedo (weights already carry
        # 1/pdf and 1/p_select).
        est = float(jnp.mean(jnp.max(out["weight"], -1)))
        assert est <= 1.15, est  # small MC slack

    def test_clearcoat_changes_render(self):
        cam = Camera(c2w=look_at((0.0, 0.0, 3.0), (0.0, 0.0, -4.0)),
                     fov_y_deg=30.0, width=8, height=8)
        rays = generate_rays(cam)
        settings = RenderSettings(max_depth=3, max_contribs=48,
                                  ambient=(0.2, 0.2, 0.25, 1.0))
        key = jax.random.PRNGKey(7)
        plain = pathtrace(_wall_scene(clearcoat=0.0), rays, settings, key)
        coated = pathtrace(_wall_scene(clearcoat=1.0), rays, settings, key)
        assert not np.allclose(np.asarray(plain), np.asarray(coated))


class TestMetalDiffuse:
    def test_full_metal_has_no_diffuse(self):
        n = jnp.array([[0.0, 0.0, 1.0]])
        v = jnp.array([[0.0, 0.0, 1.0]])
        l = jnp.asarray([[0.6, 0.0, 0.8]])
        albedo = jnp.array([[0.2, 0.9, 0.3]])
        f = bsdf.eval_bsdf(n, v, l, albedo, jnp.ones((1,)),
                           jnp.full((1,), 1.0))
        # roughness 1 metal: pure specular — the diffuse lobe must vanish,
        # so the result is << albedo/pi * NdotL which a Lambert term adds.
        lambert = np.asarray(albedo)[0] / np.pi * 0.8
        spec_only = np.asarray(f)[0]
        # The green channel (albedo 0.9) would get ~0.23 from Lambert alone.
        assert spec_only[1] < lambert[1], (spec_only, lambert)


class TestDetachedSamplingGrads:
    def test_material_grads_finite_and_nonzero(self, rng):
        scene = random_scene(256, rng, emissive_frac=0.05)
        n = scene.num_gaussians
        # Clearcoat everywhere: the cc lobe is selected with prob ~4-10% per
        # scatter, so sparse coats make this test flaky at few rays.
        scene = scene.replace(
            transmission=jnp.where(jnp.arange(n) % 3 == 0, 0.6, 0.0),
            clearcoat=jnp.full((n,), 0.9))
        cam = Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
                     width=16, height=16)
        rays = generate_rays(cam)
        st = RenderSettings(max_depth=3, max_contribs=16,
                            ambient=(0.05, 0.05, 0.08, 1.0))
        g = jax.grad(lambda s: jnp.sum(
            pathtrace(s, rays, st, jax.random.PRNGKey(1))))(scene)
        for leaf in jax.tree.leaves(g):
            assert bool(jnp.all(jnp.isfinite(leaf)))
        assert float(jnp.abs(g.transmission).max()) > 0
        assert float(jnp.abs(g.clearcoat).max()) > 0
        assert float(jnp.abs(g.clearcoat_roughness).max()) > 0


class TestSpecGlossLoader:
    def _sg_gltf(self, tmp_path):
        from tests.test_gltf import quad_gltf

        path = quad_gltf(tmp_path, with_light=False)
        doc = json.loads(open(path).read())
        doc["materials"] = [{
            "extensions": {"KHR_materials_pbrSpecularGlossiness": {
                "diffuseFactor": [0.5, 0.2, 0.1, 1.0],
                "specularFactor": [0.04, 0.04, 0.04],
                "glossinessFactor": 0.75,
            }},
        }]
        doc["extensionsUsed"] = ["KHR_materials_pbrSpecularGlossiness"]
        open(path, "w").write(json.dumps(doc))
        return path

    def test_sg_converts_to_metal_rough(self, tmp_path):
        from pathtracer_gaussiansplatting_tpu.data.gltf import parse_gltf

        prim = parse_gltf(self._sg_gltf(tmp_path))["primitives"][0]
        # Dielectric specular 0.04 -> metallic 0 (closesthit.rchit SG path
        # always shades metallic=0; our conversion agrees for dielectrics).
        assert prim["metallic"] == pytest.approx(0.0, abs=1e-6)
        # roughness = sqrt(1 - glossiness) (closesthit.rchit:408).
        assert prim["roughness"] == pytest.approx(np.sqrt(0.25), rel=1e-5)
        np.testing.assert_allclose(prim["base_color"][:3], [0.5, 0.2, 0.1],
                                   rtol=1e-5)

    def test_clearcoat_transmission_parsed(self, tmp_path):
        from tests.test_gltf import quad_gltf
        from pathtracer_gaussiansplatting_tpu.data.gltf import (
            load_gltf_scene, parse_gltf,
        )

        path = quad_gltf(tmp_path, with_light=False)
        doc = json.loads(open(path).read())
        doc["materials"][0]["extensions"] = {
            "KHR_materials_clearcoat": {"clearcoatFactor": 0.7,
                                        "clearcoatRoughnessFactor": 0.2},
            "KHR_materials_transmission": {"transmissionFactor": 0.9},
        }
        open(path, "w").write(json.dumps(doc))
        prim = parse_gltf(path)["primitives"][0]
        assert prim["clearcoat"] == pytest.approx(0.7)
        assert prim["clearcoat_roughness"] == pytest.approx(0.2)
        assert prim["transmission"] == pytest.approx(0.9)
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=50)
        assert float(scene.clearcoat.max()) == pytest.approx(0.7)
        assert float(scene.transmission.max()) == pytest.approx(0.9)
