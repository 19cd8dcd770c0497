"""Texture baking at surfelization vs manual bilinear taps.

Covers the reference's texture surface (closesthit.rchit:364-439,
gameobject.cpp:275-342, alpha.rahit:14-62): baseColor (sRGB), metal-rough
channels, KHR_texture_transform, alphaMode MASK cutout, normal mapping,
and the surfel-footprint mip selection (ray-cone LOD analog).
"""
import base64
import io
import json
import os

import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.data import textures as tx
from pathtracer_gaussiansplatting_tpu.data.gltf import (
    load_gltf_scene, parse_gltf,
)


def _png_data_uri(rgba: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgba.astype(np.uint8), "RGBA").save(buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


def _quad_gltf(tmp_path, material: dict, images: list,
               samplers=None, uv=((0, 0), (1, 0), (1, 1), (0, 1))):
    """Minimal .gltf: a unit XY quad with UVs and the given material."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray(uv, np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    blob = (pos.tobytes() + nrm.tobytes() + uvs.tobytes() + idx.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [material],
        "textures": [{"source": i, "sampler": 0} for i in range(len(images))],
        "samplers": samplers or [{"wrapS": 10497, "wrapT": 10497}],
        "images": [{"uri": u} for u in images],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5125, "count": 6,
             "type": "SCALAR"},
        ],
    }
    path = os.path.join(tmp_path, "quad.gltf")
    with open(path, "w") as f:
        json.dump(gltf, f)
    return path


class TestSamplerPrimitives:
    def test_bilinear_center_taps(self):
        img = np.zeros((2, 2, 4), np.float32)
        img[0, 0] = [1, 0, 0, 1]
        img[0, 1] = [0, 1, 0, 1]
        img[1, 0] = [0, 0, 1, 1]
        img[1, 1] = [1, 1, 1, 1]
        # texel centers: exact values
        uv = np.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75],
                       [0.5, 0.5]], np.float32)
        out = tx.sample_bilinear(img, uv)
        np.testing.assert_allclose(out[0], [1, 0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(out[1], [0, 1, 0, 1], atol=1e-6)
        np.testing.assert_allclose(out[2], [0, 0, 1, 1], atol=1e-6)
        np.testing.assert_allclose(out[3], [0.5, 0.5, 0.5, 1], atol=1e-6)

    def test_wrap_modes(self):
        img = np.zeros((1, 2, 4), np.float32)
        img[0, 0] = [1, 0, 0, 1]
        img[0, 1] = [0, 1, 0, 1]
        uv = np.array([[1.25, 0.5]], np.float32)  # past the right edge
        rep = tx.sample_bilinear(img, uv, wrap_s=10497)   # REPEAT -> texel 0
        cla = tx.sample_bilinear(img, uv, wrap_s=33071)   # CLAMP -> texel 1
        assert rep[0, 0] > 0.9 and cla[0, 1] > 0.9

    def test_mips_and_srgb(self):
        img = np.zeros((4, 4, 4), np.float32)
        img[:2] = [1, 1, 1, 1]
        mips = tx.build_mips(img)
        assert [m.shape[0] for m in mips] == [4, 2, 1]
        np.testing.assert_allclose(mips[2][0, 0, 0], 0.5, atol=1e-6)
        # sRGB decode: 0.5 stored -> ~0.2140 linear
        np.testing.assert_allclose(tx.srgb_to_linear(0.5), 0.21404114,
                                   atol=1e-6)

    def test_texture_transform(self):
        uv = np.array([[0.5, 0.5]], np.float32)
        out = tx.apply_texture_transform(
            uv, {"offset": [0.1, 0.2], "scale": [2.0, 2.0]})
        np.testing.assert_allclose(out[0], [1.1, 1.2], atol=1e-6)


class TestBakedChannels:
    def test_base_color_matches_manual_taps(self, tmp_path):
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[:, :4] = [255, 0, 0, 255]     # left half red
        rgba[:, 4:] = [0, 0, 255, 255]     # right half blue
        path = _quad_gltf(str(tmp_path), {
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0, "roughnessFactor": 1.0}},
            [_png_data_uri(rgba)])
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=400)
        means = np.asarray(scene.means)
        colors = np.asarray(scene.sh_coeffs)[:, 0] * 0.2820948 * 2 \
            if False else None
        # recover albedo via the scene's color accessor
        from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
        import jax.numpy as jnp
        albedo = np.asarray(sh_mod.eval_sh(
            scene.sh_coeffs,
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (len(means), 1)), 0))
        # quad spans x in [0,1] = u; left surfels red, right surfels blue
        lin = tx.srgb_to_linear(1.0)
        # stay off u~0/1 where REPEAT wrap bilinearly bleeds the other half
        left = albedo[(means[:, 0] > 0.1) & (means[:, 0] < 0.4)]
        right = albedo[(means[:, 0] > 0.6) & (means[:, 0] < 0.9)]
        assert (left[:, 0] > 0.9 * lin).all() and (left[:, 2] < 0.05).all()
        assert (right[:, 2] > 0.9 * lin).all() and (right[:, 0] < 0.05).all()

    def test_metallic_roughness_channels(self, tmp_path):
        rgba = np.zeros((4, 4, 4), np.uint8)
        rgba[..., 1] = 128   # G = roughness
        rgba[..., 2] = 255   # B = metallic
        rgba[..., 3] = 255
        path = _quad_gltf(str(tmp_path), {
            "pbrMetallicRoughness": {
                "metallicRoughnessTexture": {"index": 0},
                "metallicFactor": 1.0, "roughnessFactor": 1.0}},
            [_png_data_uri(rgba)])
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=100)
        np.testing.assert_allclose(np.asarray(scene.metallic), 1.0,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(scene.roughness), 128 / 255,
                                   atol=2e-3)

    def test_alpha_mask_cutout(self, tmp_path):
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[..., :3] = 255
        rgba[:, :4, 3] = 255   # left opaque
        rgba[:, 4:, 3] = 0     # right cut out
        path = _quad_gltf(str(tmp_path), {
            "alphaMode": "MASK", "alphaCutoff": 0.5,
            "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}},
            [_png_data_uri(rgba)])
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=800)
        means = np.asarray(scene.means)
        assert (means[:, 0] < 0.55).all()       # right half surfels dropped
        assert (means[:, 0] < 0.35).any()       # left half survives

    def test_blend_alpha_scales_opacity(self, tmp_path):
        rgba = np.zeros((4, 4, 4), np.uint8)
        rgba[..., :3] = 255
        rgba[..., 3] = 128
        path = _quad_gltf(str(tmp_path), {
            "alphaMode": "BLEND",
            "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}},
            [_png_data_uri(rgba)])
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=100,
                                   opacity_logit=7.0)
        op = np.asarray(scene.opacities)
        base = 1.0 / (1.0 + np.exp(-7.0))
        np.testing.assert_allclose(op, base * 128 / 255, atol=2e-3)

    def test_normal_map_perturbs_surfel_frame(self, tmp_path):
        # +X-leaning tangent-space normal: (1,0,1)/sqrt(2)
        v = np.uint8(np.round((1 / np.sqrt(2) * 0.5 + 0.5) * 255))
        rgba = np.zeros((4, 4, 4), np.uint8)
        rgba[..., 0] = v
        rgba[..., 1] = 128
        rgba[..., 2] = v
        rgba[..., 3] = 255
        path = _quad_gltf(str(tmp_path), {
            "normalTexture": {"index": 0},
            "pbrMetallicRoughness": {}}, [_png_data_uri(rgba)])
        parsed = parse_gltf(path)
        from pathtracer_gaussiansplatting_tpu.data.gltf import (
            bake_surfel_materials, surfelize_mesh,
        )
        prim = parsed["primitives"][0]
        surf = surfelize_mesh(prim["positions"], prim["indices"],
                              surfels_per_unit_area=100)
        baked = bake_surfel_materials(prim, surf, parsed["texture_env"])
        n = baked["normals"]
        # quad normal +Z, tangent from UV grads = +X: perturbed ~ (1,0,1)/s2
        np.testing.assert_allclose(
            np.abs(n @ np.array([1, 0, 1]) / np.sqrt(2)), 1.0, atol=0.02)

    def test_texture_transform_shifts_sampling(self, tmp_path):
        rgba = np.zeros((8, 8, 4), np.uint8)
        rgba[:, :4] = [255, 0, 0, 255]
        rgba[:, 4:] = [0, 255, 0, 255]
        path = _quad_gltf(str(tmp_path), {
            "pbrMetallicRoughness": {
                "baseColorTexture": {
                    "index": 0,
                    "extensions": {"KHR_texture_transform": {
                        "offset": [0.5, 0.0]}}},
                "metallicFactor": 0.0}},
            [_png_data_uri(rgba)])
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=200)
        from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
        import jax.numpy as jnp
        means = np.asarray(scene.means)
        albedo = np.asarray(sh_mod.eval_sh(
            scene.sh_coeffs,
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (len(means), 1)), 0))
        # offset 0.5 in u: left half of the quad now samples the GREEN half
        left = albedo[(means[:, 0] > 0.1) & (means[:, 0] < 0.4)]
        assert (left[:, 1] > 0.5).all() and (left[:, 0] < 0.05).all()

    def test_lod_mip_selection_averages(self, tmp_path):
        # 1x1-texel checkerboard; with use_lod and huge surfels the bake
        # should land on a coarse mip ~= 0.5 gray (aliasing reduction).
        n_tex = 64
        rgba = np.zeros((n_tex, n_tex, 4), np.uint8)
        rgba[(np.indices((n_tex, n_tex)).sum(0) % 2) == 0, :3] = 255
        rgba[..., 3] = 255
        mat = {"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}, "metallicFactor": 0.0}}
        path = _quad_gltf(str(tmp_path), mat, [_png_data_uri(rgba)])
        # few surfels => huge footprints => coarse mip
        scene, _ = load_gltf_scene(path, surfels_per_unit_area=8,
                                   use_lod=True, lod_factor=1.0)
        from pathtracer_gaussiansplatting_tpu.core import sh as sh_mod
        import jax.numpy as jnp
        albedo = np.asarray(sh_mod.eval_sh(
            scene.sh_coeffs,
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]),
                     (scene.num_gaussians, 1)), 0))
        gray = tx.srgb_to_linear(0.5)
        assert np.all(np.abs(albedo.mean(-1) - gray) < 0.15), albedo.mean(0)
        # without lod: sharp black/white taps
        scene2, _ = load_gltf_scene(path, surfels_per_unit_area=8,
                                    use_lod=False)
        albedo2 = np.asarray(sh_mod.eval_sh(
            scene2.sh_coeffs,
            jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]),
                     (scene2.num_gaussians, 1)), 0))
        assert np.std(albedo2.mean(-1)) > np.std(albedo.mean(-1))
