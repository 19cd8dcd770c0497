"""glTF ingest: parsing, node transforms, lights, surfelization, rendering."""
import base64
import json
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.data.gltf import (
    load_gltf_scene, parse_gltf, surfelize_mesh,
)


def quad_gltf(tmp_path, translation=(0, 0, 0), with_light=True,
              emissive=(0, 0, 0)):
    """A unit XY quad (2 triangles) with a red material + optional light."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    pos_bytes = positions.tobytes()
    idx_bytes = indices.tobytes() + b"\x00\x00"  # pad to 4
    blob = pos_bytes + idx_bytes
    uri = "data:application/octet-stream;base64," + \
        base64.b64encode(blob).decode()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": list(translation),
             "children": [1] if with_light else []},
        ] + ([{"extensions": {"KHR_lights_punctual": {"light": 0}},
               "translation": [0, 2, 0]}] if with_light else []),
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorFactor": [1, 0, 0, 1],
                                     "metallicFactor": 0.25,
                                     "roughnessFactor": 0.5},
            "emissiveFactor": list(emissive)}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {"buffer": 0, "byteOffset": len(pos_bytes), "byteLength": 12},
        ],
        "buffers": [{"uri": uri, "byteLength": len(blob)}],
    }
    if with_light:
        doc["extensions"] = {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1, 1, 0.9], "intensity": 20.0}]}}
        doc["extensionsUsed"] = ["KHR_lights_punctual"]
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


class TestParse:
    def test_geometry_and_material(self, tmp_path):
        parsed = parse_gltf(quad_gltf(tmp_path))
        assert len(parsed["primitives"]) == 1
        prim = parsed["primitives"][0]
        assert prim["positions"].shape == (4, 3)
        assert prim["indices"].shape == (2, 3)
        np.testing.assert_allclose(prim["base_color"][:3], [1, 0, 0])
        assert prim["metallic"] == 0.25 and prim["roughness"] == 0.5

    def test_node_translation_applied(self, tmp_path):
        parsed = parse_gltf(quad_gltf(tmp_path, translation=(5, 0, 0)))
        pos = parsed["primitives"][0]["positions"]
        assert pos[:, 0].min() >= 5.0

    def test_light_world_position(self, tmp_path):
        parsed = parse_gltf(quad_gltf(tmp_path, translation=(5, 0, 0)))
        assert len(parsed["lights"]) == 1
        l = parsed["lights"][0]
        np.testing.assert_allclose(l["position"], [5, 2, 0], atol=1e-6)
        assert l["type"] == 0 and l["intensity"] == 20.0

    def test_glb_roundtrip(self, tmp_path):
        # repack the .gltf as .glb with a BIN chunk
        src = quad_gltf(tmp_path, with_light=False)
        doc = json.loads(open(src).read())
        blob = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
        del doc["buffers"][0]["uri"]
        j = json.dumps(doc).encode()
        j += b" " * ((4 - len(j) % 4) % 4)
        b = blob + b"\x00" * ((4 - len(blob) % 4) % 4)
        glb = tmp_path / "quad.glb"
        with open(glb, "wb") as f:
            total = 12 + 8 + len(j) + 8 + len(b)
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(j), 0x4E4F534A) + j)
            f.write(struct.pack("<II", len(b), 0x004E4942) + b)
        parsed = parse_gltf(str(glb))
        assert parsed["primitives"][0]["positions"].shape == (4, 3)


class TestSurfelize:
    def test_surfels_on_surface(self, rng):
        positions = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]],
                             np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        surf = surfelize_mesh(positions, faces, surfels_per_unit_area=100)
        m = surf["means"]
        assert len(m) > 200  # ~4 area units * 100
        assert np.abs(m[:, 2]).max() < 1e-5  # on the z=0 plane
        assert (m[:, 0] >= -1e-5).all() and (m[:, 0] <= 2 + 1e-5).all()
        # normals along +-z, flat axis is z
        np.testing.assert_allclose(np.abs(surf["normals"][:, 2]), 1.0,
                                   atol=1e-5)
        scales = np.exp(surf["log_scales"])
        assert (scales[:, 2] < scales[:, 0]).all()

    def test_count_scales_with_density(self):
        positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]])
        a = len(surfelize_mesh(positions, faces,
                                surfels_per_unit_area=100)["means"])
        b = len(surfelize_mesh(positions, faces,
                                surfels_per_unit_area=400)["means"])
        assert 2.5 < b / max(a, 1) < 6.5


class TestLoadScene:
    def test_scene_and_lights(self, tmp_path):
        path = quad_gltf(tmp_path)
        scene, punctual = load_gltf_scene(path, surfels_per_unit_area=200)
        assert scene.num_gaussians > 50
        assert punctual is not None and punctual.num_lights == 1
        # surfels inherit the red base color
        from pathtracer_gaussiansplatting_tpu.core.sh import eval_sh

        c = np.asarray(eval_sh(scene.sh_coeffs,
                               jnp.tile(jnp.array([[0, 0, 1.0]]),
                                        (scene.num_gaussians, 1))))
        assert (c[:, 0] > 0.9).all() and (c[:, 1] < 0.1).all()

    def test_render_gltf_scene(self, tmp_path):
        from pathtracer_gaussiansplatting_tpu.core.camera import (
            Camera, generate_rays, look_at,
        )
        from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
        from pathtracer_gaussiansplatting_tpu.render.reference import (
            render_radiance_dense,
        )

        scene, _ = load_gltf_scene(quad_gltf(tmp_path, with_light=False),
                                   surfels_per_unit_area=300)
        cam = Camera(c2w=look_at((0.5, 0.5, 1.2), (0.5, 0.5, 0.0)),
                     fov_y_deg=40.0, width=16, height=16)
        img = np.asarray(render_radiance_dense(
            scene, generate_rays(cam), RenderSettings(max_contribs=64)))
        # red quad fills the view
        assert img[:, 0].mean() > 0.5 and img[:, 1].mean() < 0.2

    def test_config_integration(self, tmp_path):
        from pathtracer_gaussiansplatting_tpu.models.scene import (
            load_scene_from_config,
        )
        from pathtracer_gaussiansplatting_tpu.utils.config import (
            load_scene_config,
        )

        gltf_path = quad_gltf(tmp_path)
        cfg_path = tmp_path / "scene.json"
        cfg_path.write_text(json.dumps({
            "settings": {"sun": {"color": [1, 1, 1],
                                 "direction": [0, -1, 0]}},
            "objects": [{"model": "quad.gltf", "position": [0, 0, 0]}],
        }))
        cfg = load_scene_config(str(cfg_path))
        scene, punctual = load_scene_from_config(cfg, str(tmp_path))
        assert scene.num_gaussians > 50
        assert punctual.num_lights == 2  # gltf point light + sun
