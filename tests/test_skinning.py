"""Skinning + animation frame-0 baking (gameobject.cpp:64-159, 562-795).

The reference bakes joints/weights and animation frame 0 into world-space
vertices before BLAS upload; our loader does the same before surfelization.
Assets here are hand-crafted minimal glTFs with hand-computed expected
vertex positions.
"""
import base64
import json
import os

import numpy as np

from pathtracer_gaussiansplatting_tpu.data.gltf import parse_gltf


def _b64(blob: bytes) -> str:
    return ("data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode())


def _write(tmp_path, gltf) -> str:
    path = os.path.join(str(tmp_path), "skin.gltf")
    with open(path, "w") as f:
        json.dump(gltf, f)
    return path


def _skinned_quad(joint_translations, weights_rows, anim=None):
    """A unit quad skinned to two joints with per-vertex weights.

    joint_translations: [(3,), (3,)] static translations of the two joint
    nodes; weights_rows: (4, 2) per-vertex weights (padded to vec4);
    anim: optional dict node->{path: value} written as a 1-keyframe
    animation."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    joints = np.zeros((4, 4), np.uint8)
    joints[:, 1] = 1
    w4 = np.zeros((4, 4), np.float32)
    w4[:, :2] = weights_rows
    ibm = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    ibm_blob = ibm.transpose(0, 2, 1).tobytes()  # column-major per glTF
    blob = pos.tobytes() + joints.tobytes() + w4.tobytes() + idx.tobytes() \
        + ibm_blob
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"translation": list(map(float, joint_translations[0]))},
            {"translation": list(map(float, joint_translations[1]))},
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3}]}],
        "buffers": [{"uri": _b64(blob), "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 16},
            {"buffer": 0, "byteOffset": 64, "byteLength": 64},
            {"buffer": 0, "byteOffset": 128, "byteLength": 24},
            {"buffer": 0, "byteOffset": 152, "byteLength": 128},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5121, "count": 4,
             "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC4"},
            {"bufferView": 3, "componentType": 5125, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2,
             "type": "MAT4"},
        ],
    }
    if anim:
        times = np.array([0.0, 1.0], np.float32)
        channels, samplers, extra_views, extra_accs = [], [], [], []
        ablob = times.tobytes()
        for node, paths in anim.items():
            for path_, vals in paths.items():
                vals = np.asarray(vals, np.float32)
                off = len(ablob)
                ablob += vals.tobytes()
                vi = len(gltf["bufferViews"]) + len(extra_views) + 1
                extra_views.append({"buffer": 1, "byteOffset": off,
                                    "byteLength": vals.nbytes})
                ai = len(gltf["accessors"]) + len(extra_accs) + 1
                extra_accs.append({
                    "bufferView": vi, "componentType": 5126,
                    "count": len(vals),
                    "type": "VEC4" if path_ == "rotation" else "VEC3"})
                samplers.append({"input": len(gltf["accessors"]),
                                 "output": ai,
                                 "interpolation": "LINEAR"})
                channels.append({"sampler": len(samplers) - 1,
                                 "target": {"node": node, "path": path_}})
        gltf["bufferViews"].append({"buffer": 1, "byteOffset": 0,
                                    "byteLength": 8})
        gltf["accessors"].append({"bufferView": len(gltf["bufferViews"]) - 1,
                                  "componentType": 5126, "count": 2,
                                  "type": "SCALAR"})
        gltf["bufferViews"].extend(extra_views)
        gltf["accessors"].extend(extra_accs)
        gltf["buffers"].append({"uri": _b64(ablob),
                                "byteLength": len(ablob)})
        gltf["animations"] = [{"channels": channels, "samplers": samplers}]
    return gltf


class TestSkinning:
    def test_single_joint_translation(self, tmp_path):
        # all weight on joint 0, which sits at (2, 0, 0): quad shifts by +2x
        g = _skinned_quad([(2, 0, 0), (0, 0, 0)],
                          np.array([[1, 0]] * 4, np.float32))
        parsed = parse_gltf(_write(tmp_path, g))
        pos = parsed["primitives"][0]["positions"]
        expect = np.array([[2, 0, 0], [3, 0, 0], [3, 1, 0], [2, 1, 0]],
                          np.float32)
        np.testing.assert_allclose(pos, expect, atol=1e-6)

    def test_two_joint_blend(self, tmp_path):
        # 50/50 between identity joint and (1,0,0) joint: shift by +0.5x
        g = _skinned_quad([(0, 0, 0), (1, 0, 0)],
                          np.array([[0.5, 0.5]] * 4, np.float32))
        parsed = parse_gltf(_write(tmp_path, g))
        pos = parsed["primitives"][0]["positions"]
        np.testing.assert_allclose(pos[:, 0],
                                   [0.5, 1.5, 1.5, 0.5], atol=1e-6)

    def test_animation_frame0_overrides_joint(self, tmp_path):
        # static joint at (2,0,0) but animation frame 0 puts it at (0,0,5)
        g = _skinned_quad([(2, 0, 0), (0, 0, 0)],
                          np.array([[1, 0]] * 4, np.float32),
                          anim={1: {"translation": [[0, 0, 5], [0, 0, 9]]}})
        parsed = parse_gltf(_write(tmp_path, g))
        pos = parsed["primitives"][0]["positions"]
        np.testing.assert_allclose(pos[0], [0, 0, 5], atol=1e-6)
        np.testing.assert_allclose(pos[2], [1, 1, 5], atol=1e-6)

    def test_animation_frame0_on_plain_node(self, tmp_path):
        # non-skinned node: frame-0 rotation (90 deg about z) bakes into
        # world vertices: (1,0,0) -> (0,1,0)
        pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
        blob = pos.tobytes() + idx.tobytes()
        s2 = float(np.sin(np.pi / 4))
        g = {
            "asset": {"version": "2.0"}, "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1}]}],
            "buffers": [{"uri": _b64(blob), "byteLength": len(blob)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": 48},
                {"buffer": 0, "byteOffset": 48, "byteLength": 24}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 4,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5125, "count": 6,
                 "type": "SCALAR"}],
        }
        times = np.array([0.0, 1.0], np.float32)
        rots = np.array([[0, 0, s2, s2], [0, 0, 0, 1]], np.float32)  # xyzw
        ablob = times.tobytes() + rots.tobytes()
        g["buffers"].append({"uri": _b64(ablob), "byteLength": len(ablob)})
        g["bufferViews"] += [
            {"buffer": 1, "byteOffset": 0, "byteLength": 8},
            {"buffer": 1, "byteOffset": 8, "byteLength": 32}]
        g["accessors"] += [
            {"bufferView": 2, "componentType": 5126, "count": 2,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2,
             "type": "VEC4"}]
        g["animations"] = [{
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "rotation"}}],
            "samplers": [{"input": 2, "output": 3,
                          "interpolation": "LINEAR"}]}]
        parsed = parse_gltf(_write(tmp_path, g))
        pos_w = parsed["primitives"][0]["positions"]
        np.testing.assert_allclose(pos_w[1], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(pos_w[3], [-1, 0, 0], atol=1e-6)
