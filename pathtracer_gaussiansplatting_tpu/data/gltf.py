"""glTF 2.0 scene ingest: parse + surfelize triangle meshes into Gaussians.

Behavioral port of the reference's asset layer (Gameobject::loadModel,
gameobject.cpp:198-795): .gltf/.glb parsing, node-hierarchy world transforms,
pbrMetallicRoughness materials, emissive factors, KHR_lights_punctual. Where
the reference uploads triangles to a BLAS, we convert each mesh surface into
flat Gaussian surfels (area-weighted barycentric sampling; one surfel per
sample with normal-aligned flattening) — the scene representation of this
framework.

Scope notes (documented divergences):
  * textures are not sampled — surfel colors use baseColorFactor (adding
    UV-sampled textures is a straightforward extension: sample the image at
    each surfel's interpolated UV);
  * skinning/animation is not applied (reference bakes animation frame 0,
    gameobject.cpp:64-159);
  * specular-glossiness / clearcoat / transmission extensions reduce to the
    metallic-roughness lobe parameters.

No external glTF dependency: the format is JSON + raw buffers.
"""
from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_glb(path: str) -> Tuple[dict, bytes]:
    with open(path, "rb") as f:
        magic, version, _length = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67, "not a GLB file"
        json_len, json_type = struct.unpack("<II", f.read(8))
        assert json_type == 0x4E4F534A
        gltf = json.loads(f.read(json_len))
        binary = b""
        header = f.read(8)
        if len(header) == 8:
            bin_len, bin_type = struct.unpack("<II", header)
            assert bin_type == 0x004E4942
            binary = f.read(bin_len)
    return gltf, binary


def _load_buffers(gltf: dict, base_dir: str, glb_bin: bytes) -> List[bytes]:
    out = []
    for buf in gltf.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin)
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _read_accessor(gltf: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    data = buffers[view["buffer"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or ncomp * np.dtype(dtype).itemsize
    itemsize = ncomp * np.dtype(dtype).itemsize
    if stride == itemsize:
        arr = np.frombuffer(data, dtype, count * ncomp, offset)
        return arr.reshape(count, ncomp).copy()
    rows = np.empty((count, ncomp), dtype)
    for i in range(count):
        rows[i] = np.frombuffer(data, dtype, ncomp, offset + i * stride)
    return rows


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] = np.diag(node["scale"])
    if "rotation" in node:  # xyzw in glTF
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def parse_gltf(path: str) -> dict:
    """Parse a .gltf/.glb into world-space primitives + lights.

    Returns dict:
      primitives: [{positions (V,3), normals (V,3)|None, indices (F,3),
                    base_color (4,), metallic, roughness, emissive (3,)}]
      lights: [{type, color, intensity, position, direction, range,
                inner_cone_cos, outer_cone_cos}]  (KHR_lights_punctual)
    """
    base_dir = os.path.dirname(os.path.abspath(path))
    if path.endswith(".glb"):
        gltf, glb_bin = _load_glb(path)
    else:
        with open(path) as f:
            gltf = json.load(f)
        glb_bin = b""
    buffers = _load_buffers(gltf, base_dir, glb_bin)

    materials = gltf.get("materials", [])
    khr_lights = gltf.get("extensions", {}).get(
        "KHR_lights_punctual", {}).get("lights", [])
    primitives = []
    lights = []

    def material_of(prim):
        mi = prim.get("material")
        mat = materials[mi] if mi is not None else {}
        pbr = mat.get("pbrMetallicRoughness", {})
        ext = mat.get("extensions", {})
        base = np.asarray(pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32)
        metallic = float(pbr.get("metallicFactor", 1.0))
        roughness = float(pbr.get("roughnessFactor", 1.0))

        # KHR_materials_pbrSpecularGlossiness (the reference shades this
        # workflow natively, closesthit.rchit:396-410: F0=specularFactor,
        # roughness=sqrt(1-glossiness), metallic=0; per-Gaussian SoA carries
        # scalar metal-rough channels, so we apply the standard SG->MR
        # conversion: metallic from specular brightness, diffuse as albedo).
        sg = ext.get("KHR_materials_pbrSpecularGlossiness")
        if sg is not None:
            diffuse = np.asarray(sg.get("diffuseFactor", [1, 1, 1, 1]),
                                 np.float32)
            spec = np.asarray(sg.get("specularFactor", [1, 1, 1]), np.float32)
            gloss = float(sg.get("glossinessFactor", 1.0))
            metallic = float(np.clip((spec.max() - 0.04) / (1.0 - 0.04),
                                     0.0, 1.0))
            base = np.append(
                diffuse[:3] * (1.0 - metallic)
                + spec * metallic, diffuse[3]).astype(np.float32)
            roughness = float(np.sqrt(max(1.0 - gloss, 0.04)))

        emissive = np.asarray(mat.get("emissiveFactor", [0, 0, 0]), np.float32)
        strength = ext.get(
            "KHR_materials_emissive_strength", {}).get("emissiveStrength", 1.0)
        cc = ext.get("KHR_materials_clearcoat", {})
        tr = ext.get("KHR_materials_transmission", {})
        return dict(
            base_color=base,
            metallic=metallic,
            roughness=roughness,
            emissive=emissive * strength,
            clearcoat=float(cc.get("clearcoatFactor", 0.0)),
            clearcoat_roughness=float(
                cc.get("clearcoatRoughnessFactor", 0.0)),
            transmission=float(tr.get("transmissionFactor", 0.0)),
        )

    def walk(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if "POSITION" not in prim.get("attributes", {}):
                    continue
                pos = _read_accessor(gltf, buffers,
                                     prim["attributes"]["POSITION"])
                pos = pos.astype(np.float64) @ world[:3, :3].T + world[:3, 3]
                normals = None
                if "NORMAL" in prim["attributes"]:
                    nrm = _read_accessor(gltf, buffers,
                                         prim["attributes"]["NORMAL"])
                    nmat = np.linalg.inv(world[:3, :3]).T
                    normals = nrm.astype(np.float64) @ nmat.T
                if "indices" in prim:
                    idx = _read_accessor(gltf, buffers, prim["indices"])
                    faces = idx.reshape(-1, 3).astype(np.int64)
                else:
                    faces = np.arange(len(pos), dtype=np.int64).reshape(-1, 3)
                primitives.append(dict(
                    positions=pos.astype(np.float32),
                    normals=None if normals is None
                    else normals.astype(np.float32),
                    indices=faces, **material_of(prim)))
        light_ref = node.get("extensions", {}).get(
            "KHR_lights_punctual", {}).get("light")
        if light_ref is not None and light_ref < len(khr_lights):
            l = khr_lights[light_ref]
            ltype = {"directional": 1, "point": 0, "spot": 2}.get(
                l.get("type", "point"), 0)
            direction = world[:3, :3] @ np.array([0.0, 0.0, -1.0])
            spot = l.get("spot", {})
            lights.append(dict(
                type=ltype,
                color=np.asarray(l.get("color", [1, 1, 1]), np.float32),
                intensity=float(l.get("intensity", 1.0)),
                position=world[:3, 3].astype(np.float32),
                direction=(direction / max(np.linalg.norm(direction), 1e-9)
                           ).astype(np.float32),
                range=float(l.get("range", 0.0)),
                inner_cone_cos=float(np.cos(spot.get("innerConeAngle", 0.0))),
                outer_cone_cos=float(np.cos(
                    spot.get("outerConeAngle", np.pi / 4))),
            ))
        for child in node.get("children", []):
            walk(child, world)

    scene_idx = gltf.get("scene", 0)
    scenes = gltf.get("scenes", [{}])
    for root in scenes[scene_idx].get("nodes", []):
        walk(root, np.eye(4))
    return dict(primitives=primitives, lights=lights)


def surfelize_mesh(positions, faces, normals=None,
                   surfels_per_unit_area: float = 200.0,
                   min_surfels_per_face: int = 0,
                   thickness_ratio: float = 0.1,
                   seed: int = 13):
    """Sample a triangle mesh into flat Gaussian surfels.

    Area-weighted barycentric sampling; each surfel is a disk Gaussian whose
    tangent sigmas cover its share of the face area and whose normal sigma is
    ``thickness_ratio`` of that.

    Returns dict: means (S,3), log_scales (S,3), quats (S,4), normals (S,3).
    """
    from pathtracer_gaussiansplatting_tpu.ops.quaternions import rotmat_to_quat
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    p0 = positions[faces[:, 0]]
    p1 = positions[faces[:, 1]]
    p2 = positions[faces[:, 2]]
    cross = np.cross(p1 - p0, p2 - p0)
    areas = 0.5 * np.linalg.norm(cross, axis=-1)
    face_n = cross / np.maximum(np.linalg.norm(cross, axis=-1,
                                               keepdims=True), 1e-12)
    counts = np.maximum(
        np.round(areas * surfels_per_unit_area).astype(np.int64),
        min_surfels_per_face)
    # guarantee at least one surfel somewhere
    if counts.sum() == 0:
        counts[np.argmax(areas)] = 1
    face_ids = np.repeat(np.arange(len(faces)), counts)
    s = len(face_ids)
    u = rng.uniform(size=(s, 2))
    flip = u.sum(-1) > 1.0
    u[flip] = 1.0 - u[flip]
    means = (p0[face_ids] + u[:, :1] * (p1 - p0)[face_ids]
             + u[:, 1:] * (p2 - p0)[face_ids])
    n = face_n[face_ids]
    # per-surfel radius: share of face area, with overlap factor
    share = areas[face_ids] / np.maximum(counts[face_ids], 1)
    radius = np.sqrt(share / np.pi) * 1.6
    # tangent frame
    helper = np.where(np.abs(n[:, 2:3]) < 0.9,
                      np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]]))
    t1 = np.cross(n, helper)
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = np.cross(n, t1)
    frames = np.stack([t1, t2, n], axis=-1)  # columns
    quats = np.asarray(rotmat_to_quat(jnp.asarray(frames, jnp.float32)))
    log_scales = np.log(np.stack(
        [radius, radius, np.maximum(radius * thickness_ratio, 1e-5)], -1))
    return dict(means=means.astype(np.float32),
                log_scales=log_scales.astype(np.float32),
                quats=quats.astype(np.float32),
                normals=n.astype(np.float32))


def load_gltf_scene(path: str, surfels_per_unit_area: float = 200.0,
                    opacity_logit: float = 7.0, seed: int = 13):
    """Load a glTF file as (GaussianScene, PunctualLights|None)."""
    from pathtracer_gaussiansplatting_tpu.core.types import (
        make_punctual_lights, make_scene,
    )
    from pathtracer_gaussiansplatting_tpu.models.scene import concat_scenes

    parsed = parse_gltf(path)
    parts = []
    for prim in parsed["primitives"]:
        surf = surfelize_mesh(prim["positions"], prim["indices"],
                              prim.get("normals"),
                              surfels_per_unit_area=surfels_per_unit_area,
                              seed=seed)
        m = len(surf["means"])
        if m == 0:
            continue
        color = np.tile(prim["base_color"][:3], (m, 1))
        emissive = np.tile(prim["emissive"], (m, 1))
        parts.append(make_scene(
            means=surf["means"], log_scales=surf["log_scales"],
            quats=surf["quats"],
            opacity_logits=np.full(m, opacity_logit, np.float32),
            colors=color, emission=emissive,
            metallic=np.full(m, prim["metallic"], np.float32),
            roughness=np.full(m, prim["roughness"], np.float32),
            clearcoat=np.full(m, prim.get("clearcoat", 0.0), np.float32),
            clearcoat_roughness=np.full(
                m, max(prim.get("clearcoat_roughness", 0.0), 0.03),
                np.float32),
            transmission=np.full(m, prim.get("transmission", 0.0),
                                 np.float32)))
    if not parts:
        raise ValueError(f"no geometry in {path}")
    scene = concat_scenes(parts)
    lights = parsed["lights"]
    punctual = None
    if lights:
        punctual = make_punctual_lights(
            position=[l["position"] for l in lights],
            direction=[l["direction"] for l in lights],
            color=[l["color"] for l in lights],
            intensity=[l["intensity"] for l in lights],
            light_type=[l["type"] for l in lights],
            range=[l["range"] for l in lights],
            inner_cone_cos=[l["inner_cone_cos"] for l in lights],
            outer_cone_cos=[l["outer_cone_cos"] for l in lights])
    return scene, punctual
