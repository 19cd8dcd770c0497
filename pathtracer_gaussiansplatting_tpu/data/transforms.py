"""NeRF-blender transforms.json writer/reader.

Byte-format parity with Engine::saveTransformsJson (engine.cpp:2816-2847):
{"camera_angle_x": fov_x, "frames": [{"file_path": "./train/r_i",
"transform_matrix": [[...4x4 row-major...]]}]} with 4-space indent; the
matrix is camera-to-world (inverse of the view matrix, engine.cpp:2761) in
the OpenGL/NeRF convention our Camera already uses.
"""
from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np


def save_transforms_json(path, camera_angle_x: float, frames: Sequence[dict]):
    """frames: [{"file_path": str, "transform_matrix": (4,4) array}]."""
    root = {
        "camera_angle_x": float(camera_angle_x),
        "frames": [
            {
                "file_path": fr["file_path"],
                "transform_matrix": np.asarray(
                    fr["transform_matrix"], np.float64).tolist(),
            }
            for fr in frames
        ],
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(root, f, indent=4)


def load_transforms_json(path):
    with open(path) as f:
        root = json.load(f)
    frames = [
        dict(file_path=fr["file_path"],
             transform_matrix=np.asarray(fr["transform_matrix"], np.float32))
        for fr in root["frames"]
    ]
    return dict(camera_angle_x=float(root["camera_angle_x"]), frames=frames)
