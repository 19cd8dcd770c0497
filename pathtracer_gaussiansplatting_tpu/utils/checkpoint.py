"""Checkpoint / resume for long renders and training runs.

The reference has NO state checkpointing (SURVEY.md §5): progressive
accumulation lives in GPU images and resets on input; a crashed multi-hour
capture restarts from scratch. Here:

  * :func:`save_render_state` / :func:`load_render_state` persist the
    accumulation buffer + completed-sample count + base RNG key, so a
    converged render resumes mid-accumulation with identical results (the
    accumulation is a pure function of (state, frame_index)).
  * :func:`save_scene` / :func:`load_scene` persist GaussianScene pytrees
    (npz; the 3DGS PLY in data/ply.py is the interchange format).
  * :func:`capture_progress` tracks which capture poses are done so
    capture_scene_data-style loops can skip completed work after a restart.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np


def save_render_state(path: str, accumulation, frames_done: int,
                      base_key, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        accumulation=np.asarray(accumulation),
        frames_done=np.int64(frames_done),
        base_key=np.asarray(base_key),
        extra=json.dumps(extra or {}),
    )


def load_render_state(path: str):
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        return dict(
            accumulation=jnp.asarray(z["accumulation"]),
            frames_done=int(z["frames_done"]),
            base_key=jnp.asarray(z["base_key"]),
            extra=json.loads(str(z["extra"])),
        )


def save_scene(path: str, scene):
    import dataclasses

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{
        f.name: np.asarray(getattr(scene, f.name))
        for f in dataclasses.fields(scene)
    })


def load_scene(path: str):
    import jax.numpy as jnp

    from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene

    import dataclasses

    with np.load(path, allow_pickle=False) as z:
        data = {k: jnp.asarray(z[k]) for k in z.files}
    # Forward compatibility: scenes saved before a material channel existed
    # load with that channel's default (zeros / 0.03 cc roughness).
    n = data["means"].shape[0]
    defaults = dict(clearcoat=jnp.zeros((n,), jnp.float32),
                    clearcoat_roughness=jnp.full((n,), 0.03, jnp.float32),
                    transmission=jnp.zeros((n,), jnp.float32))
    for f in dataclasses.fields(GaussianScene):
        if f.name not in data and f.name in defaults:
            data[f.name] = defaults[f.name]
    return GaussianScene(**data)


class CaptureProgress:
    """Journal of completed capture poses (JSON file, atomic rewrite).

    ``fingerprint`` guards resume against CONFIG DRIFT: a journal written
    under a different capture configuration (camera geometry, resolution,
    spp, scene identity, ...) is discarded with a warning instead of
    silently mixing old images with new transforms — resuming a
    radius-changed capture produced a corrupt dataset in r5 testing
    (DOWNSTREAM v2: old-pose images paired with new-pose cameras).
    """

    def __init__(self, path: str, fingerprint=None):
        self.path = path
        self.done = set()
        self.fingerprint = fingerprint
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            old_fp = data.get("fingerprint")
            if fingerprint is not None and old_fp is not None \
                    and old_fp != fingerprint:
                from pathtracer_gaussiansplatting_tpu.utils.logging import (
                    get_logger,
                )

                get_logger().warning(
                    "capture journal %s was written under a different "
                    "configuration (fingerprint %s != %s) — discarding "
                    "it; all poses will be re-captured",
                    path, old_fp, fingerprint)
            else:
                self.done = set(data["done"])

    def is_done(self, index: int) -> bool:
        return index in self.done

    def mark(self, index: int):
        self.done.add(index)
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(dict(done=sorted(self.done),
                           fingerprint=self.fingerprint), f)
        os.replace(tmp, self.path)
