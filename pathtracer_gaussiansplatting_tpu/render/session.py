"""Headless interactive session (the reference's run()/drawFrame loop).

The reference is an interactive GLFW app: WASD+mouse camera, hotkeys that
resize the torus sensor and switch sampling strategies, and progressive
accumulation that RESETS whenever any input changes the view
(engine.cpp:1864-1874, 2032-2121; reset-on-input :2062-2072; torus live
resize torus.h:125-159 + updateTorusRTBuffer engine.cpp:2577-2605). There
is no window on a TPU host, so this driver reproduces the *semantics*
headlessly: callers (the `interact` CLI subcommand, scripts, tests) feed
it key/cursor events and step it one accumulation sample at a time; any
state-changing input zeroes the accumulation exactly like the reference.

Key map (mirrors engine.h:195-235):
  w/a/s/d/ascend   free-camera translation      c     toggle camera mode
  look dx dy       cursor deltas (yaw/pitch or toroidal alpha/beta)
  z/x  torus major radius +/-    m/n  torus minor radius +/-
  u/j  torus height +/-          r    camera reset
  1-7  sampling strategy for the point-cloud pass
  p    toggle point-cloud overlay mode
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_gaussiansplatting_tpu.core.camera import (
    Camera, FreeCamera, toroidal_c2w,
)
from pathtracer_gaussiansplatting_tpu.core.torus import TorusConfig
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.sampling.strategies import (
    SamplingMethod,
)

_METHOD_KEYS = {str(i + 1): m for i, m in enumerate(SamplingMethod)}


class InteractiveSession:
    """Progressive renderer + input state machine, one sample per step().

    ``step()`` renders one path-traced sample for the current pose and
    folds it into the accumulation buffer (mix(prev, cur, 1/(n+1)),
    raygen_camera.rgen:80-87). Every input that changes the view —
    camera motion, mode switch, torus resize — resets the accumulation,
    and torus edits rebuild the sensor-dependent state lazily (the
    reference destroys and recreates the torus ray buffer,
    engine.cpp:2062-2068).
    """

    def __init__(self, scene, settings: RenderSettings,
                 width: int = 320, height: int = 240,
                 torus: TorusConfig = TorusConfig(),
                 punctual=None, backend: str = "auto", seed: int = 13):
        from pathtracer_gaussiansplatting_tpu.render.lights import (
            build_light_tables,
        )
        from pathtracer_gaussiansplatting_tpu.render.pipeline import (
            make_trace_backend,
        )

        self.scene = scene
        self.settings = settings
        self.width, self.height = width, height
        self.torus = torus
        self.punctual = punctual
        self.free_cam = FreeCamera()
        self.camera_mode = "free"        # or "toroidal"
        self.alpha_deg, self.beta_deg = 0.0, 0.0
        self.render_mode = "camera"      # or "pointcloud"
        self.sampling = SamplingMethod.UNIFORM
        self.frame = 0                   # accumulated samples at this pose
        self._accum: Optional[np.ndarray] = None
        # live hit buffer for IMP_COL/IMP_HIT feedback (sampling.cpp:389)
        self._prev_uv: Optional[np.ndarray] = None
        self._prev_colors: Optional[np.ndarray] = None
        self._prev_flags: Optional[np.ndarray] = None
        self._packets = None
        self._key = jax.random.PRNGKey(seed)
        self._tables = build_light_tables(scene, punctual)
        self._trace_fn, self._vis_fn = make_trace_backend(
            scene, settings, backend)

    # ---- input dispatch (accumulation resets like engine.cpp:2070) ----

    def _dirty(self):
        self.frame = 0
        self._accum = None
        self._packets = None

    def key(self, ch: str, dt: float = 0.1) -> None:
        """One hotkey press (engine.cpp key_callback analog)."""
        moves = dict(w=(1, 0, 0), s=(-1, 0, 0), a=(0, -1, 0), d=(0, 1, 0))
        if ch in moves and self.camera_mode == "free":
            f, st, asc = moves[ch]
            self.free_cam.move(dt, forward=f, strafe=st, ascend=asc)
            self._dirty()
        elif ch == "c":
            self.camera_mode = ("toroidal" if self.camera_mode == "free"
                                else "free")
            self._dirty()
        elif ch == "r":
            self.free_cam.reset()
            self._dirty()
        elif ch == "p":
            self.render_mode = ("pointcloud"
                                if self.render_mode == "camera"
                                else "camera")
            self._dirty()
        elif ch in _METHOD_KEYS:
            self.sampling = _METHOD_KEYS[ch]
        elif ch in "zxmnuj":
            t = self.torus
            if ch == "z":
                t = dataclasses.replace(
                    t, major_radius=t.major_radius + 0.5)
            elif ch == "x":
                t = dataclasses.replace(
                    t, major_radius=max(0.5, t.major_radius - 0.5))
            elif ch == "m":
                t = dataclasses.replace(
                    t, minor_radius=t.minor_radius + 0.1)
            elif ch == "n":
                t = dataclasses.replace(
                    t, minor_radius=max(0.05, t.minor_radius - 0.1))
            elif ch == "u":
                t = dataclasses.replace(t, height=t.height + 0.25)
            elif ch == "j":
                t = dataclasses.replace(t, height=t.height - 0.25)
            self.torus = t                 # live resize, torus.h:125-159
            self._dirty()

    def look(self, dx: float, dy: float) -> None:
        """Cursor deltas: free camera yaw/pitch, or toroidal alpha/beta
        (camera.cpp:98-188)."""
        if self.camera_mode == "free":
            self.free_cam.rotate(dx, dy)
        else:
            self.alpha_deg = float(np.mod(self.alpha_deg + 0.2 * dx, 360.0))
            self.beta_deg = float(np.clip(self.beta_deg + 0.2 * dy,
                                          -89.0, 89.0))
        self._dirty()

    # ---- rendering ----

    @property
    def camera(self) -> Camera:
        if self.camera_mode == "free":
            return self.free_cam.camera(self.width, self.height)
        c2w = toroidal_c2w(self.alpha_deg, self.beta_deg,
                           self.torus.major_radius, self.torus.height)
        return Camera(c2w=c2w, fov_y_deg=self.free_cam.fov_y_deg,
                      width=self.width, height=self.height)

    def step(self) -> np.ndarray:
        """Render/accumulate one sample; returns the (H, W, 3) image."""
        if self.render_mode == "pointcloud":
            return self._step_pointcloud()
        from pathtracer_gaussiansplatting_tpu.ops.binning import (
            BinningConfig,
        )
        from pathtracer_gaussiansplatting_tpu.render.pathtrace import (
            accumulate, pathtrace_camera,
        )
        from pathtracer_gaussiansplatting_tpu.render.tiled import (
            prepare_tiles,
        )

        cam = self.camera
        cfg = BinningConfig(alpha_min=self.settings.alpha_min)
        if self._packets is None:
            self._packets = prepare_tiles(self.scene, cam, self.settings,
                                          cfg)
        cur = pathtrace_camera(
            self.scene, cam, self.settings,
            jax.random.fold_in(self._key, self.frame),
            packets=self._packets, tables=self._tables,
            punctual=self.punctual, trace_fn=self._trace_fn,
            visibility_fn=self._vis_fn, config=cfg)
        prev = (jnp.zeros_like(cur) if self._accum is None
                else jnp.asarray(self._accum))
        acc = accumulate(prev, cur, self.frame)
        self._accum = np.asarray(acc)
        self.frame += 1
        return self._accum.reshape(self.height, self.width, 3)

    def _step_pointcloud(self) -> np.ndarray:
        """Point-cloud overlay mode (P hotkey): torus-sensor hits splatted
        as 2-px points (render/points.py, pointcloud.vert/frag)."""
        from pathtracer_gaussiansplatting_tpu.core.torus import torus_rays
        from pathtracer_gaussiansplatting_tpu.render.points import (
            render_point_cloud,
        )
        from pathtracer_gaussiansplatting_tpu.sampling.strategies import (
            generate_samples,
        )

        n = min(self.torus.num_rays, 65536)
        # Live importance feedback (sampling.cpp:366-434 via the hotkey
        # path engine.cpp:766-802): IMP_COL / IMP_HIT re-sample from the
        # PREVIOUS pass's hit buffer — the reference's only GPU->CPU->GPU
        # loop. The first pass has no data yet and falls back to RANDOM
        # (the reference's buffer is likewise empty until one pass ran).
        uv = generate_samples(self.sampling, n,
                              prev_uv=self._prev_uv,
                              prev_colors=self._prev_colors,
                              prev_flags=self._prev_flags)
        rays = torus_rays(jnp.asarray(uv), self.torus)
        inter = self._trace_fn(self.scene, rays, self.settings)
        hit = inter["alpha_acc"] > self.settings.hit_opacity_threshold
        self._prev_uv = np.asarray(uv)
        self._prev_colors = np.asarray(inter["albedo"])
        self._prev_flags = np.asarray(hit).astype(np.float32)
        img = render_point_cloud(
            inter["position"], inter["albedo"], hit, self.camera)
        self.frame += 1
        return np.asarray(img)
