"""Cameras: perspective ray generation, look-at, and toroidal poses.

Behavioral parity with the reference:
  * Perspective rays are generated exactly like raygen_camera.rgen:28-37
    (pixel center + optional subpixel jitter -> NDC -> unprojected direction),
    but computed directly from the camera-to-world frame instead of inverting
    view/projection matrices per ray.
  * The toroidal camera mirrors Camera::updateToroidalAngles
    (camera.cpp:195-228): position on the torus major ring at height h, base
    forward pointing at the ring axis, then the whole frame pitched by beta
    about the local right axis so the up vector rolls smoothly through
    beta > 90 deg.
  * Exported camera-to-world matrices use the OpenGL/NeRF convention
    (camera looks along -Z), matching the reference's transforms.json dump of
    inverse(lookAt) (engine.cpp:2816-2847, c2w at engine.cpp:2761).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_gaussiansplatting_tpu.core.types import Rays


@dataclasses.dataclass(frozen=True)
class Camera:  # registered as a pytree below (c2w traced; fov/size static)
    """Pinhole camera. ``c2w`` is 4x4 camera-to-world, OpenGL convention.

    Columns of c2w[:3, :3] are (right, up, back); the camera looks along
    -c2w[:3, 2]; c2w[:3, 3] is the eye position. ``fov_y_deg`` is the full
    vertical field of view in degrees (reference default 45,
    GeneralHeaders.h:418-446).
    """

    c2w: jnp.ndarray
    fov_y_deg: float
    width: int
    height: int

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def fov_x_rad(self) -> float:
        # Matches saveTransformsJson: fov_x = 2*atan(tan(fov_y/2)*aspect)
        fy = np.radians(self.fov_y_deg)
        return float(2.0 * np.arctan(np.tan(fy / 2.0) * self.aspect))

    @property
    def position(self):
        return self.c2w[:3, 3]


jax.tree_util.register_pytree_node(
    Camera,
    lambda c: ((c.c2w,), (c.fov_y_deg, c.width, c.height)),
    lambda aux, ch: Camera(c2w=ch[0], fov_y_deg=aux[0], width=aux[1],
                           height=aux[2]),
)


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """Camera-to-world matrix (OpenGL convention) looking from eye at target."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-8)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    true_up = jnp.cross(right, fwd)
    rot = jnp.stack([right, true_up, -fwd], axis=-1)  # columns
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, :3].set(rot)
    c2w = c2w.at[:3, 3].set(eye)
    return c2w


def _rotate_about_axis(v, axis, angle_rad):
    """Rodrigues rotation of v about unit axis."""
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-8)
    c = jnp.cos(angle_rad)
    s = jnp.sin(angle_rad)
    return (v * c + jnp.cross(axis, v) * s
            + axis * jnp.dot(axis, v) * (1.0 - c))


def toroidal_c2w(alpha_deg, beta_deg, major_radius, height):
    """Camera pose on the torus centerline (camera.cpp:195-228).

    alpha: angle around the major ring; beta: pitch about the local right
    (ring tangent) axis. The up vector is rotated with the frame so there is
    no snap at beta > 90 degrees.
    """
    a = jnp.radians(jnp.mod(jnp.asarray(alpha_deg, jnp.float32), 360.0))
    b = jnp.radians(jnp.mod(jnp.asarray(beta_deg, jnp.float32), 360.0))
    pos = jnp.array([jnp.cos(a), 0.0, jnp.sin(a)]) * major_radius
    pos = pos + jnp.array([0.0, height, 0.0])
    base_forward = jnp.array([-jnp.cos(a), 0.0, -jnp.sin(a)])
    base_up = jnp.array([0.0, 1.0, 0.0])
    right = jnp.cross(base_forward, base_up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    fwd = _rotate_about_axis(base_forward, right, b)
    up = _rotate_about_axis(base_up, right, b)
    rot = jnp.stack([right, up, -fwd], axis=-1)
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, :3].set(rot)
    c2w = c2w.at[:3, 3].set(pos)
    return c2w.astype(jnp.float32)


def generate_rays(camera: Camera, jitter=None) -> Rays:
    """Generate one ray per pixel, row-major flattened (H*W rays).

    Pixel centers at +0.5 unless a per-pixel ``jitter`` (H, W, 2) in [0, 1)
    is given (subpixel antialiasing, reference raygen_camera.rgen:25-29).
    Row 0 is the top of the image.
    """
    h, w = camera.height, camera.width
    fy = jnp.radians(jnp.asarray(camera.fov_y_deg, jnp.float32))
    tan_y = jnp.tan(fy / 2.0)
    tan_x = tan_y * (w / h)

    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = jnp.arange(h, dtype=jnp.float32)[:, None]
    if jitter is None:
        jx = jy = 0.5
    else:
        jx = jitter[..., 0]
        jy = jitter[..., 1]
    # NDC in [-1, 1]; v grows downward in image space.
    u = ((px + jx) / w) * 2.0 - 1.0
    v = ((py + jy) / h) * 2.0 - 1.0
    u = jnp.broadcast_to(u, (h, w))
    v = jnp.broadcast_to(v, (h, w))

    right = camera.c2w[:3, 0]
    up = camera.c2w[:3, 1]
    fwd = -camera.c2w[:3, 2]
    dirs = (fwd[None, None, :]
            + u[..., None] * tan_x * right[None, None, :]
            - v[..., None] * tan_y * up[None, None, :])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs.shape)
    return Rays(origins=origins.reshape(-1, 3), directions=dirs.reshape(-1, 3))


def orthographic_rays(center, direction, up, extent, width, height) -> Rays:
    """Orthographic ray grid (for the tiny CPU golden configs in BASELINE.json).

    Rays start on a plane through ``center`` spanned by (right, up), all
    pointing along ``direction``. ``extent`` is the half-width of the plane.
    """
    direction = jnp.asarray(direction, jnp.float32)
    direction = direction / jnp.linalg.norm(direction)
    up = jnp.asarray(up, jnp.float32)
    right = jnp.cross(direction, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-8)
    true_up = jnp.cross(right, direction)
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, v)
    origins = (jnp.asarray(center, jnp.float32)[None, None, :]
               + uu[..., None] * extent * right
               - vv[..., None] * extent * true_up)
    dirs = jnp.broadcast_to(direction, origins.shape)
    return Rays(origins=origins.reshape(-1, 3), directions=dirs.reshape(-1, 3))


@dataclasses.dataclass
class FreeCamera:
    """Free-fly camera state (reference Camera::freeCameraUpdate,
    camera.cpp:31-96): yaw/pitch orientation driven by cursor deltas, local
    WASD+QE translation, speed / mouse-sensitivity / fov modifiers, reset.

    This is the headless analog of the reference's interactive mode: callers
    (scripts, a viewer loop) feed it input deltas and read out a ``Camera``.
    Host-side numpy state — it is control logic, never traced.
    """

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, 3.0], np.float32))
    yaw_deg: float = -90.0          # looking down -Z, reference default
    pitch_deg: float = 0.0
    fov_y_deg: float = 45.0         # GeneralHeaders.h:418-446 default
    speed: float = 2.5              # units/s
    sensitivity: float = 0.1        # degrees per cursor count

    def __post_init__(self):
        self._home = (self.position.copy(), self.yaw_deg, self.pitch_deg,
                      self.fov_y_deg)

    @property
    def forward(self) -> np.ndarray:
        cy, sy = np.cos(np.radians(self.yaw_deg)), np.sin(
            np.radians(self.yaw_deg))
        cp, sp = np.cos(np.radians(self.pitch_deg)), np.sin(
            np.radians(self.pitch_deg))
        f = np.array([cy * cp, sp, sy * cp], np.float32)
        return f / np.linalg.norm(f)

    def rotate(self, dx_counts: float, dy_counts: float) -> None:
        """Cursor-delta look: yaw += dx, pitch += dy, pitch clamped to
        +/-89 deg (camera.cpp free-mode pitch clamp)."""
        self.yaw_deg = float(np.mod(self.yaw_deg + dx_counts
                                    * self.sensitivity, 360.0))
        self.pitch_deg = float(np.clip(self.pitch_deg + dy_counts
                                       * self.sensitivity, -89.0, 89.0))

    def move(self, dt: float, forward: float = 0.0, strafe: float = 0.0,
             ascend: float = 0.0) -> None:
        """WASD+QE translation in the local frame; inputs in [-1, 1]."""
        f = self.forward
        r = np.cross(f, np.array([0.0, 1.0, 0.0], np.float32))
        r /= max(np.linalg.norm(r), 1e-8)
        step = self.speed * dt
        self.position = (self.position + step
                         * (forward * f + strafe * r
                            + ascend * np.array([0.0, 1.0, 0.0], np.float32))
                         ).astype(np.float32)

    def adjust_speed(self, factor: float) -> None:
        self.speed = float(np.clip(self.speed * factor, 0.01, 100.0))

    def adjust_fov(self, delta_deg: float) -> None:
        self.fov_y_deg = float(np.clip(self.fov_y_deg + delta_deg,
                                       10.0, 120.0))

    def reset(self) -> None:
        """Camera::reset (camera.cpp): back to the construction pose."""
        pos, yaw, pitch, fov = self._home
        self.position = pos.copy()
        self.yaw_deg, self.pitch_deg, self.fov_y_deg = yaw, pitch, fov

    def camera(self, width: int, height: int) -> Camera:
        eye = jnp.asarray(self.position)
        return Camera(c2w=look_at(eye, eye + jnp.asarray(self.forward)),
                      fov_y_deg=self.fov_y_deg, width=width, height=height)


def view_matrix(camera: Camera):
    """World-to-camera matrix (the reference's lookAt view matrix)."""
    r = camera.c2w[:3, :3]
    t = camera.c2w[:3, 3]
    w2c = jnp.eye(4, dtype=jnp.float32)
    w2c = w2c.at[:3, :3].set(r.T)
    w2c = w2c.at[:3, 3].set(-r.T @ t)
    return w2c
