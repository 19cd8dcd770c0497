"""Quaternion utilities (pure jnp, batched, differentiable).

Replaces the reference's glm rotation handling (e.g. gameobject.cpp:11-47
node transforms, engine.cpp:1272-1292 JSON rotations) with batched,
autodiff-friendly primitives.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q, eps: float = 1e-8):
    """Normalize quaternions, (..., 4) (w, x, y, z)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q):
    """Convert unit quaternions (..., 4) (w,x,y,z) to rotation matrices (..., 3, 3).

    Columns are the rotated basis vectors: R @ v rotates v from the Gaussian's
    canonical frame to world space.
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_cols(q):
    """Rotation-matrix entries of (N, 4) quaternions as nine (N,) columns.

    Structure-of-arrays form of :func:`quat_to_rotmat` for TPU hot paths:
    every output is an (N,) column so the lane dimension stays N (the
    (N, 3, 3) matrix form keeps the 3-wide geometry axes minor — 3/128
    lane occupancy — and measured ~5x slower at 1M Gaussians).
    Returns (r00, r01, r02, r10, r11, r12, r20, r21, r22); columns of R are
    the rotated basis vectors (same convention as quat_to_rotmat).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def rotmat_to_quat(m):
    """Inverse of quat_to_rotmat for a single (..., 3, 3) matrix (w,x,y,z).

    Branch-free Shepperd-style construction, safe under jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    return normalize(jnp.stack([qw, qx, qy, qz], axis=-1))
