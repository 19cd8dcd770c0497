"""Morton (Z-order) codes, 2D and 3D — numpy and jnp implementations.

Port of the reference's ray-coherence sort (sampling.cpp:335-361:
15-bit quantized 2D Morton keys over the torus (u,v) domain). The 3D variant
serves spatial binning of Gaussian clouds. On TPU, Morton-ordering rays/
Gaussians improves gather locality of the binned renderer; the sort itself is
XLA sort or the native C++ helper (csrc/).
"""
from __future__ import annotations

import numpy as np

try:  # jnp variants are optional at import time (numpy path is canonical)
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def _expand_bits_2d(x, xp):
    x = xp.asarray(x, dtype=xp.uint32)
    x = (x | (x << 8)) & xp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & xp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & xp.uint32(0x33333333)
    x = (x | (x << 1)) & xp.uint32(0x55555555)
    return x


def morton2d(u, v, xp=np):
    """30-bit Morton code of (u, v) in [0,1]^2, 15 bits/axis
    (sampling.cpp:morton2D)."""
    x = xp.clip(xp.asarray(u) * 32768.0, 0.0, 32767.0).astype(xp.uint32)
    y = xp.clip(xp.asarray(v) * 32768.0, 0.0, 32767.0).astype(xp.uint32)
    return _expand_bits_2d(x, xp) | (_expand_bits_2d(y, xp) << 1)


def _expand_bits_3d(x, xp):
    x = xp.asarray(x, dtype=xp.uint32)
    x = (x | (x << 16)) & xp.uint32(0x030000FF)
    x = (x | (x << 8)) & xp.uint32(0x0300F00F)
    x = (x | (x << 4)) & xp.uint32(0x030C30C3)
    x = (x | (x << 2)) & xp.uint32(0x09249249)
    return x


def morton3d(x, y, z, xp=np):
    """30-bit Morton code of (x, y, z) in [0,1]^3, 10 bits/axis."""
    xi = xp.clip(xp.asarray(x) * 1024.0, 0.0, 1023.0).astype(xp.uint32)
    yi = xp.clip(xp.asarray(y) * 1024.0, 0.0, 1023.0).astype(xp.uint32)
    zi = xp.clip(xp.asarray(z) * 1024.0, 0.0, 1023.0).astype(xp.uint32)
    return (_expand_bits_3d(xi, xp) | (_expand_bits_3d(yi, xp) << 1)
            | (_expand_bits_3d(zi, xp) << 2))


def morton_sort_2d(uv):
    """Sort (N, 2) uv samples by Morton code (sampling.cpp:sortSamples)."""
    uv = np.asarray(uv)
    codes = morton2d(uv[:, 0], uv[:, 1])
    return uv[np.argsort(codes, kind="stable")]


def morton_order_points(points, lo=None, hi=None):
    """Permutation ordering 3D points by Morton code within their AABB."""
    points = np.asarray(points)
    lo = points.min(0) if lo is None else np.asarray(lo)
    hi = points.max(0) if hi is None else np.asarray(hi)
    ext = np.maximum(hi - lo, 1e-12)
    q = (points - lo) / ext
    codes = morton3d(q[:, 0], q[:, 1], q[:, 2])
    return np.argsort(codes, kind="stable")
