"""Counter-based RNG for rendering: deterministic, order-independent, TPU-cheap.

The reference uses a PCG hash seeded ``seed = pixel_index + frame * 719393``
(raygen_camera.rgen:27, raytracing.glsl:141-146) plus a tiled blue-noise
texture shifted by an R2 low-discrepancy sequence per frame
(raygen_camera.rgen:11-25). Here we use JAX's counter-based threefry keys with
the same (pixel, frame, dimension) indexing discipline: every random number is
a pure function of (base_seed, frame, ray_index, dimension) — fully
reproducible under any sharding or execution order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Frame-mixing constant kept from the reference for familiarity (not load-
# bearing; threefry does the real mixing). raygen_camera.rgen:27.
FRAME_MIX = 719393

# R2 low-discrepancy sequence constants (raygen_camera.rgen:11-15).
R2_A1 = 0.75487766624669276
R2_A2 = 0.56984029099805327


def r2_sequence(i):
    """Fractional part of the 2D R2 quasirandom sequence at index i."""
    i = jnp.asarray(i, jnp.float32)
    return jnp.stack([jnp.mod(i * R2_A1, 1.0), jnp.mod(i * R2_A2, 1.0)], -1)


def frame_key(base_key, frame):
    """Key for one accumulation frame."""
    return jax.random.fold_in(base_key, frame * FRAME_MIX % (2**31 - 1))


def dim_key(key, dimension: int):
    """Key for one random 'dimension' of the estimator (jitter, lobe, NEE...).

    Plays the role of the per-dimension golden-ratio scrambling of blue noise
    in the reference (closesthit.rchit:16-19 getBlueNoise(dim))."""
    return jax.random.fold_in(key, dimension)


def ray_uniform(key, num_rays, dimension: int, num: int = 1):
    """(num_rays, num) uniforms in [0,1), one row per ray, for one dimension."""
    k = dim_key(key, dimension)
    return jax.random.uniform(k, (num_rays, num), jnp.float32)


def subpixel_jitter(key, height, width, frame):
    """(H, W, 2) subpixel jitter for frame ``frame``.

    Stratified-in-time: pixel-uniform random jitter shifted by the per-frame
    R2 offset, echoing the reference's blue-noise + R2 toroidal shift."""
    k = dim_key(frame_key(key, frame), 0)
    u = jax.random.uniform(k, (height, width, 2), jnp.float32)
    return jnp.mod(u + r2_sequence(frame)[None, None, :], 1.0)
