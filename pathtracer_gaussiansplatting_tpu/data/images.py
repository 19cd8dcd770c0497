"""Image output: sRGB encoding, box downscale, JPG/PNG writers.

Replaces the reference's stb-based saveJPG/savePNG (GeneralHeaders.cpp:162-192)
and the capture-time 2x box downscale loop (engine.cpp:2737-2754). The render
path produces LINEAR radiance; the swapchain blit in the reference performed
the sRGB encode, so we apply the proper sRGB transfer here before writing.
"""
from __future__ import annotations

import os

import numpy as np


def linear_to_srgb(x):
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(x, 1.0 / 2.4) - 0.055)


def srgb_to_linear(x):
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92,
                    np.power((x + 0.055) / 1.055, 2.4))


def box_downscale(img, divisor: int):
    """Repeated 2x box filtering until the total divisor is reached
    (engine.cpp:2737-2754 halves repeatedly while divisor > 1)."""
    img = np.asarray(img)
    d = int(divisor)
    while d > 1:
        h, w = img.shape[:2]
        h2, w2 = h // 2, w // 2
        img = img[: h2 * 2, : w2 * 2]
        img = img.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))
        d //= 2
    return img


def to_uint8_srgb(linear_img):
    return (linear_to_srgb(linear_img) * 255.0 + 0.5).astype(np.uint8)


def save_jpg(path, linear_img, quality: int = 92):
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(to_uint8_srgb(linear_img)).save(path, quality=quality)


def save_png(path, linear_img):
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(to_uint8_srgb(linear_img)).save(path)
