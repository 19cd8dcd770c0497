"""Image quality metrics: PSNR / SSIM / MSE (pure jnp, differentiable).

The reference validates its output by training a 3DGS model and reporting
SSIM/PSNR/LPIPS (README.md:55-63). PSNR and SSIM are provided here for
in-framework evaluation of fits and renders; LPIPS requires a pretrained
VGG/AlexNet and is intentionally out of scope (no network weights are
bundled) — export images and use the standard `lpips` package downstream.
"""
from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio in dB over [0, max_val] images."""
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(m, 1e-12))


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def ssim(a, b, max_val: float = 1.0, kernel_size: int = 11,
         sigma: float = 1.5):
    """Mean SSIM over (H, W, C) images (Wang et al. 2004, Gaussian window —
    the definition used by 3DGS evaluation)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    k = _gaussian_kernel1d(kernel_size, sigma)

    def blur(img):
        # separable Gaussian: gather-windows + einsum over H, then W
        pad = kernel_size // 2
        h, w = img.shape[:2]
        xh = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
        idx = jnp.arange(h)[:, None] + jnp.arange(kernel_size)[None, :]
        xh = jnp.einsum("k,hkwc->hwc", k, xh[idx])
        xw = jnp.pad(xh, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        idxw = jnp.arange(w)[:, None] + jnp.arange(kernel_size)[None, :]
        return jnp.einsum("k,hwkc->hwc", k, xw[:, idxw])

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = blur(a)
    mu_b = blur(b)
    var_a = blur(a * a) - mu_a**2
    var_b = blur(b * b) - mu_b**2
    cov = blur(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
