"""Shared test helpers: random scenes and finite-difference grad checks."""
import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_gaussiansplatting_tpu.core.types import GaussianScene, make_scene


def random_scene(n, rng, sh_degree=0, emissive_frac=0.0, spread=1.0,
                 scale_range=(-2.5, -1.0)):
    """A random cloud of anisotropic Gaussians in [-spread, spread]^3."""
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    log_scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity_logits = rng.uniform(-1.0, 2.0, (n,)).astype(np.float32)
    k = (sh_degree + 1) ** 2
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0] = rng.uniform(-1.0, 1.0, (n, 3))
    if k > 1:
        sh[:, 1:] = rng.normal(0, 0.1, (n, k - 1, 3))
    emission = np.zeros((n, 3), np.float32)
    if emissive_frac > 0:
        ne = max(1, int(n * emissive_frac))
        emission[:ne] = rng.uniform(1.0, 5.0, (ne, 3))
    return make_scene(
        means=means, log_scales=log_scales, quats=quats,
        opacity_logits=opacity_logits, sh_coeffs=sh, emission=emission,
        metallic=rng.uniform(0, 1, (n,)).astype(np.float32),
        roughness=rng.uniform(0.1, 1, (n,)).astype(np.float32),
    )


def fd_grad(f, x, eps=1e-3):
    """Central finite-difference gradient of scalar f at flat numpy array x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        gf[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g
