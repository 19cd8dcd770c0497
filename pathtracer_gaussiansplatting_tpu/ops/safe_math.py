"""Autodiff-safe vector helpers.

``jnp.linalg.norm`` has a NaN gradient at 0; with masked full-width TPU math
(dead lanes carry zeros), those NaNs would contaminate every backward pass.
These variants are smooth at 0.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x, axis=-1, keepdims=False, eps=1e-12):
    """sqrt(sum(x^2) + eps): finite value AND gradient at x = 0."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def safe_normalize(x, axis=-1, eps=1e-12):
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)


def safe_sqrt(x, eps=1e-12):
    """sqrt clamped away from 0 — d(sqrt)/dx at 0 is inf, and inf * 0 from a
    zero chain-rule factor is NaN (the masked-lane trap)."""
    return jnp.sqrt(jnp.maximum(x, eps))
