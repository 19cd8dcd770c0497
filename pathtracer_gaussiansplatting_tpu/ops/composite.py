"""Front-to-back alpha compositing along a ray (the core VJP of the system).

The reference composites implicitly: the closest-hit shader returns one
surface per traceRayEXT and alpha-tested transparency is resolved
stochastically in the any-hit shader (alpha.rahit:14-62). For Gaussian scenes
the ray instead crosses MANY semi-transparent particles, and radiance is the
order-dependent "over" sum

    C = sum_i T_i * alpha_i * c_i,     T_i = prod_{j<i} (1 - alpha_j),

over contributions sorted front-to-back. This module provides:

  * :func:`composite_weights` — w_i = T_i alpha_i and the final transmittance,
    with an **analytic custom VJP** (no O(K^2) graph, no cumprod-of-zeros
    instability; the suffix-sum backward used by 3DGS rasterizers).
  * :func:`composite` — weights applied to arbitrary per-contribution features.

Both broadcast over leading axes and operate along the last axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _exclusive_cumprod_one_minus(alphas):
    """T_i = prod_{j<i}(1 - alpha_j) via exclusive cumprod, last axis."""
    om = 1.0 - alphas
    cp = jnp.cumprod(om, axis=-1)
    ones = jnp.ones_like(cp[..., :1])
    return jnp.concatenate([ones, cp[..., :-1]], axis=-1), cp[..., -1]


@jax.custom_vjp
def composite_weights(alphas):
    """Compositing weights for sorted alphas.

    Args:
      alphas: (..., K) in [0, alpha_max], front-to-back order. Entries of 0
        are transparent (masked-out) contributions.

    Returns:
      weights: (..., K) with w_i = T_i * alpha_i.
      trans:   (...,) final transmittance prod(1 - alpha_i).
    """
    trans_in, trans_out = _exclusive_cumprod_one_minus(alphas)
    return trans_in * alphas, trans_out


def _cw_fwd(alphas):
    trans_in, trans_out = _exclusive_cumprod_one_minus(alphas)
    weights = trans_in * alphas
    return (weights, trans_out), (alphas, trans_in, weights, trans_out)


def _cw_bwd(res, cotangents):
    alphas, trans_in, weights, trans_out = res
    g_w, g_t = cotangents
    # dL/dalpha_k = g_k T_k - (sum_{i>k} g_i w_i + g_t T_out) / (1 - alpha_k)
    gw_w = g_w * weights
    suffix = jnp.flip(jnp.cumsum(jnp.flip(gw_w, -1), -1), -1) - gw_w
    denom = jnp.maximum(1.0 - alphas, 1e-6)
    d_alpha = g_w * trans_in - (suffix + g_t[..., None] * trans_out[..., None]) / denom
    return (d_alpha,)


composite_weights.defvjp(_cw_fwd, _cw_bwd)


def composite(alphas, feats):
    """Composite per-contribution features front-to-back.

    Args:
      alphas: (..., K) sorted alphas.
      feats:  (..., K, F) per-contribution features (color, depth, normal...).

    Returns:
      out:   (..., F) = sum_i w_i feats_i.
      accum: (...,) accumulated opacity (1 - final transmittance).
      trans: (...,) final transmittance.
    """
    weights, trans = composite_weights(alphas)
    out = jnp.einsum("...k,...kf->...f", weights, feats)
    return out, 1.0 - trans, trans


def transmittance(alphas):
    """prod(1 - alpha_i) along the last axis (shadow-ray visibility)."""
    return jnp.prod(1.0 - alphas, axis=-1)
