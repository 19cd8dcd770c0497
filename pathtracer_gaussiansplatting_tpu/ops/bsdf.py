"""Surface scattering model: Lambert + GGX specular with lobe selection.

Behavioral port of the reference's opaque-path BSDF machinery
(closesthit.rchit:60-99 samplers, :100-110 pdfs, :582-585 lobe selection,
:440-520 weights) re-expressed as batched, maskable jnp over ray batches:
  * prob_specular = clamp(mix(0.04, 1, metallic) boosted by (1-NdotV)^5, .05, .95)
  * specular: GGX NDF half-vector sampling, Smith-correlated visibility,
    Schlick Fresnel; diffuse: cosine hemisphere.
  * mixture pdf = p_spec*pdf_GGX + (1-p_spec)*pdf_Lambert (MIS-compatible).
Everything is branch-free: both lobes are evaluated and selected with
jnp.where, which keeps TPU lanes full (no warp divergence machinery needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_normalize

PI = jnp.pi


def orthonormal_basis(n):
    """Branch-free ONB around unit normal n (..., 3) -> (t, b)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                   -sign * n[..., 0]], -1)
    bt = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t, bt


def cosine_hemisphere(u, n):
    """Cosine-weighted direction about n; u: (..., 2) uniforms."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * PI * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    t, b = orthonormal_basis(n)
    return x[..., None] * t + y[..., None] * b + z[..., None] * n


def sample_ggx_half(u, n, roughness):
    """Sample a GGX half-vector about n (classic NDF sampling)."""
    a2 = jnp.maximum(roughness, 1e-3) ** 4  # alpha = rough^2; a2 = alpha^2
    cos2 = (1.0 - u[..., 0]) / (1.0 + (a2 - 1.0) * u[..., 0] + 1e-12)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos2, 0.0))
    phi = 2.0 * PI * u[..., 1]
    t, b = orthonormal_basis(n)
    return (sin_t * jnp.cos(phi))[..., None] * t \
        + (sin_t * jnp.sin(phi))[..., None] * b + cos_t[..., None] * n


def d_ggx(n_dot_h, roughness):
    a = jnp.maximum(roughness, 1e-3) ** 2
    a2 = a * a
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * denom * denom, 1e-8)


def v_smith_ggx_fast(n_dot_v, n_dot_l, roughness):
    a = jnp.maximum(roughness, 1e-3) ** 2
    v = n_dot_l * (n_dot_v * (1.0 - a) + a)
    l = n_dot_v * (n_dot_l * (1.0 - a) + a)
    return 0.5 / jnp.maximum(v + l, 1e-5)


def f_schlick(cos_t, f0):
    return f0 + (1.0 - f0) * jnp.power(jnp.clip(1.0 - cos_t, 0.0, 1.0), 5.0)


def pdf_ggx(n, v, l, roughness):
    h = v + l
    h = safe_normalize(h)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    return d_ggx(n_dot_h, roughness) * n_dot_h / (4.0 * v_dot_h + 1e-4)


def pdf_lambert(n, l):
    return jnp.maximum(jnp.sum(n * l, -1), 0.0) / PI


def specular_prob(n, v, metallic):
    """Lobe-selection probability (closesthit.rchit:582-585)."""
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    p = 0.04 + (1.0 - 0.04) * metallic
    p = p + (1.0 - p) * jnp.power(1.0 - n_dot_v, 5.0)
    return jnp.clip(p, 0.05, 0.95)


def f0_of(albedo, metallic):
    """Dielectric 0.04 -> metal albedo (closesthit.rchit metal-rough)."""
    return 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]


def eval_bsdf(n, v, l, albedo, metallic, roughness):
    """BRDF * NdotL for NEE (diffuse + specular; matches sampleLights path).

    Returns (..., 3).
    """
    n_dot_l = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    h = v + l
    h = safe_normalize(h)
    f0 = f0_of(albedo, metallic)
    ndf = d_ggx(jnp.maximum(jnp.sum(n * h, -1), 0.0), roughness)
    vis = v_smith_ggx_fast(n_dot_v, n_dot_l, roughness)
    fr = f_schlick(jnp.maximum(jnp.sum(h * v, -1), 0.0)[..., None], f0)
    specular = (ndf * vis)[..., None] * fr
    kd = 1.0 - fr
    diffuse = kd * albedo / PI
    return (diffuse + specular) * n_dot_l[..., None]


def mixture_pdf(n, v, l, metallic, roughness):
    p_spec = specular_prob(n, v, metallic)
    return (p_spec * pdf_ggx(n, v, l, roughness)
            + (1.0 - p_spec) * pdf_lambert(n, l))


def sample_bsdf(u_lobe, u_dir, n, v, albedo, metallic, roughness):
    """Sample the scatter direction, branch-free over the ray batch.

    Args:
      u_lobe: (...,) uniform for lobe selection.
      u_dir:  (..., 2) uniforms for the direction.
      n, v:   (..., 3) shading normal / view (toward camera).
    Returns dict: direction l, throughput weight (..., 3) (includes 1/pdf and
      1/p_lobe, mirroring payload.weight of the reference), pdf (mixture),
      valid (l in upper hemisphere).
    """
    p_spec = specular_prob(n, v, metallic)
    take_spec = u_lobe < p_spec

    # Specular branch.
    h = sample_ggx_half(u_dir, n, roughness)
    l_spec = 2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v
    n_dot_l_s = jnp.maximum(jnp.sum(n * l_spec, -1), 0.0)
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    f0 = f0_of(albedo, metallic)
    fr = f_schlick(v_dot_h[..., None], f0)
    vis = v_smith_ggx_fast(n_dot_v, n_dot_l_s, roughness)
    # weight = F * Vis * 4 * NdotL * VdotH / NdotH (GGX estimator,
    # closesthit.rchit:600-603), then / p_spec for the lobe choice.
    w_spec = fr * (vis * 4.0 * n_dot_l_s * v_dot_h
                   / jnp.maximum(n_dot_h, 1e-4))[..., None]
    w_spec = w_spec / jnp.maximum(p_spec, 1e-3)[..., None]

    # Diffuse branch: weight = albedo / (1 - p_spec) (cosine pdf cancels).
    l_diff = cosine_hemisphere(u_dir, n)
    w_diff = albedo / jnp.maximum(1.0 - p_spec, 1e-3)[..., None]

    l = jnp.where(take_spec[..., None], l_spec, l_diff)
    w = jnp.where(take_spec[..., None], w_spec, w_diff)
    n_dot_l = jnp.sum(n * l, -1)
    valid = n_dot_l > 1e-4
    w = jnp.where(valid[..., None], w, 0.0)
    pdf = mixture_pdf(n, v, l, metallic, roughness)
    pdf = jnp.where(valid, pdf, 0.0)
    return dict(direction=l, weight=w, pdf=pdf, valid=valid)
