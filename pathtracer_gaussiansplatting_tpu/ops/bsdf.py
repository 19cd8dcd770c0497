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
from pathtracer_gaussiansplatting_tpu.ops.safe_math import (
    safe_normalize, safe_sqrt,
)

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
    cos_t = safe_sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = safe_sqrt(1.0 - cos2)
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

    The diffuse lobe uses albedo * (1 - metallic) — the reference attenuates
    the diffuse albedo for metals up front (closesthit.rchit:423).
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
    diffuse = kd * albedo * (1.0 - metallic[..., None]) / PI
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
    # Detached-sampling estimator: the selection probability is
    # stop_gradient'ed so weights stay f/p with p constant — pathwise
    # gradients of the numerator (Fresnel, albedo, ...) stay unbiased and
    # don't pick up spurious d(1/p) terms.
    p_spec = jax.lax.stop_gradient(p_spec)
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

    # Diffuse branch: weight = albedo*(1-metallic) / (1 - p_spec) (cosine pdf
    # cancels; metal diffuse attenuation per closesthit.rchit:423).
    l_diff = cosine_hemisphere(u_dir, n)
    w_diff = albedo * (1.0 - metallic[..., None]) \
        / jnp.maximum(1.0 - p_spec, 1e-3)[..., None]

    l = jnp.where(take_spec[..., None], l_spec, l_diff)
    w = jnp.where(take_spec[..., None], w_spec, w_diff)
    n_dot_l = jnp.sum(n * l, -1)
    valid = n_dot_l > 1e-4
    w = jnp.where(valid[..., None], w, 0.0)
    pdf = mixture_pdf(n, v, l, metallic, roughness)
    pdf = jnp.where(valid, pdf, 0.0)
    return dict(direction=l, weight=w, pdf=pdf, valid=valid)


def sample_clearcoated(u_cc, u_lobe, u_dir, n, v, albedo, metallic, roughness,
                       clearcoat, cc_roughness):
    """Scatter off the base BSDF under a clearcoat layer, branch-free.

    Behavioral port of closesthit.rchit:540-620:
      * F_cc_view = Schlick(NdotV, 0.04) * clearcoat; cc_prob = max-component.
      * With prob cc_prob: sample the clearcoat GGX lobe (white F0=0.04
        specular scaled by clearcoat); weight = F*Vis*4*NdotL*VdotH/NdotH
        / cc_prob; pdf = cc_prob*pdf_cc + (1-cc_prob)*pdf_base.
      * Else: base lobes attenuated by (1 - F_cc_view)/(1 - cc_prob)
        (energy passing through the coat), pdf scaled by (1-cc_prob).
    """
    n_dot_v = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    f_cc_view = f_schlick(n_dot_v, 0.04) * clearcoat       # (...,) grayscale
    # Selection probability is detached (see sample_bsdf) so clearcoat keeps
    # a pathwise gradient through f_cc / (1 - f_cc_view).
    cc_prob = jax.lax.stop_gradient(jnp.clip(f_cc_view, 0.0, 1.0))
    take_cc = (clearcoat > 0.0) & (u_cc < cc_prob)

    # Clearcoat lobe.
    ccr = jnp.maximum(cc_roughness, 1e-3)
    h_cc = sample_ggx_half(u_dir, n, ccr)
    l_cc = 2.0 * jnp.sum(v * h_cc, -1, keepdims=True) * h_cc - v
    n_dot_l = jnp.maximum(jnp.sum(n * l_cc, -1), 0.0)
    n_dot_h = jnp.maximum(jnp.sum(n * h_cc, -1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h_cc, -1), 0.0)
    f_cc = f_schlick(v_dot_h, 0.04) * clearcoat
    vis = v_smith_ggx_fast(n_dot_v, n_dot_l, ccr)
    w_cc = f_cc * vis * 4.0 * n_dot_l * v_dot_h / jnp.maximum(n_dot_h, 1e-4)
    w_cc = (w_cc / jnp.maximum(cc_prob, 1e-3))[..., None] * jnp.ones(3)
    pdf_cc = pdf_ggx(n, v, l_cc, ccr)
    pdf_cc_total = (cc_prob * pdf_cc
                    + (1.0 - cc_prob) * mixture_pdf(n, v, l_cc, metallic,
                                                    roughness))
    valid_cc = n_dot_l > 1e-4

    # Base path through the coat.
    base = sample_bsdf(u_lobe, u_dir, n, v, albedo, metallic, roughness)
    atten = ((1.0 - f_cc_view)
             / jnp.maximum(1.0 - cc_prob, 1e-3))[..., None]
    w_base = base["weight"] * atten
    pdf_base = base["pdf"] * (1.0 - cc_prob)

    take = take_cc[..., None]
    return dict(
        direction=jnp.where(take, l_cc, base["direction"]),
        weight=jnp.where(take, w_cc, w_base),
        pdf=jnp.where(take_cc, pdf_cc_total, pdf_base),
        valid=jnp.where(take_cc, valid_cc, base["valid"]),
    )


def refract(d, n, eta):
    """Refract incident direction d (pointing into the surface) about unit
    normal n with relative IOR eta. Returns (dir, tir) — on total internal
    reflection dir is the zero vector and tir is True (GLSL refract
    semantics, closesthit.rchit:518-520)."""
    cos_i = -jnp.sum(d * n, -1, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t[..., 0] > 1.0
    cos_t = safe_sqrt(1.0 - sin2_t)
    out = eta * d + (eta * cos_i - cos_t) * n
    return jnp.where(tir[..., None], 0.0, out), tir


def sample_glass(u_reflect, n, v, albedo, metallic, ior):
    """Fresnel-weighted reflect-vs-refract (closesthit.rchit:503-531).

    The surfel normal is viewer-faced, so rays always 'enter'; eta = 1/ior.
    Reflection weight is 1 (prob = max-component Fresnel, the reference's
    estimator); refraction is tinted by albedo; TIR falls back to reflection.
    Returns dict(direction, weight, offset_sign) — pdf is 0 (delta lobes,
    payload.last_bsdf_pdf = 0.0 at :530) and MIS at the next emitter hit is
    disabled by the caller.
    """
    f0 = f0_of(albedo, metallic)
    cos_i = jnp.abs(jnp.sum(n * v, -1))
    fr = f_schlick(cos_i[..., None], f0)
    prob_reflect = jax.lax.stop_gradient(jnp.max(fr, axis=-1))
    take_reflect = u_reflect < prob_reflect

    l_refl = 2.0 * jnp.sum(n * v, -1, keepdims=True) * n - v
    l_refr, tir = refract(-v, n, 1.0 / ior)
    take_reflect = take_reflect | tir

    take = take_reflect[..., None]
    direction = jnp.where(take, l_refl, l_refr)
    weight = jnp.where(take, jnp.ones_like(albedo), albedo)
    # Reflected rays restart just above the surface (+n), refracted just
    # below (-n) (closesthit.rchit:507,512).
    offset_sign = jnp.where(take_reflect, 1.0, -1.0)
    return dict(direction=direction, weight=weight, offset_sign=offset_sign)
