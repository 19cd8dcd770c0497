"""Light sampling: emissive-Gaussian flux CDF, punctual lights, MIS helpers.

Behavioral port of the reference's light machinery onto Gaussian scenes:
  * Flux CDF over emitters (engine.cpp:1766-1826): per-emitter flux =
    ||emission|| * surfel area * opacity; CDF normalized, last entry pinned
    to 1. Selection is inverse-transform via searchsorted (the batched analog
    of the shader's binary search, closesthit.rchit:262-267).
  * Punctual flux: directional intensity*400, point/spot intensity*4pi
    (engine.cpp:1798-1804); p_emissive = clamp(emissive/total, 0.1, 0.9)
    (engine.cpp:1822-1826).
  * NEE pdf (solid-angle): (strength / total_flux) * dist^2 / cos_light
    (closesthit.rchit:305) — consistent with flux = strength * area because
    the area cancels.
  * Punctual attenuation mirrors samplePunctualLights
    (closesthit.rchit:128-192) with one deliberate fix: the reference divides
    the range-windowed term by dist^2 twice (closesthit.rchit:155-157); we
    apply the glTF-spec attenuation window / dist^2 once. We also weight the
    CDF-selected light by 1/p_select instead of the reference's num_lights
    factor (closesthit.rchit:181), which is only unbiased for uniform
    selection.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from pathtracer_gaussiansplatting_tpu.core.types import (
    GaussianScene, PunctualLights,
)
from pathtracer_gaussiansplatting_tpu.ops.quaternions import quat_to_rotmat
from pathtracer_gaussiansplatting_tpu.ops.safe_math import safe_norm, safe_normalize

Array = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LightTables:
    """Precomputed sampling tables (pytree; rebuild when the scene moves)."""

    emissive_cdf: Array        # (N,) normalized inclusive CDF over Gaussians
    emissive_strength: Array   # (N,) ||emission|| per Gaussian
    emissive_flux: Array       # () scalar total emissive flux
    punctual_cdf: Array        # (L,) CDF over punctual lights ((0,) if none)
    punctual_prob: Array       # (L,) selection probability
    punctual_flux: Array       # () scalar
    p_emissive: Array          # () strategy mix, clamped [0.1, 0.9]

    @property
    def has_emissive(self):
        return self.emissive_flux > 0

    @property
    def has_punctual(self):
        return self.punctual_flux > 0


def surfel_area(scene: GaussianScene):
    """Area proxy of each Gaussian's emitting surfel: pi * s_a * s_b of the
    two largest axes (the disk spanned by the dominant principal axes)."""
    s = jnp.sort(jnp.exp(scene.log_scales), axis=-1)  # ascending
    return jnp.pi * s[:, 1] * s[:, 2]


def build_light_tables(scene: GaussianScene,
                       punctual: Optional[PunctualLights] = None) -> LightTables:
    strength = safe_norm(scene.emission, axis=-1)  # (N,)
    # Kill the safe_norm epsilon floor so non-emitters carry exactly 0 flux
    # (otherwise every scene looks emissive and p_emissive never hits 0/1).
    strength = jnp.where(strength > 1e-5, strength, 0.0)
    flux = strength * surfel_area(scene) * scene.opacities
    total_e = jnp.sum(flux)
    cdf_e = jnp.cumsum(flux) / jnp.maximum(total_e, 1e-12)
    cdf_e = jnp.where(total_e > 0, cdf_e, jnp.ones_like(cdf_e))

    if punctual is None or punctual.num_lights == 0:
        cdf_p = jnp.ones((1,), jnp.float32)
        prob_p = jnp.ones((1,), jnp.float32)
        total_p = jnp.zeros((), jnp.float32)
    else:
        is_dir = punctual.light_type == 1
        pflux = jnp.where(is_dir, punctual.intensity * 400.0,
                          punctual.intensity * 4.0 * jnp.pi)
        total_p = jnp.sum(pflux)
        prob_p = pflux / jnp.maximum(total_p, 1e-12)
        cdf_p = jnp.cumsum(prob_p)

    total = total_e + total_p
    p_em = jnp.where(
        (total_e > 0) & (total_p > 0),
        jnp.clip(total_e / jnp.maximum(total, 1e-12), 0.1, 0.9),
        jnp.where(total_e > 0, 1.0, 0.0),
    )
    return LightTables(
        emissive_cdf=cdf_e, emissive_strength=strength,
        emissive_flux=total_e, punctual_cdf=cdf_p, punctual_prob=prob_p,
        punctual_flux=total_p, p_emissive=p_em,
    )


def sample_emissive(u_select, u_disk, scene: GaussianScene,
                    tables: LightTables):
    """Sample a point on a flux-chosen emissive surfel per ray.

    Args:
      u_select: (R,) uniforms for CDF inversion.
      u_disk:   (R, 2) uniforms for the position on the surfel disk.

    Returns dict: position (R,3), normal (R,3) (surfel plane normal,
      un-oriented), emission (R,3), strength (R,), index (R,).
    """
    idx = jnp.searchsorted(tables.emissive_cdf, u_select, side="left")
    idx = jnp.clip(idx, 0, scene.num_gaussians - 1).astype(jnp.int32)
    rot = quat_to_rotmat(scene.quats[idx])            # (R,3,3)
    s = jnp.exp(scene.log_scales[idx])                # (R,3)
    order = jnp.argsort(s, axis=-1)                   # ascending
    ax_n = jnp.take_along_axis(rot, order[:, None, 0:1].repeat(3, 1), 2)[..., 0]
    ax_a = jnp.take_along_axis(rot, order[:, None, 1:2].repeat(3, 1), 2)[..., 0]
    ax_b = jnp.take_along_axis(rot, order[:, None, 2:3].repeat(3, 1), 2)[..., 0]
    s_sorted = jnp.take_along_axis(s, order, -1)
    r = jnp.sqrt(u_disk[:, 0])
    phi = 2.0 * jnp.pi * u_disk[:, 1]
    pos = (scene.means[idx]
           + (r * jnp.cos(phi) * s_sorted[:, 2])[:, None] * ax_b
           + (r * jnp.sin(phi) * s_sorted[:, 1])[:, None] * ax_a)
    return dict(position=pos, normal=ax_n, emission=scene.emission[idx],
                strength=tables.emissive_strength[idx], index=idx)


def pdf_nee_solid_angle(strength, total_flux, dist_sq, cos_light):
    """Solid-angle NEE pdf for an emitter hit/sample (closesthit.rchit:305)."""
    return jnp.where(
        total_flux > 0,
        (strength / jnp.maximum(total_flux, 1e-12))
        * dist_sq / jnp.maximum(cos_light, 1e-3),
        0.0,
    )


def sample_punctual(u_select, lights: PunctualLights, tables: LightTables,
                    shade_pos):
    """Pick a punctual light by CDF; compute direction/irradiance per ray.

    Returns dict: direction L (R,3) (toward the light), dist (R,),
      radiance Le (R,3) (already attenuated), inv_prob (R,) selection weight.
    """
    idx = jnp.searchsorted(tables.punctual_cdf, u_select, side="left")
    idx = jnp.clip(idx, 0, lights.num_lights - 1).astype(jnp.int32)
    ltype = lights.light_type[idx]
    lpos = lights.position[idx]
    ldir = lights.direction[idx]
    ldir = safe_normalize(ldir)

    to_l = lpos - shade_pos
    dist_sq = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-2)
    dist = jnp.sqrt(dist_sq)
    l_point = to_l / dist[:, None]

    is_dir = ltype == 1
    l = jnp.where(is_dir[:, None], -ldir, l_point)
    dist_out = jnp.where(is_dir, 1e4, dist)

    atten = jnp.where(is_dir, 1.0, 1.0 / dist_sq)
    # glTF range window (applied once — see module docstring).
    rng = lights.range[idx]
    window = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-6)) ** 4, 0.0, 1.0)
    atten = jnp.where((~is_dir) & (rng > 0), window / dist_sq, atten)
    # Spot cone falloff (closesthit.rchit:159-165).
    cos_dir = jnp.sum(-l * ldir, -1)
    scale = 1.0 / jnp.maximum(
        lights.inner_cone_cos[idx] - lights.outer_cone_cos[idx], 1e-3)
    spot = jnp.clip(cos_dir * scale - lights.outer_cone_cos[idx] * scale,
                    0.0, 1.0)
    atten = jnp.where(ltype == 2, atten * spot * spot, atten)

    le = lights.color[idx] * (lights.intensity[idx] * atten)[:, None]
    inv_prob = 1.0 / jnp.maximum(tables.punctual_prob[idx], 1e-6)
    return dict(direction=l, dist=dist_out, radiance=le, inv_prob=inv_prob)


def power2_mis(pdf_a, pdf_b):
    """Power-2 MIS heuristic (closesthit.rchit:242,305,464)."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-12)
