"""Core pytree types for the TPU-native Gaussian-splatting path tracer.

The reference engine's scene representation is triangle meshes with glTF PBR
materials (reference: Vulkan_Engine/gameobject.cpp:198-795,
Helpers/GeneralHeaders.h:57-609). Here the scene is a set of anisotropic 3D
Gaussians — the whole forward is differentiable w.r.t. every field of
:class:`GaussianScene`.

Design notes (TPU-first):
  * Everything is a flat struct-of-arrays pytree: static shapes, jit-friendly,
    shardable along the Gaussian axis with `jax.sharding`.
  * Covariance is parameterised as (log_scales, quaternion) exactly like 3DGS
    so gradients flow to scales and rotations separately.
  * Materials mirror the reference's PBR surface (metallic/roughness/emissive,
    GeneralHeaders.h Material) reduced to per-Gaussian scalars — view-dependent
    base color lives in SH coefficients.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

Array = Any


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    """A scene of N anisotropic 3D Gaussians (struct-of-arrays pytree).

    Attributes:
      means:          (N, 3) float32 — Gaussian centers (world space).
      log_scales:     (N, 3) float32 — log of per-axis standard deviations.
      quats:          (N, 4) float32 — rotations, (w, x, y, z); normalized on use.
      opacity_logits: (N,)   float32 — sigmoid gives peak opacity in (0, 1).
      sh_coeffs:      (N, K, 3) float32 — real-SH coefficients of view-dependent
                      base color (K = (deg+1)^2, 3DGS convention: DC term has
                      the 0.282095 factor folded out, color = SH·basis + 0.5).
      emission:       (N, 3) float32 — emitted radiance (linear RGB). Nonzero
                      entries make the Gaussian a light for NEE
                      (reference analog: emissive triangles, engine.cpp:1766-1826).
      metallic:       (N,)  float32 — lobe-selection weight (reference
                      closesthit.rchit prob_specular = mix(0.04, 1, metallic)).
      roughness:      (N,)  float32 — GGX roughness of the specular lobe.
      clearcoat:      (N,)  float32 — clearcoat layer strength (reference
                      KHR_materials_clearcoat, closesthit.rchit:540-577).
      clearcoat_roughness: (N,) float32 — GGX roughness of the clearcoat lobe.
      transmission:   (N,)  float32 — glass probability; rays scattering off
                      this Gaussian take the Fresnel reflect/refract path with
                      probability = transmission (closesthit.rchit:503-531).
    """

    means: Array
    log_scales: Array
    quats: Array
    opacity_logits: Array
    sh_coeffs: Array
    emission: Array
    metallic: Array
    roughness: Array
    clearcoat: Array
    clearcoat_roughness: Array
    transmission: Array

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        k = self.sh_coeffs.shape[1]
        return int(round(k**0.5)) - 1

    def astype(self, dtype) -> "GaussianScene":
        return jax.tree.map(lambda x: x.astype(dtype), self)

    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)

    @property
    def scales(self) -> Array:
        return jnp.exp(self.log_scales)

    @property
    def opacities(self) -> Array:
        return jax.nn.sigmoid(self.opacity_logits)


def make_scene(
    means,
    log_scales,
    quats,
    opacity_logits,
    sh_coeffs=None,
    emission=None,
    metallic=None,
    roughness=None,
    clearcoat=None,
    clearcoat_roughness=None,
    transmission=None,
    colors=None,
    sh_degree: int = 0,
) -> GaussianScene:
    """Build a GaussianScene, filling defaults for optional channels.

    ``colors`` (N, 3) in [0, 1] can be given instead of ``sh_coeffs``; it is
    converted into the DC SH band (3DGS convention: dc = (c - 0.5) / Y00).
    """
    means = jnp.asarray(means, jnp.float32)
    n = means.shape[0]
    if sh_coeffs is None:
        k = (sh_degree + 1) ** 2
        sh_coeffs = jnp.zeros((n, k, 3), jnp.float32)
        if colors is not None:
            from pathtracer_gaussiansplatting_tpu.core import sh as _sh

            dc = (jnp.asarray(colors, jnp.float32) - 0.5) / _sh.SH_C0
            sh_coeffs = sh_coeffs.at[:, 0, :].set(dc)
    zeros = jnp.zeros((n,), jnp.float32)
    return GaussianScene(
        means=means,
        log_scales=jnp.asarray(log_scales, jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        opacity_logits=jnp.asarray(opacity_logits, jnp.float32),
        sh_coeffs=jnp.asarray(sh_coeffs, jnp.float32),
        emission=(jnp.zeros((n, 3), jnp.float32) if emission is None
                  else jnp.asarray(emission, jnp.float32)),
        metallic=zeros if metallic is None else jnp.asarray(metallic, jnp.float32),
        roughness=(jnp.full((n,), 0.8, jnp.float32) if roughness is None
                   else jnp.asarray(roughness, jnp.float32)),
        clearcoat=(zeros if clearcoat is None
                   else jnp.asarray(clearcoat, jnp.float32)),
        clearcoat_roughness=(
            jnp.full((n,), 0.03, jnp.float32) if clearcoat_roughness is None
            else jnp.asarray(clearcoat_roughness, jnp.float32)),
        transmission=(zeros if transmission is None
                      else jnp.asarray(transmission, jnp.float32)),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PunctualLights:
    """Punctual lights (directional / point / spot).

    Mirrors the reference's ``PunctualLight`` struct
    (GeneralHeaders.h:330-360, KHR_lights_punctual via gameobject.cpp:798-851).
    type: 1 = directional, 0 = point, 2 = spot.
    """

    position: Array       # (L, 3)
    direction: Array      # (L, 3)
    color: Array          # (L, 3)
    intensity: Array      # (L,)
    light_type: Array     # (L,) int32
    range: Array          # (L,)  <=0 means unlimited
    inner_cone_cos: Array  # (L,)
    outer_cone_cos: Array  # (L,)

    @property
    def num_lights(self) -> int:
        return self.position.shape[0]


def make_punctual_lights(
    position=None, direction=None, color=None, intensity=None,
    light_type=None, range=None, inner_cone_cos=None, outer_cone_cos=None,
    num: Optional[int] = None,
) -> PunctualLights:
    if num is None:
        for arr in (position, direction, color, intensity, light_type):
            if arr is not None:
                num = len(arr)
                break
        else:
            num = 0
    n = num

    def _a(x, default, shape, dtype=jnp.float32):
        if x is None:
            return jnp.full(shape, default, dtype)
        return jnp.asarray(x, dtype).reshape(shape)

    return PunctualLights(
        position=_a(position, 0.0, (n, 3)),
        direction=_a(direction, 0.0, (n, 3)) if direction is not None
        else jnp.tile(jnp.array([[0.0, -1.0, 0.0]], jnp.float32), (n, 1)),
        color=_a(color, 1.0, (n, 3)),
        intensity=_a(intensity, 1.0, (n,)),
        light_type=_a(light_type, 0, (n,), jnp.int32),
        range=_a(range, 0.0, (n,)),
        inner_cone_cos=_a(inner_cone_cos, 1.0, (n,)),
        outer_cone_cos=_a(outer_cone_cos, 0.7, (n,)),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rays:
    """A batch of rays: origins (R, 3), directions (R, 3) (unit length)."""

    origins: Array
    directions: Array

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) render configuration — passed as a jit-static arg.

    Mirrors the knobs of the reference render loop:
      * max_depth / opaque_depth: raygen_camera.rgen:47-64 adaptive depth 12->4.
      * firefly_clamp: CLAMP_MAX = 5.0 (raygen_camera.rgen:9).
      * rr_start_depth / rr_min / rr_max: Russian roulette p=clamp(T,.05,.95)
        after depth 4 (raygen_camera.rgen:73-77).
      * ambient scale x2 on miss: miss.rmiss:9-15 (sky = ambient.rgb * 2).
    """

    max_depth: int = 4
    opaque_depth: int = 0  # adaptive depth cap for non-glass first hits
    # (raygen_camera.rgen:59-64: opaque first hit -> 4 bounces, glass -> 12);
    # 0 disables the cap (all rays run max_depth).
    glass_ior: float = 1.01  # refraction IOR (closesthit.rchit:517)
    firefly_clamp: float = 5.0
    rr_start_depth: int = 4
    rr_min: float = 0.05
    rr_max: float = 0.95
    min_throughput: float = 1e-3
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.999
    sigma_cut: float = 3.0           # evaluate Gaussians within 3 sigma
    max_contribs: int = 64           # top-K contributions composited per ray
    t_min: float = 1e-3
    t_max: float = 1e4
    transmittance_min: float = 1e-4  # early-out threshold (masking, not branching)
    shadow_eps: float = 0.05  # shadow/bounce origin offset along the normal;
    # must exceed the surfel thickness or the surface shadows itself
    # (reference uses 0.05 for the torus sensor, raygen.rgen:67)
    background: tuple = (0.0, 0.0, 0.0)
    ambient: tuple = (0.0, 0.0, 0.0, 1.0)  # rgb + nee strength w (ubo.ambientLight)
    hit_opacity_threshold: float = 0.5     # min accumulated alpha to count a hit
    nee: bool = True
    sh_degree: Optional[int] = None  # None = use all coefficients present

    def __post_init__(self):
        object.__setattr__(self, "background", tuple(self.background))
        object.__setattr__(self, "ambient", tuple(self.ambient))
