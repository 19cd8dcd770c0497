"""TPU-native differentiable Gaussian-splatting path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
FedericoCos/PathTracer_GaussianSplatting (a Vulkan RT-pipeline path tracer
for 3DGS dataset generation) with the scene representation replaced by
anisotropic 3D Gaussians, a fully differentiable forward, and multi-chip
scaling via jax.sharding. See SURVEY.md for the layer-by-layer mapping.
"""

from pathtracer_gaussiansplatting_tpu.core.camera import (  # noqa: F401
    Camera, FreeCamera, generate_rays, look_at, orthographic_rays,
    toroidal_c2w,
)
from pathtracer_gaussiansplatting_tpu.core.torus import (  # noqa: F401
    TorusConfig, torus_rays,
)
from pathtracer_gaussiansplatting_tpu.core.types import (  # noqa: F401
    GaussianScene, PunctualLights, Rays, RenderSettings,
    make_punctual_lights, make_scene,
)
from pathtracer_gaussiansplatting_tpu.ops.binning import (  # noqa: F401
    BinningConfig,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Heavier subsystems load lazily to keep import light.
    import importlib

    lazy = {
        "pathtrace": "pathtracer_gaussiansplatting_tpu.render.pathtrace",
        "reference": "pathtracer_gaussiansplatting_tpu.render.reference",
        "tiled": "pathtracer_gaussiansplatting_tpu.render.tiled",
        "grid_trace": "pathtracer_gaussiansplatting_tpu.render.grid_trace",
        "lights": "pathtracer_gaussiansplatting_tpu.render.lights",
        "capture": "pathtracer_gaussiansplatting_tpu.data.capture",
        "scene": "pathtracer_gaussiansplatting_tpu.models.scene",
    }
    if name in lazy:
        return importlib.import_module(lazy[name])
    raise AttributeError(name)
