"""alpha_min must match between BinningConfig and RenderSettings
(the footprint shrink assumes the kernel's alpha cutoff, VERDICT r2 #7)."""
import numpy as np
import pytest

from pathtracer_gaussiansplatting_tpu.core.camera import Camera, look_at
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
from pathtracer_gaussiansplatting_tpu.render.tiled import prepare_tiles

from utils import random_scene


def test_alpha_min_mismatch_fails_loudly():
    scene = random_scene(32, np.random.default_rng(0))
    cam = Camera(c2w=look_at((0, 0, 4), (0, 0, 0)), fov_y_deg=45.0,
                 width=32, height=32)
    settings = RenderSettings(alpha_min=0.01)
    with pytest.raises(ValueError, match="alpha_min"):
        prepare_tiles(scene, cam, settings, BinningConfig())
    # matching configs pass
    prepare_tiles(scene, cam, settings,
                  BinningConfig(alpha_min=0.01))
