"""Multi-process distributed correctness (SURVEY.md §4: localhost
jax.distributed): 2 processes x 4 virtual CPU devices = one 8-device
global mesh. The DP renderer's gradients and the gauss-ring renderer's
gradients must match the single-process reference bit-for-tolerance.

This validates parallel.mesh.initialize_multihost and the cross-process
GSPMD/shard_map paths that the single-process 8-device tests cannot:
global-array construction from per-process shards, DCN-modeled
collectives, and multi-controller jit.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils

from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
    initialize_multihost, make_mesh, pad_to_multiple, shard_scene,
)
from pathtracer_gaussiansplatting_tpu.parallel.shard import (
    render_dense_ray_sharded, ring_topk_radiance,
)
from pathtracer_gaussiansplatting_tpu.core.camera import (
    Camera, generate_rays, look_at,
)
from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud

idx = initialize_multihost(f"localhost:{port}", 2, pid)
assert idx == pid
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

scene = random_cloud(96, seed=13, spread=1.0)
cam = Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
             width=32, height=16)
rays = generate_rays(cam)
settings = RenderSettings(max_contribs=32, background=(0.1, 0.2, 0.3))

# --- DP (ray-sharded) forward + grads over the global 8-device mesh ---
mesh = make_mesh((8, 1))

def loss_dp(means):
    out = render_dense_ray_sharded(scene.replace(means=means), rays,
                                   settings, mesh)
    return jnp.mean(out ** 2)

g_dp = jax.grad(loss_dp)(scene.means)
g_dp = multihost_utils.process_allgather(g_dp, tiled=True)

# --- gauss-ring (scene sharded over 2) grads ---
mesh2 = make_mesh((4, 2))
padded = pad_to_multiple(scene, 2)

def loss_ring(means):
    sharded = shard_scene(padded.replace(means=means), mesh2)
    out = ring_topk_radiance(sharded, rays, settings, mesh2)
    return jnp.mean(out ** 2)

g_ring = jax.grad(loss_ring)(padded.means)
g_ring = multihost_utils.process_allgather(g_ring, tiled=True)

if pid == 0:
    np.savez(os.path.join(outdir, "grads.npz"),
             g_dp=np.asarray(g_dp), g_ring=np.asarray(g_ring))
print(f"worker {pid} done", flush=True)
'''


@pytest.mark.skipif(os.environ.get("GSPT_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_grads_match_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(str(tmp_path), "worker.py")
    with open(worker, "w") as f:
        f.write(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), str(tmp_path), REPO],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    got = np.load(os.path.join(str(tmp_path), "grads.npz"))

    # single-process reference on this process's 8 virtual devices
    import jax
    import jax.numpy as jnp
    from pathtracer_gaussiansplatting_tpu.core.camera import (
        Camera, generate_rays, look_at,
    )
    from pathtracer_gaussiansplatting_tpu.core.types import RenderSettings
    from pathtracer_gaussiansplatting_tpu.models.scene import random_cloud
    from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
        make_mesh, pad_to_multiple, shard_scene,
    )
    from pathtracer_gaussiansplatting_tpu.parallel.shard import (
        render_dense_ray_sharded, ring_topk_radiance,
    )

    scene = random_cloud(96, seed=13, spread=1.0)
    cam = Camera(c2w=look_at((0, 0.5, 4.0), (0, 0, 0)), fov_y_deg=50.0,
                 width=32, height=16)
    rays = generate_rays(cam)
    settings = RenderSettings(max_contribs=32, background=(0.1, 0.2, 0.3))
    mesh = make_mesh((8, 1))

    def loss_dp(means):
        out = render_dense_ray_sharded(scene.replace(means=means), rays,
                                       settings, mesh)
        return jnp.mean(out ** 2)

    ref_dp = np.asarray(jax.grad(loss_dp)(scene.means))
    np.testing.assert_allclose(got["g_dp"], ref_dp, rtol=1e-4, atol=1e-6)

    mesh2 = make_mesh((4, 2))
    padded = pad_to_multiple(scene, 2)

    def loss_ring(means):
        sharded = shard_scene(padded.replace(means=means), mesh2)
        out = ring_topk_radiance(sharded, rays, settings, mesh2)
        return jnp.mean(out ** 2)

    ref_ring = np.asarray(jax.grad(loss_ring)(padded.means))
    np.testing.assert_allclose(got["g_ring"], ref_ring,
                               rtol=1e-4, atol=1e-6)
