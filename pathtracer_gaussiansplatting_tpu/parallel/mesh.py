"""Device mesh setup for multi-chip / multi-host rendering.

The reference is single-GPU with implicit per-pixel parallelism
(vkCmdTraceRaysKHR, engine.cpp:1971-1976; SURVEY.md §2.3: no distributed
layer). Here parallelism is explicit and two-axis:

  * ``rays`` (data parallel): ray/pixel batches sharded across devices — the
    primary scaling axis (BASELINE north star).
  * ``gauss`` (model parallel analog): the Gaussian parameter set sharded
    across devices, streamed in a ring (parallel/shard.py) — the path-tracing
    analog of tensor/context parallelism. PP/EP/Ulysses have no analog for a
    path tracer (no layer pipeline, no experts, no attention heads) —
    documented as N/A per SURVEY.md §2.3.

Multi-host: jax.distributed.initialize() before mesh creation gives one
global mesh spanning hosts; shardings are identical, collectives ride
ICI within a slice and DCN across.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
GAUSS_AXIS = "gauss"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Bootstrap multi-host execution (SURVEY.md §5 distributed backend).

    Call once at program start on every host, before any jax op. With no
    arguments, jax.distributed.initialize auto-detects the cluster from the
    TPU pod-slice / cluster-manager environment; explicit args override for
    manual (e.g. localhost multi-process test) setups. After this,
    ``jax.devices()`` spans all hosts and :func:`make_mesh` returns one
    global mesh — shardings are unchanged, collectives ride ICI within a
    slice and DCN across. Returns this host's process index.

    Single-process environments (no coordinator, 1 process) skip
    initialization and return 0, so the same entry point runs everywhere.
    """
    if coordinator_address is None and num_processes in (None, 1):
        import os

        if not (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
            return 0  # single host, nothing to do
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (rays, gauss) mesh over the available devices.

    Default: all devices on the ray axis (gauss axis 1 — Gaussians
    replicated), the right default while the scene fits per-device HBM.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (RAY_AXIS, GAUSS_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the ray axis of the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (Gaussian) axis across the gauss axis."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def _put(x, sharding: NamedSharding):
    """Multi-controller-safe placement.

    * Tracers (inside jit/grad): a sharding constraint, not a transfer.
    * Single process: plain device_put.
    * Multi-process: jax.make_array_from_callback — every process supplies
      its addressable shards from the (identical) host value; device_put
      would need cross-host transfers, which the CPU backend (and DCN-less
      setups) refuse.
    """
    if isinstance(x, jax.core.Tracer):
        return jax.lax.with_sharding_constraint(x, sharding)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_rays(rays, mesh: Mesh):
    """Place a Rays batch with the ray axis sharded."""
    s = ray_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, s), rays)


def replicate_scene(scene, mesh: Mesh):
    return jax.tree.map(lambda x: _put(x, replicated(mesh)), scene)


def shard_scene(scene, mesh: Mesh):
    """Shard every Gaussian-axis array across the gauss axis (pad first so
    N divides the axis size — see pad_to_multiple)."""
    s = gauss_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, s), scene)


def pad_to_multiple(scene, multiple: int):
    """Pad a GaussianScene with fully-transparent Gaussians so its count is
    divisible by ``multiple`` (sharding needs equal blocks; padded entries
    have opacity sigmoid(-30) ~ 0 and never contribute)."""
    import jax.numpy as jnp

    n = scene.num_gaussians
    pad = (-n) % multiple
    if pad == 0:
        return scene

    def pad_arr(x, fill=0.0):
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    return scene.replace(
        means=pad_arr(scene.means, 1e6),  # far away from everything
        log_scales=pad_arr(scene.log_scales, -10.0),
        quats=pad_arr(scene.quats).at[n:, 0].set(1.0),
        opacity_logits=pad_arr(scene.opacity_logits, -30.0),
        sh_coeffs=pad_arr(scene.sh_coeffs),
        emission=pad_arr(scene.emission),
        metallic=pad_arr(scene.metallic),
        roughness=pad_arr(scene.roughness, 1.0),
    )
