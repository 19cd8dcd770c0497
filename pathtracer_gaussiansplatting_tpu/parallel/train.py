"""Distributed training step: differentiable rendering + psum'd gradients.

The reference generates datasets for an EXTERNAL 3DGS trainer (README.md:43);
our framework closes the loop: the renderer is differentiable, so scenes can
be optimized against images directly. The training step is the BASELINE
north star's fwd+bwd workload: rays sharded over the 'rays' axis, scene
replicated (or gauss-sharded via the ring), gradients all-reduced by GSPMD
(psum over the rays axis appears in the backward automatically).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from pathtracer_gaussiansplatting_tpu.core.types import Rays, RenderSettings
from pathtracer_gaussiansplatting_tpu.parallel.mesh import (
    ray_sharding, replicated, replicate_scene, shard_rays,
)
from pathtracer_gaussiansplatting_tpu.render.reference import render_radiance_dense


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def make_optimizer(lr: float = 1e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


def make_train_step(settings: RenderSettings,
                    optimizer: optax.GradientTransformation,
                    render_fn: Optional[Callable] = None,
                    loss_fn: Callable = l2_loss,
                    mesh=None):
    """Build a jitted train step: (scene, opt_state, rays, target) ->
    (scene, opt_state, loss).

    With ``mesh``, outputs keep the scene replicated and consume ray-sharded
    batches; the gradient all-reduce over the rays axis is inserted by GSPMD.
    """
    if render_fn is None:
        render_fn = functools.partial(render_radiance_dense,
                                      settings=settings)

    def loss_of(scene, rays, target):
        img = render_fn(scene, rays)
        return loss_fn(img, target)

    def step(scene, opt_state, rays, target):
        loss, grads = jax.value_and_grad(loss_of)(scene, rays, target)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    # Donate only the optimizer state: the scene argument may alias caller-
    # held buffers (device_put can be a no-op for already-matching shardings),
    # and donating it would delete them under the caller's feet.
    if mesh is None:
        return jax.jit(step, donate_argnums=(1,))
    rep = replicated(mesh)
    ray_s = ray_sharding(mesh)
    # Sharding pytree prefixes: ray_s applies to every leaf of the Rays batch.
    return jax.jit(
        step,
        in_shardings=(rep, rep, ray_s, ray_s),
        out_shardings=(rep, rep, rep),
        donate_argnums=(1,),
    )


def make_tiled_train_step(settings: RenderSettings,
                          optimizer: optax.GradientTransformation,
                          config=None, loss_fn: Callable = l2_loss):
    """Train step rendering full camera frames through the fused tile
    pipeline — the production 3DGS training loop (fresh binning every step,
    forward + analytic backward through the Pallas kernels).

    Returns step(scene, opt_state, camera, target_hw3) ->
    (scene, opt_state, loss). Camera is a pytree (c2w traced; width/height/
    fov static), so pose changes between steps don't recompile.
    """
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        prepare_tiles, render_prepared,
    )

    config = config or BinningConfig()

    def loss_of(scene, camera, target):
        packets = prepare_tiles(scene, camera, settings, config)
        out = render_prepared(packets, camera, settings, config,
                              outputs=("color",))
        return loss_fn(out["color"], target)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(scene, opt_state, camera, target):
        loss, grads = jax.value_and_grad(loss_of)(scene, camera, target)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    return step


def fit_scene_tiled(scene, cameras, targets, settings,
                    steps: int = 200, lr: float = 5e-3, config=None,
                    progress: Optional[Callable] = None):
    """Fit a scene to (camera, image) pairs with the tiled pipeline.

    ``cameras``: list of Camera (same static intrinsics); ``targets``:
    matching list of (H, W, 3) images. Cycles through poses per step.
    Returns (scene, losses, final metrics dict with psnr/ssim on pose 0).
    """
    from pathtracer_gaussiansplatting_tpu.ops.binning import BinningConfig
    from pathtracer_gaussiansplatting_tpu.render.tiled import (
        render_tiled_pallas,
    )
    from pathtracer_gaussiansplatting_tpu.utils import metrics as metrics_mod

    config = config or BinningConfig()
    opt = make_optimizer(lr)
    opt_state = opt.init(scene)
    step = make_tiled_train_step(settings, opt, config=config)
    losses = []
    targets = [jnp.asarray(t, jnp.float32) for t in targets]
    for i in range(steps):
        p = i % len(cameras)
        scene, opt_state, loss = step(scene, opt_state, cameras[p],
                                      targets[p])
        losses.append(float(loss))
        if progress:
            progress(i, losses[-1])
    out = render_tiled_pallas(scene, cameras[0], settings, config)
    final = dict(
        psnr=float(metrics_mod.psnr(out["color"], targets[0])),
        ssim=float(metrics_mod.ssim(out["color"], targets[0])),
    )
    return scene, losses, final


def fit_scene(scene, rays, target, settings, steps: int = 100,
              lr: float = 5e-3, mesh=None, render_fn=None,
              progress: Optional[Callable] = None):
    """Optimize a scene against target pixels. Returns (scene, losses)."""
    opt = make_optimizer(lr)
    opt_state = opt.init(scene)
    step = make_train_step(settings, opt, render_fn=render_fn, mesh=mesh)
    if mesh is not None:
        scene = replicate_scene(scene, mesh)
        rays = shard_rays(rays, mesh)
        target = jax.device_put(target, ray_sharding(mesh))
    losses = []
    for i in range(steps):
        scene, opt_state, loss = step(scene, opt_state, rays, target)
        losses.append(float(loss))
        if progress:
            progress(i, losses[-1])
    return scene, losses
