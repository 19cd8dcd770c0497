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
