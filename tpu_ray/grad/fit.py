"""Inverse-rendering training step (the framework's "train step").

Fits scene parameters (sphere geometry + materials) and/or camera pose to a
target image by gradient descent on the photometric loss. This is the
training loop the reference never had; its structure — forward render,
backward through the payload recompute, psum of the (tiny) scene-parameter
gradients across the ray mesh axis — is the design called out in SURVEY.md §7
step 3 and BASELINE.md (fwd+bwd rays/s is the headline metric).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from tpu_ray.core.camera import Camera
from tpu_ray.core.scene import Scene
from tpu_ray.grad.render_grad import image_mse, render_mean, render_mean_sharded


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    scene: Scene
    camera: Camera
    opt_state: Any
    step: jax.Array  # [] i32


def make_train_step(*, width: int, height: int, spp: int, seed: int = 0,
                    max_bounces: int = 5, backend: str = "jnp",
                    ray_chunk: Optional[int] = None,
                    mesh: Optional[Mesh] = None,
                    optimizer: Optional[optax.GradientTransformation] = None,
                    train_camera: bool = True, train_scene: bool = True,
                    remat: bool = False, cull_secondary: bool = False,
                    exact_argmin: bool = False, regen: bool = False,
                    fixed_samples: bool = False):
    """-> (init_fn(scene, camera) -> TrainState,
           step_fn(state, target) -> (TrainState, loss)).

    step_fn is jitted; each call renders spp fresh samples (sample_start
    advances with state.step so the Monte-Carlo estimator never reuses RNG
    streams across optimization steps). fixed_samples=True pins
    sample_start=0 — a deterministic loss for fitting a target rendered with
    the same streams (useful for tests and exact-recovery experiments).
    """
    optimizer = optimizer or optax.adam(1e-2)

    def render(scene, camera, sample_start):
        kw = dict(width=width, height=height, spp=spp,
                  sample_start=sample_start, seed=seed,
                  max_bounces=max_bounces, backend=backend,
                  ray_chunk=ray_chunk, remat=remat,
                  cull_secondary=cull_secondary,
                  exact_argmin=exact_argmin, regen=regen)
        if mesh is None:
            return render_mean(scene, camera, **kw)
        return render_mean_sharded(scene, camera, mesh=mesh, **kw)

    def loss_fn(params, sample_start, target):
        image = render(params["scene"], params["camera"], sample_start)
        return image_mse(image, target)

    def params_of(state):
        return {"scene": state.scene, "camera": state.camera}

    def init_fn(scene: Scene, camera: Camera) -> TrainState:
        params = {"scene": scene, "camera": camera}
        return TrainState(scene=scene, camera=camera,
                          opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    @jax.jit
    def step_fn(state: TrainState, target):
        params = params_of(state)
        if fixed_samples:
            sample_start = jnp.uint32(0)
        else:
            sample_start = state.step.astype(jnp.uint32) * jnp.uint32(spp)
        loss, grads = jax.value_and_grad(loss_fn)(params, sample_start, target)
        if not train_camera:
            grads["camera"] = jax.tree_util.tree_map(
                jnp.zeros_like, grads["camera"])
        if not train_scene:
            grads["scene"] = jax.tree_util.tree_map(
                jnp.zeros_like, grads["scene"])
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return TrainState(scene=new_params["scene"],
                          camera=new_params["camera"],
                          opt_state=opt_state,
                          step=state.step + 1), loss

    return init_fn, step_fn
