"""Differentiable render entry points (single-chip and sharded).

`render_mean` is the differentiable analogue of
tpu_ray.models.path_tracer.render_pass: same ops, returns the spp-mean
radiance image. `render_mean_sharded` runs the identical computation under
shard_map so reverse-mode AD produces the gradient collectives (psum of
scene/camera cotangents over the ray axis) automatically — the TPU-native
replacement for a gradient all-reduce (SURVEY.md §5.8).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_ray.core.camera import Camera
from tpu_ray.core.scene import Scene
from tpu_ray.models.path_tracer import probe_fn_for_backend, render_pixels
from tpu_ray.parallel.mesh import RAY_AXIS, SPHERE_AXIS, scene_pspec
from tpu_ray.parallel.render import probe_sphere_sharded


def render_mean(scene: Scene, camera: Camera, *, width: int, height: int,
                spp: int, sample_start=0, seed: int = 0, max_bounces: int = 5,
                backend: str = "jnp", ray_chunk: Optional[int] = None,
                remat: bool = False, cull_secondary: bool = False,
                exact_argmin: bool = False, regen: bool = False,
                return_rays: bool = False):
    """Differentiable spp-mean radiance image [H,W,3].

    backend='fused' runs both sweeps on the fused Pallas bounce kernels
    (custom VJP; `remat` is ignored — the fused path saves only its i16 hit
    records by construction). regen=True (fused only) runs the
    persistent-wavefront trace instead (kernels/regen.make_regen_trace):
    identical estimator, ~100% lane occupancy in BOTH sweeps.
    exact_argmin selects the bit-stable two-pass winner reduction.
    return_rays=True additionally returns the (non-differentiable) total
    rays-cast counter — the reference's stats metric (main.cpp:696-703) —
    so a grad step can report it without a second forward compile."""
    fused = backend == "fused"
    if fused:
        # tile-major ray order so the fused kernels' dead-block skip fires
        # in BOTH sweeps (same rationale as render_pass)
        from tpu_ray.models.path_tracer import tile_order
        perm, inv = tile_order(width, height)
        pixel = jnp.asarray(perm)
    else:
        pixel = jnp.arange(width * height, dtype=jnp.int32)
    color_sum, rays = render_pixels(
        scene, camera, pixel, width=width, height=height, spp=spp,
        sample_start=sample_start, seed=seed, max_bounces=max_bounces,
        probe_fn=probe_fn_for_backend(backend), ray_chunk=ray_chunk,
        remat=remat, backend_is_fused=fused, cull_secondary=cull_secondary,
        exact_argmin=exact_argmin, regen=regen)
    if fused:
        color_sum = color_sum[jnp.asarray(inv)]
    img = color_sum.reshape(height, width, 3) / jnp.float32(spp)
    if return_rays:
        return img, jnp.sum(rays)
    return img


def render_mean_sharded(scene: Scene, camera: Camera, *, mesh: Mesh,
                        width: int, height: int, spp: int, sample_start=0,
                        seed: int = 0, max_bounces: int = 5,
                        backend: str = "jnp",
                        ray_chunk: Optional[int] = None,
                        remat: bool = False, cull_secondary: bool = False,
                        exact_argmin: bool = False, regen: bool = False):
    """Differentiable spp-mean image, pixel axis sharded over `mesh`.

    With a "spheres" axis present, each device holds a sphere slice and the
    per-sphere gradient shards stay device-local (model-parallel layout);
    the redundantly-computed color is averaged over the sphere axis (exact:
    identical summands) so cotangents are scaled correctly under AD.
    """
    n = width * height
    n_ray = mesh.shape[RAY_AXIS]
    assert n % n_ray == 0, (n, n_ray)
    sphere_sharded = SPHERE_AXIS in mesh.axis_names

    probe = (partial(probe_sphere_sharded, axis=SPHERE_AXIS)
             if sphere_sharded else probe_fn_for_backend(backend))
    scene_specs = scene_pspec(scene, SPHERE_AXIS if sphere_sharded else None)
    fused = backend == "fused"
    if fused:
        assert not sphere_sharded, "fused backend needs the full sphere axis"
        from tpu_ray.models.path_tracer import tile_order
        perm, inv = tile_order(width, height)
        pixel = jnp.asarray(perm)
    else:
        inv = None
        pixel = jnp.arange(n, dtype=jnp.int32)

    def shard_fn(scene_local, camera, pixel_local):
        color_sum, _ = render_pixels(
            scene_local, camera, pixel_local, width=width, height=height,
            spp=spp, sample_start=sample_start, seed=seed,
            max_bounces=max_bounces, probe_fn=probe, ray_chunk=ray_chunk,
            remat=remat, backend_is_fused=fused,
            cull_secondary=cull_secondary, exact_argmin=exact_argmin,
            regen=regen)
        if sphere_sharded:
            # Every sphere shard computed the same color; pmean makes that
            # replication explicit so the backward pass splits the cotangent
            # instead of double-counting the (duplicated) raygen path.
            color_sum = jax.lax.pmean(color_sum, SPHERE_AXIS)
        return color_sum

    color_sum = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(scene_specs, P(), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS),
        check_vma=False,
    )(scene, camera, pixel)
    if inv is not None:
        color_sum = color_sum[jnp.asarray(inv)]
    return color_sum.reshape(height, width, 3) / jnp.float32(spp)


def image_mse(image, target):
    """Mean-squared error over all pixels/channels (the default loss)."""
    return jnp.mean((image - jnp.asarray(target, jnp.float32)) ** 2)
