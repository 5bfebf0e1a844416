#!/usr/bin/env python
"""BASELINE.json config matrix: one measured rays/s row per config 1-4.

Runs all four configs in ONE process (single TPU client) and prints one
JSON line each:
  1. single-sphere + ground, 256x256, 1 spp, flat shading
  2. 16-sphere scene, 512x512, 4 spp, Lambertian + shadow rays
  3. 64-sphere scene, camera+material gradients, 1024x1024, 16 spp
  4. triangle mesh (Möller-Trumbore in Pallas), ~10k tris, 1080p
(config 5 — multi-host 1080p64 — is the headline bench.py metric plus the
virtual-mesh scaling mode; multi-chip hardware unavailable, see BASELINE.md)
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# repo root AFTER jax import (PYTHONPATH at start breaks the axon plugin)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def timeit(step, *args, iters=3):
    out = jax.block_until_ready(step(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def row(name, rays, seconds, **extra):
    print(json.dumps({
        "metric": name, "value": round(rays / seconds, 1), "unit": "rays/s",
        "step_seconds": round(seconds, 4),
        "ns_per_ray": round(seconds / rays * 1e9, 3), **extra}))


def main():
    from tpu_ray import default_camera, make_scene
    from tpu_ray.grad import image_mse, render_mean
    from tpu_ray.models.path_tracer import render_pass
    from tpu_ray.ops.shading_modes import scene_light_indices

    # --- config 1: single + ground, 256^2, 1 spp, flat --------------------
    scene = make_scene("single")
    cam = default_camera(scene)
    kw = dict(width=256, height=256, spp=1, sample_start=0, shading="flat")
    _, rays = render_pass(scene, cam, **kw)
    dt = timeit(lambda: render_pass(scene, cam, **kw)[0])
    row("config1 flat single 256x256 1spp", int(rays), dt, backend="jnp")

    # --- config 2: 16 spheres, 512^2, 4 spp, lambert + shadow -------------
    scene = make_scene("sixteen")
    cam = default_camera(scene)
    lights = scene_light_indices(scene)
    kw = dict(width=512, height=512, spp=4, sample_start=0,
              shading="lambert_shadow", lights=lights)
    _, rays = render_pass(scene, cam, **kw)
    dt = timeit(lambda: render_pass(scene, cam, **kw)[0])
    row("config2 lambert_shadow sixteen 512x512 4spp", int(rays), dt,
        backend="jnp")

    # --- config 3: 64 spheres, camera+material grads, 1024^2, 16 spp ------
    scene = make_scene("sixtyfour")
    cam = default_camera(scene)
    # regen: the sphere-scene default (the headline backend, BASELINE.md)
    kw = dict(width=1024, height=1024, spp=16, seed=0, backend="fused",
              regen=True)
    _, rays = render_pass(scene, cam, sample_start=0, width=1024,
                          height=1024, spp=16, backend="fused", regen=True)
    target = jnp.zeros((1024, 1024, 3), jnp.float32)

    @jax.jit
    def gstep(scene, cam):
        def loss(s, c):
            return image_mse(render_mean(s, c, **kw), target)
        return jax.grad(loss, argnums=(0, 1))(scene, cam)

    dt = timeit(gstep, scene, cam)
    row("config3 fwd+bwd grads sixtyfour 1024x1024 16spp", int(rays), dt,
        backend="fused+regen")

    # --- config 4: trimesh 1080p, Möller-Trumbore in Pallas ---------------
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    for backend in ("fused", "pallas", "jnp"):
        kw = dict(width=1920, height=1080, spp=2, sample_start=0,
                  backend=backend, ray_chunk=86400)
        _, rays = render_pass(scene, cam, **kw)
        dt = timeit(lambda: render_pass(scene, cam, **kw)[0], iters=2)
        row(f"config4 trimesh {scene.tris.n_real}tris 1920x1080 2spp",
            int(rays), dt, backend=backend)

    # config 4 gradient step (fused tri custom-VJP — round 2): vertex +
    # material + camera gradients through the 10k-tri scene at 1080p
    kw = dict(width=1920, height=1080, spp=2, seed=0, backend="fused",
              ray_chunk=86400)
    _, rays = render_pass(scene, cam, sample_start=0, width=1920,
                          height=1080, spp=2, backend="fused",
                          ray_chunk=86400)
    target = jnp.zeros((1080, 1920, 3), jnp.float32)

    @jax.jit
    def g4step(scene, cam):
        def loss(s, c):
            return image_mse(render_mean(s, c, **kw), target)
        return jax.grad(loss, argnums=(0, 1))(scene, cam)

    dt = timeit(g4step, scene, cam, iters=2)
    row(f"config4 trimesh {scene.tris.n_real}tris fwd+bwd 1920x1080 2spp",
        int(rays), dt, backend="fused")


if __name__ == "__main__":
    main()
