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

import jax
import jax.numpy as jnp

# repo root AFTER jax import (PYTHONPATH at start breaks the axon plugin)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def timeit(step, *args, iters=3):
    """Hard host-fetch timing, shared with bench.py — see
    tpu_ray.utils.metrics.hard_timeit for the async-return rationale."""
    from tpu_ray.utils.metrics import hard_timeit
    return hard_timeit(step, *args, iters=iters)


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
    from bench import SHADE_OPS_SIMPLE, speed_of_light_rays_per_s

    def sum_step(scene, cam, **kw):
        @jax.jit
        def step(scene, cam):
            img, rays = render_pass(scene, cam, sample_start=0, **kw)
            return jnp.sum(img), rays
        return step

    # --- configs 1-2: the non-path estimators, all three backends ---------
    # (VERDICT r3 item 5: vs_baseline + the faster measured backend. The
    # op-mix floor is one search + a ~60-op shading chain per cast ray;
    # the probe backends' gap to it is XLA glue — payload gathers, masks —
    # which the r4 fused estimator mega-kernel (kernels/simple_shade.py)
    # eliminates: in-kernel raygen + search + shadow folds, all spp in one
    # launch.)
    for cfg, name, scene_name, kw in [
        (1, "config1 flat single 256x256 1spp", "single",
         dict(width=256, height=256, spp=1, shading="flat")),
        (2, "config2 lambert_shadow sixteen 512x512 4spp", "sixteen",
         dict(width=512, height=512, spp=4, shading="lambert_shadow")),
    ]:
        scene = make_scene(scene_name)
        cam = default_camera(scene)
        if kw["shading"] == "lambert_shadow":
            kw = dict(kw, lights=scene_light_indices(scene))
        sol = speed_of_light_rays_per_s(scene.n_pad, "v5e", "fwd",
                                        shade_ops=SHADE_OPS_SIMPLE)
        for backend in ("fused", "pallas", "jnp"):
            step = sum_step(scene, cam, backend=backend, **kw)
            _, rays = step(scene, cam)
            dt = timeit(step, scene, cam, iters=10)
            row(name, int(rays), dt, backend=backend,
                vs_baseline=round(int(rays) / dt / sol, 4),
                speed_of_light_rays_per_s=round(sol, 1),
                **({"note": "dispatch-bound at 65k rays via the tunnel"}
                   if cfg == 1 else {}))

    # --- config 3: 64 spheres, camera+material grads, 1024^2, 16 spp ------
    scene = make_scene("sixtyfour")
    cam = default_camera(scene)
    # regen: the sphere-scene default (the headline backend, BASELINE.md)
    kw = dict(width=1024, height=1024, spp=16, seed=0, backend="fused",
              regen=True, ray_chunk=65536)   # bench.py's auto-pick
    _, rays = render_pass(scene, cam, sample_start=0, **kw)
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
    # fused+regen first: the measured default route (bench.py) — chunk
    # 43200 is its measured-best slab (BASELINE config 4 row)
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    for backend, bkw in (("fused+regen", dict(backend="fused", regen=True,
                                              ray_chunk=43200)),
                         ("fused", dict(backend="fused", ray_chunk=86400)),
                         ("pallas", dict(backend="pallas",
                                         ray_chunk=86400)),
                         ("jnp", dict(backend="jnp", ray_chunk=86400))):
        kw = dict(width=1920, height=1080, spp=2, **bkw)
        step = sum_step(scene, cam, **kw)
        _, rays = step(scene, cam)
        dt = timeit(step, scene, cam, iters=2)
        row(f"config4 trimesh {scene.tris.n_real}tris 1920x1080 2spp",
            int(rays), dt, backend=backend)

    # config 4 gradient step (fused tri custom-VJP — round 2): vertex +
    # material + camera gradients through the 10k-tri scene at 1080p,
    # both the regen default and the per-sample sweep
    target = jnp.zeros((1080, 1920, 3), jnp.float32)
    for backend, bkw in (("fused+regen", dict(backend="fused", regen=True,
                                              ray_chunk=43200)),
                         ("fused", dict(backend="fused",
                                        ray_chunk=86400))):
        kw = dict(width=1920, height=1080, spp=2, seed=0, **bkw)
        _, rays = render_pass(scene, cam, sample_start=0, **kw)

        @jax.jit
        def g4step(scene, cam):
            def loss(s, c):
                return image_mse(render_mean(s, c, **kw), target)
            return jax.grad(loss, argnums=(0, 1))(scene, cam)

        dt = timeit(g4step, scene, cam, iters=2)
        row(f"config4 trimesh {scene.tris.n_real}tris fwd+bwd "
            f"1920x1080 2spp", int(rays), dt, backend=backend)

    # --- bigmesh: past the residency cliff (163,842 tris) ----------------
    # the HBM-streaming probe+stream route with the sorted-bounce
    # wavefront + alive-aware lists (the only route at this scale; the
    # reference cannot load meshes at all) — fwd AND the full gradient
    # step (r5: gradients proven past the cliff)
    scene = make_scene("bigmesh")
    cam = default_camera(scene)
    kw = dict(width=1920, height=1080, spp=1, seed=0, backend="fused",
              ray_chunk=43200)
    step = sum_step(scene, cam, **kw)
    _, rays = step(scene, cam)
    dt = timeit(step, scene, cam, iters=2)
    row(f"bigmesh {scene.tris.n_real}tris 1920x1080 1spp", int(rays), dt,
        backend="probe+stream")

    target = jnp.zeros((1080, 1920, 3), jnp.float32)

    @jax.jit
    def gbstep(scene, cam):
        def loss(s, c):
            return image_mse(render_mean(s, c, remat="save_hits", **kw),
                             target)
        return jax.grad(loss, argnums=(0, 1))(scene, cam)

    dt = timeit(gbstep, scene, cam, iters=1)
    row(f"bigmesh {scene.tris.n_real}tris fwd+bwd 1920x1080 1spp",
        int(rays), dt, backend="probe+stream")


if __name__ == "__main__":
    main()
