#!/usr/bin/env python
"""Isolated nearest-hit search microbench: jnp vs Pallas backends.

Measures the BASELINE.md "isolated nearest-hit search" row (2.07M rays x
512 spheres by default) for the XLA brute-force search and the Pallas
kernel (packed and exact argmin modes), printing rays/s for each.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

# NOTE: the repo root must join sys.path AFTER `import jax` — having it on
# PYTHONPATH at interpreter start breaks the axon TPU plugin's registration
# (a module shadow), leaving only cpu/tpu backends.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2073600)
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from tpu_ray import default_camera, make_scene
    from tpu_ray.kernels.sphere_intersect import nearest_hit_pallas
    from tpu_ray.ops.intersect import nearest_hit_jnp
    from tpu_ray.ops.raygen import camera_rays

    scene = make_scene(args.scene)
    cam = default_camera(scene)
    px = jnp.arange(args.rays, dtype=jnp.int32)
    w = 1920
    o, d, _ = camera_rays(cam, w, args.rays // w, px, 0, 0)
    o, d = jax.block_until_ready((o, d))

    def run(name, fn):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(o, d))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(o, d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:16s} {args.rays / dt / 1e6:8.1f}M rays/s "
              f"({dt * 1e3:.2f} ms)  sum_t={float(jnp.sum(jnp.minimum(out.t, 1e6))):.1f}")

    run("jnp", lambda o, d: nearest_hit_jnp(scene.center, scene.radius, o, d))
    run("pallas-packed", lambda o, d: nearest_hit_pallas(
        scene.center, scene.radius, o, d))
    run("pallas-exact", lambda o, d: nearest_hit_pallas(
        scene.center, scene.radius, o, d, exact=True))


if __name__ == "__main__":
    main()
