#!/usr/bin/env python
"""Per-kernel bounce microbench: fwd / replay / bwd on an all-alive wavefront.

Times one fused bounce of each kernel over a full 1080p wavefront (2.07M
rays, rtweekend 512 spheres), plus the XLA-side glue (init state build).
Attributes the headline step's time to kernels so optimization aims at the
right target. All-alive states = worst case (no dead-block skip).
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


def timed(name, f, *a, iters=10):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt * 1e3:8.2f} ms/bounce "
          f"({2073600 / dt / 1e6:7.1f}M rays/s)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2073600)
    ap.add_argument("--block-r", type=int, default=0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from tpu_ray import default_camera, make_scene
    from tpu_ray.kernels import bounce_step as bs
    from tpu_ray.ops.raygen import camera_rays

    block_r = args.block_r or bs.BLOCK_R
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    px = jnp.arange(args.rays, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 1920, args.rays // 1920, px, 0, 0)
    table = bs.table_chunks(bs.scene_table(scene))
    # mask=None (uncalled) kernels take the FULL-stacked layout (block_n =
    # n_pad), not the tile-major default
    stab = bs.search_table(scene, scene.n_pad)
    st, _, _ = bs._init_state(o, d, base, block_r)
    st = jax.block_until_ready(st)
    b = jnp.int32(0)

    fwd = jax.jit(lambda st: bs.bounce_fwd(
        table, stab, st, b, use_sky=True, block_r=block_r))
    t_fwd = timed("fwd", fwd, st, iters=args.iters)

    fwd_exact = jax.jit(lambda st: bs.bounce_fwd(
        table, stab, st, b, use_sky=True, block_r=block_r,
        exact_argmin=True))
    timed("fwd-exact", fwd_exact, st, iters=args.iters)

    _, idx = jax.block_until_ready(fwd(st))
    replay = jax.jit(lambda st, idx: bs.bounce_replay(
        table, st, idx, b, use_sky=True, block_r=block_r))
    t_rep = timed("replay", replay, st, idx, iters=args.iters)

    d_out = jnp.ones_like(st)
    bwd = jax.jit(lambda st, idx, d_out: bs.bounce_bwd(
        table, st, idx, b, d_out, use_sky=True, block_r=block_r))
    t_bwd = timed("bwd", bwd, st, idx, d_out, iters=args.iters)

    print(f"5-bounce x 64spp all-alive extrapolation: "
          f"fwd {5 * 64 * t_fwd:.2f}s  replay {5 * 64 * t_rep:.2f}s  "
          f"bwd {5 * 64 * t_bwd:.2f}s")


if __name__ == "__main__":
    main()
