#!/usr/bin/env python
"""Per-bounce tile-cull mask density for the fused backend.

Reports, for each bounce, the fraction of (ray block x primitive tile)
search steps that survive (a) the plain interval mask (bounce_cull_mask),
(b) the octant-split mask (bounce_cull_mask_octant), and (c) the whole-block
dead skip alone. Density is a pure function of scene + camera + RNG, NOT of
hardware, so this runs fine on CPU — it predicts the search-work reduction
the TPU A/B (bench.py --cull-secondary) can at most realize.

Usage: python tools/cull_stats.py [--scene rtweekend] [--width 320]
       [--height 180] [--bounces 5]
"""
import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")  # after jax import: axon plugin quirk

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--bounces", type=int, default=5)
    args = ap.parse_args()

    from tpu_ray import default_camera, make_scene
    from tpu_ray.kernels.bounce_step import (
        BLOCK_R, bounce_cull_mask, bounce_cull_mask_octant, bounce_fwd,
        permute_scene, _fused_tables, _init_state)
    from tpu_ray.models.path_tracer import tile_order
    from tpu_ray.ops.raygen import camera_rays

    scene = permute_scene(make_scene(args.scene))
    cam = default_camera(scene)
    perm, _ = tile_order(args.width, args.height)
    px = jnp.asarray(perm)
    o, d, base = camera_rays(cam, args.width, args.height, px, 0, 0)
    st, _, _ = _init_state(o, d, base, BLOCK_R)
    tb = _fused_tables(scene)

    print(f"# {args.scene} {args.width}x{args.height} "
          f"{st.shape[1] // BLOCK_R} ray blocks")
    print(f"{'bounce':>6} {'alive':>7} {'blocks':>7} "
          f"{'plain':>7} {'octant':>7}")
    for b in range(args.bounces):
        alive = np.asarray(st[12] > 0.5)
        blocks = alive.reshape(-1, BLOCK_R).any(axis=1)
        plain = np.asarray(bounce_cull_mask(scene, st, BLOCK_R))
        octant = np.asarray(bounce_cull_mask_octant(scene, st, BLOCK_R))
        # a dead block skips every tile regardless of the mask
        plain = plain * blocks[:, None]
        octant = octant * blocks[:, None]
        print(f"{b:>6} {alive.mean():>7.3f} {blocks.mean():>7.3f} "
              f"{plain.mean():>7.3f} {octant.mean():>7.3f}")
        st, _ = bounce_fwd(tb["t48"], tb["stab_full"], st, jnp.int32(b),
                           None, tb["tri_full"], use_sky=scene.use_sky,
                           block_r=BLOCK_R)


if __name__ == "__main__":
    main()
