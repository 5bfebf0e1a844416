#!/usr/bin/env python
"""The non-path estimators: flat shading and Lambert + shadow rays.

BASELINE configs 1-2 use these simpler estimators instead of the full
path tracer (ops/shading_modes.py): `flat` shades primary visibility
only (albedo + emissive of the first hit, or sky), `lambert_shadow`
adds one nearest-hit shadow probe per emissive sphere — the standard
direct-lighting estimator built from the same probe machinery the path
tracer uses (the reference itself has only the path estimator; these
generalize its emissive/sky terms, main.cpp:433-440).

On the fused backend these run the r4 estimator mega-kernel
(kernels/simple_shade.py): in-kernel raygen + search + winner gather +
shading + shadow folds, all spp in one launch per ray block — measured
478M rays/s on config 2 vs 170M for the probe path (BASELINE.md).
"""
import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sixteen")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--backend", default="fused",
                    choices=["jnp", "pallas", "fused"])
    ap.add_argument("--shading", default="lambert_shadow",
                    choices=["flat", "lambert_shadow"])
    ap.add_argument("--out", default="estimator.png")
    args = ap.parse_args(argv)

    import numpy as np
    from tpu_ray import default_camera, make_scene
    from tpu_ray.models.path_tracer import render_pass
    from tpu_ray.ops.shading_modes import scene_light_indices
    from tpu_ray.ops.tonemap import linear_to_srgb, pack_rgba8
    from tpu_ray.utils.png import write_png

    scene = make_scene(args.scene)
    camera = default_camera(scene)
    lights = (scene_light_indices(scene)
              if args.shading == "lambert_shadow" else ())
    image_sum, rays = render_pass(
        scene, camera, width=args.width, height=args.height, spp=args.spp,
        sample_start=0, backend=args.backend, shading=args.shading,
        lights=lights)
    img = pack_rgba8(linear_to_srgb(image_sum / args.spp))
    write_png(args.out, np.asarray(img))
    print(f"wrote {args.out} ({args.shading}, {int(rays)} rays, "
          f"{len(lights)} lights)")
    return int(rays)


if __name__ == "__main__":
    main()
