#!/usr/bin/env python
"""Progressive rendering with PathTracer — the library form of the
reference's browser loop (reference wasm/wasm.cpp:176-222: one progressive
pass per animation frame, accumulated into a running mean).

Each `tracer.step(state)` renders `spp` fresh jittered samples per pixel and
folds them into the accumulator; image quality improves monotonically with
passes and any pass is a valid (noisier) image — render can stop, resume, or
checkpoint at every pass boundary (see tpu_ray.utils.checkpoint).
"""
import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtweekend",
                    help="rgb | randomized | rtweekend | trimesh | ...")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--spp", type=int, default=4, help="samples per pass")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "fused"],
                    help="fused = the fast Pallas mega-kernel path on TPU")
    ap.add_argument("--out", default="render.png")
    args = ap.parse_args(argv)

    from tpu_ray import PathTracer, RenderConfig
    from tpu_ray.utils.png import write_png

    cfg = RenderConfig(scene=args.scene, width=args.width,
                       height=args.height, spp=args.spp,
                       backend=args.backend)
    tracer = PathTracer(cfg)

    state = tracer.init_state()
    total_rays = 0
    for i in range(args.passes):
        state, rays = tracer.step(state)
        total_rays += int(rays)
        print(f"pass {i + 1}/{args.passes}: {int(state.samples)} spp "
              f"accumulated, {total_rays:,} rays cast")

    write_png(args.out, tracer.srgb_image(state))
    print(f"wrote {args.out}")
    return state


if __name__ == "__main__":
    main()
