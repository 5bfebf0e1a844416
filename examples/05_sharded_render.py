#!/usr/bin/env python
"""Sharded rendering over a device mesh.

The reference distributes 32x32 pixel tiles over OS threads with a lock-free
work queue (reference wasm/wasm.cpp:604-694). Across TPU chips the same
decomposition is a `jax.sharding.Mesh` with the ray wavefront statically
sharded over a "rays" axis (the workload is uniform, so even sharding beats
stealing) and the scene replicated; `render_pass_sharded` wraps the single
-chip renderer in `shard_map`, with a psum for the rays-cast stat as the
only collective on the hot path.

An optional second "spheres" axis shards the primitive arrays instead:
each device computes partial nearest-hit minima over its sphere slice and
winners are selected with an all_gather (tensor parallelism over the
primitive axis). Pass --mesh 2x2 etc. to exercise it.

Try on CPU with a forced 8-device platform:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/05_sharded_render.py --mesh 8
Sharded output is BIT-IDENTICAL to the single-device render (tested in
tests/test_parallel.py) — sharding is a pure throughput knob.
"""
import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=184)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--mesh", default="",
                    help="'4' = 4-way ray sharding, '2x2' = rays x spheres; "
                         "default: all visible devices on the ray axis")
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "fused"])
    ap.add_argument("--out", default="sharded.png")
    args = ap.parse_args(argv)

    import jax

    from tpu_ray import default_camera, make_scene
    from tpu_ray.ops.tonemap import linear_to_srgb, pack_rgba8
    from tpu_ray.parallel import make_mesh, render_pass_sharded, shard_scene
    from tpu_ray.utils.png import write_png

    if args.mesh:
        shape = tuple(int(x) for x in args.mesh.split("x"))
        mesh = make_mesh(shape)
    else:
        mesh = make_mesh((len(jax.devices()),))
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} "
          f"{jax.devices()[0].platform} device(s)")

    scene = shard_scene(make_scene(args.scene), mesh)
    camera = default_camera(scene)

    image_sum, rays = render_pass_sharded(
        scene, camera, mesh=mesh, width=args.width, height=args.height,
        spp=args.spp, sample_start=0, backend=args.backend)
    image = image_sum / args.spp
    write_png(args.out, pack_rgba8(linear_to_srgb(image))[::-1])
    print(f"{int(rays):,} rays cast -> {args.out}")
    return image


if __name__ == "__main__":
    main()
