#!/usr/bin/env python
"""Throughput of the reference re-execution (native C++ oracle) on host CPU.

The reference's only headline metric is its live stats panel: rays cast /
wall time = avg ns per ray (reference wasm/wasm.cpp:199, main.cpp:696-703)
on its default workload (1280x720 window x 0.75 render scale -> 960x540,
1 spp per progressive pass, 5 bounces, reference main.cpp:649-650,
wasm/wasm.cpp:78). This tool measures OUR faithful re-execution of that
algorithm (src/native/oracle.cpp: same math, same counter RNG, std::thread
tile pool like the reference's work queue) on every host core — the
apples-to-apples CPU side of the "TPU framework vs reference on its own
benchmark" comparison recorded in BASELINE.md.

Prints one JSON line per scene. Pure CPU: no jax, no TPU tunnel.
"""
import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")  # oracle is pure CPU; don't touch the tunnel
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--scenes", default="rtweekend")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="0 = all host cores (reference default)")
    args = ap.parse_args()

    from tpu_ray import default_camera, make_scene
    from tpu_ray.oracle.native import NativeOracle

    for name in args.scenes.split(","):
        scene = make_scene(name)
        cam = default_camera(scene)
        pos = np.asarray(cam.position)
        tgt = np.asarray(cam.look_at)
        oracle = NativeOracle(scene, n_threads=args.threads)
        kw = dict(width=args.width, height=args.height, spp=args.spp,
                  seed=0, max_bounces=5)
        _, rays = oracle.render_pass(pos, tgt, sample_start=0, **kw)  # warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            _, rays = oracle.render_pass(pos, tgt, sample_start=i, **kw)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": f"reference re-execution (C++ oracle) rays/s "
                      f"{args.width}x{args.height} {args.spp}spp {name}",
            "value": round(rays / dt, 1),
            "unit": "rays/s",
            "ns_per_ray": round(dt / rays * 1e9, 3),
            "threads": args.threads or os.cpu_count(),
            "total_rays_per_pass": int(rays),
            "pass_seconds": round(dt, 4),
        }))


if __name__ == "__main__":
    main()
