#!/usr/bin/env python
"""Capture a jax.profiler trace of one benchmark step and attribute time.

Closes the attribution gap the microbenchmarks can't see: tools/bench_bounce
times the three fused kernels in isolation (all-alive, one chunk), but the
real headline step spends wall time the kernel sum doesn't explain
(measured r2: bwd 2.65 s vs ~1 s predicted from replay+bwd kernel times).
This captures the WHOLE jitted step on device, parses the perfetto trace
JSON that jax.profiler writes, and prints the top ops by total device time
— so the missing seconds get names.

Usage:
  python tools/profile_step.py [--mode fwd+bwd] [--width 1920] ...
  python tools/profile_step.py --analyze-only /tmp/tpuray_trace  # reparse

The capture needs the TPU; the analysis is offline (pure JSON).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys


def analyze(log_dir: str, top: int = 25):
    """Parse perfetto trace(s) under log_dir -> print top ops by time."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(f"no *.trace.json.gz under {log_dir}", file=sys.stderr)
        return 1
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid/tid names that look like TPU/device XLA op streams
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dur_by_name = collections.Counter()
    n_by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        # keep device-side complete events (XLA ops); skip host python lanes
        if not any(k in pname for k in ("TPU", "/device:", "Device",
                                        "XLA Ops", "Steps")):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        dur_by_name[name] += dur
        n_by_name[name] += 1
        total += dur
    if not dur_by_name:
        # fall back: every complete event except host python frames
        # (some jaxlib versions name the device lanes differently)
        for e in events:
            name = e.get("name", "?")
            if e.get("ph") != "X" or name.startswith("$"):
                continue
            dur_by_name[name] += float(e.get("dur", 0.0))
            n_by_name[name] += 1
            total += float(e.get("dur", 0.0))
    print(f"# {path}")
    print(f"# total event time {total / 1e6:.3f} s (overlaps double-count)")
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for name, dur in dur_by_name.most_common(top):
        print(f"{dur / 1e3:>10.2f} {100 * dur / total:>6.2f} "
              f"{n_by_name[name]:>7}  {name[:90]}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze-only", default=None,
                    help="skip capture; parse this trace dir")
    ap.add_argument("--mode", default="fwd+bwd", choices=["fwd", "fwd+bwd"])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--backend", default="fused")
    ap.add_argument("--regen", action="store_true",
                    help="persistent-wavefront backend (fused only)")
    ap.add_argument("--shading", default="path",
                    choices=["path", "flat", "lambert_shadow"],
                    help="estimator (flat/lambert profile the fused "
                         "estimator mega-kernel, fwd mode only)")
    ap.add_argument("--out", default="/tmp/tpuray_trace")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.analyze_only:
        return analyze(args.analyze_only, args.top)

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
    from tpu_ray import default_camera, make_scene
    from tpu_ray.grad import image_mse, render_mean
    from tpu_ray.models.path_tracer import render_pass

    scene = make_scene(args.scene)
    camera = default_camera(scene)
    n = args.width * args.height
    ray_chunk = None
    if n * scene.n_pad > (1 << 28):          # same auto-chunk rule as bench.py
        ray_chunk = next((c for c in (86400, 129600, 43200, 28800, 14400,
                                      7200, 3600) if n % c == 0), None)
    kw = dict(width=args.width, height=args.height, spp=args.spp, seed=0,
              max_bounces=5, backend=args.backend, ray_chunk=ray_chunk,
              regen=args.regen)
    if args.shading != "path":
        assert args.mode == "fwd", "estimator profiles are forward-only"
        from tpu_ray.ops.shading_modes import scene_light_indices
        kw.update(shading=args.shading, regen=False)
        if args.shading == "lambert_shadow":
            kw["lights"] = scene_light_indices(scene)

    if args.mode == "fwd":
        def step(scene, camera):
            img, _ = render_pass(scene, camera, sample_start=0, **kw)
            return img
    else:
        target = jnp.zeros((args.height, args.width, 3), jnp.float32)

        @jax.jit
        def step(scene, camera):
            def loss_fn(scene, camera):
                return image_mse(render_mean(scene, camera, sample_start=0,
                                             **kw), target)
            return jax.grad(loss_fn, argnums=(0, 1))(scene, camera)

    jax.block_until_ready(step(scene, camera))        # compile + warm
    with jax.profiler.trace(args.out):
        jax.block_until_ready(step(scene, camera))
    print(f"trace captured -> {args.out}")
    return analyze(args.out, args.top)


if __name__ == "__main__":
    sys.exit(main())
