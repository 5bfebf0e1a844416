"""Command-line interface — the reference's HTML control panel, reimagined.

Every control in wasm/index.html:170-209 has a flag here (scene selection,
render scale -> width/height, thread count -> mesh shape, EnableSIMD ->
--backend), and the stats panel (index.html:197-203) becomes JSONL metrics.

Subcommands:
  render  progressive render -> PNG (+ optional checkpoint/resume/metrics)
  fit     inverse rendering: optimize scene/camera to match a target image
  bench   thin wrapper over bench.py
  scenes  list built-in scenes
"""
from __future__ import annotations

import argparse
import sys


def _add_common(ap: argparse.ArgumentParser):
    ap.add_argument("--scene", default="rtweekend",
                    help="rgb | randomized | rtweekend (reference scenes 0-2)")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--spp", type=int, default=1,
                    help="samples per pixel per pass")
    ap.add_argument("--max-bounces", type=int, default=5)
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "fused"],
                    help="compute backend (the EnableSIMD analogue); "
                         "fused = custom-VJP single-kernel bounce")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ray-chunk", type=int, default=None)
    ap.add_argument("--shading", default="path",
                    choices=["path", "flat", "lambert_shadow"])
    ap.add_argument("--exact-argmin", action="store_true",
                    help="fused backend: bit-stable two-pass winner "
                         "selection (certification mode; slightly slower)")
    ap.add_argument("--cull-secondary", action="store_true",
                    help="fused backend: octant-split tile culling on "
                         "secondary bounces (bit-identical DEBUG knob; "
                         "every TPU measurement is a LOSS — 19%% slower "
                         "on the sphere headline, a wash on meshes, "
                         "BASELINE.md — kept for A/B measurement only)")
    ap.add_argument("--regen", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fused backend: persistent-wavefront sample "
                         "regeneration — all spp samples in one kernel "
                         "loop, ~100%% lane occupancy (render, fit, "
                         "animate; differentiable via its custom VJP). "
                         "Default: ON whenever --backend fused (the "
                         "measured-best path for rendering, BASELINE.md); "
                         "--no-regen to disable")
    ap.add_argument("--mesh", default=None,
                    help="device mesh, e.g. '8' or '4x2' (rays[xspheres])")
    ap.add_argument("--metrics", default=None, help="JSONL metrics file")
    ap.add_argument("--profile", default=None,
                    help="jax.profiler trace directory")


def _want_regen(flag, backend: str) -> bool:
    """--regen default: ON whenever the fused backend renders (measured
    best, BASELINE.md r3 — including triangle soups via the resident
    list sweep); an explicit --no-regen wins. Gradient-heavy commands
    pass their own measured default."""
    if backend != "fused":
        return False
    return True if flag is None else bool(flag)


def _parse_mesh(spec):
    if spec is None:
        return None
    from tpu_ray.parallel import make_mesh
    try:
        shape = tuple(int(x) for x in spec.lower().split("x"))
    except ValueError:
        raise SystemExit(
            f"error: --mesh expects e.g. '8' or '4x2' (rays[xspheres]), "
            f"got {spec!r}")
    return make_mesh(shape)


def cmd_render(args) -> int:
    import jax
    from tpu_ray import PathTracer, RenderConfig, make_scene
    from tpu_ray.models.path_tracer import render_pass
    from tpu_ray.parallel import render_pass_sharded, shard_scene
    from tpu_ray.ops.accumulate import AccumState, accumulate
    from tpu_ray.utils import (MetricsLogger, StepTimer, load_checkpoint,
                               save_checkpoint, write_png)
    from tpu_ray.utils.metrics import profiler_trace

    cfg = RenderConfig(scene=args.scene, width=args.width, height=args.height,
                       spp=args.spp, max_bounces=args.max_bounces,
                       backend=args.backend, seed=args.seed,
                       ray_chunk=args.ray_chunk, shading=args.shading,
                       exact_argmin=args.exact_argmin,
                       cull_secondary=args.cull_secondary,
                       regen=_want_regen(args.regen, args.backend))
    mesh = _parse_mesh(args.mesh)
    total_rays = 0

    if args.resume:
        import dataclasses
        state, scene, camera, saved_cfg, total_rays = load_checkpoint(args.resume)
        if saved_cfg is not None:
            # Accumulation-critical fields (scene identity, geometry, RNG
            # stream) come from the checkpoint — changing them would corrupt
            # the running mean; execution knobs honor the CLI.
            for field in ("scene", "width", "height", "seed"):
                if getattr(saved_cfg, field) != getattr(cfg, field):
                    print(f"resume: --{field}={getattr(cfg, field)} ignored, "
                          f"checkpoint has {field}={getattr(saved_cfg, field)}",
                          file=sys.stderr)
            cfg = dataclasses.replace(
                saved_cfg, backend=cfg.backend, spp=cfg.spp,
                max_bounces=cfg.max_bounces, ray_chunk=cfg.ray_chunk,
                shading=cfg.shading, exact_argmin=cfg.exact_argmin,
                cull_secondary=cfg.cull_secondary,
                regen=_want_regen(args.regen, cfg.backend))
        tracer = PathTracer(cfg, scene=scene)
        tracer.camera = camera
    else:
        tracer = PathTracer(cfg)
        state = tracer.init_state()
    scene, camera = tracer.scene, tracer.camera
    if mesh is not None:
        scene = shard_scene(scene, mesh)

    log = MetricsLogger(path=args.metrics)
    kw = dict(width=cfg.width, height=cfg.height, spp=cfg.spp, seed=cfg.seed,
              max_bounces=cfg.max_bounces, backend=cfg.backend,
              ray_chunk=cfg.ray_chunk, shading=cfg.shading,
              lights=tracer.lights, exact_argmin=cfg.exact_argmin,
              cull_secondary=cfg.cull_secondary, regen=cfg.regen)

    with profiler_trace(args.profile):
        for i in range(args.passes):
            def one_pass():
                start = state.samples.astype("uint32")
                if mesh is None:
                    return render_pass(scene, camera, sample_start=start, **kw)
                return render_pass_sharded(scene, camera, mesh=mesh,
                                           sample_start=start, **kw)

            (img_sum, rays), secs = StepTimer.timed(one_pass)
            state = accumulate(state, img_sum, cfg.spp)
            total_rays += int(rays)
            log.log_pass(rays=int(rays), seconds=secs, render_pass=i,
                         samples=int(state.samples))

    write_png(args.out, jax.device_get(tracer.srgb_image(state)))
    print(f"wrote {args.out} ({int(state.samples)} spp accumulated, "
          f"{total_rays} rays)", file=sys.stderr)
    if args.checkpoint:
        save_checkpoint(args.checkpoint, state, tracer.scene, camera, cfg,
                        total_rays)
        print(f"checkpoint -> {args.checkpoint}", file=sys.stderr)
    return 0


def cmd_fit(args) -> int:
    """Inverse rendering: recover PER-SPHERE geometry and materials (and
    optionally the camera pose) from a rendered target image.

    Self-supervised demo: target = clean render of the scene; init = the
    same scene with every real sphere independently perturbed (center
    jitter, radius scale, per-channel albedo noise, emissive halved) and,
    with --fit-camera, a nudged camera. Prints the image loss AND the
    parameter-space recovery (mean |Δcenter| / |Δradius| / |Δalbedo| vs
    ground truth before and after) so the demo shows actual per-parameter
    convergence, not just a falling loss curve.

    Estimator note (MEASURED, r3): hit SELECTION is discrete
    (stop-gradient through the search, ops/intersect docstring), so the
    pathwise gradient omits silhouette terms and is exact only on pixels
    whose sample paths do not cross a discontinuity. Consequence, checked
    directly against ground truth on rtweekend at 512^2: -grad points
    toward the true parameters for 100%% of nonzero ALBEDO entries but
    only 50%% (a coin flip) of CENTER/RADIUS entries — raw-MSE geometry
    fitting is boundary-dominated and does not converge, while material
    fitting does. The default demo therefore perturbs MATERIALS (albedo,
    emissive where the scene has any); showcase result (512^2, 4 spp,
    fused+regen, 200 steps): loss 8e-2 -> 1e-6, mean |d_albedo|
    0.112 -> 0.028 (the residual is occluded spheres with no image
    signal). --perturb-geom adds geometry jitter to demonstrate the
    limitation; --fit-camera nudges and fits the camera position, which
    recovers transversely but drifts along the ill-conditioned view axis
    in a single-view fit (measured: d_camera grows while the loss falls).
    A silhouette-aware estimator (edge sampling / warped-area
    reparameterization) is the known fix for geometry and is on the
    roadmap."""
    import dataclasses
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from tpu_ray import default_camera, make_scene
    from tpu_ray.grad import image_mse, make_train_step, render_mean
    from tpu_ray.ops.tonemap import linear_to_srgb, pack_rgba8
    from tpu_ray.utils import MetricsLogger, StepTimer, write_png

    mesh = _parse_mesh(args.mesh)
    scene = make_scene(args.scene)
    camera = default_camera(scene)
    kw = dict(width=args.width, height=args.height, spp=args.spp,
              seed=args.seed, max_bounces=args.max_bounces,
              backend=args.backend, ray_chunk=args.ray_chunk,
              exact_argmin=args.exact_argmin,
              cull_secondary=args.cull_secondary,
              regen=_want_regen(args.regen, args.backend))

    # Default (--target-spp 0): the target uses the SAME spp and RNG
    # streams as training, so the Monte-Carlo noise cancels exactly and
    # the loss is 0 at the true parameters — the deterministic-recovery
    # setting (examples/04). A higher --target-spp gives a cleaner
    # picture but a noise-mismatched residual whose gradient is nonzero
    # at truth, which biases the fit (measured: geometry drifts AWAY).
    target = render_mean(scene, camera, sample_start=0, **{
        **kw, "spp": args.target_spp or args.spp})

    # per-sphere perturbations, masked so radius-0 padding stays inert
    rng = np.random.default_rng(args.seed)
    n = scene.n_pad
    real = (np.asarray(scene.radius) > 0.0)
    r_scale = float(np.mean(np.asarray(scene.radius)[real])) if real.any() \
        else 1.0
    # Geometry jitter defaults to 0: the discrete-hit estimator's
    # center/radius gradients are boundary-dominated and measured
    # direction-uncorrelated with truth (docstring above), so a geometry
    # fit drifts; --perturb-geom > 0 demonstrates exactly that.
    p = args.perturb_geom
    jit_c = rng.normal(0.0, p * 0.05 * r_scale, (n, 3)).astype(np.float32)
    jit_r = rng.uniform(1.0 - p * 0.05, 1.0 + p * 0.05, n).astype(
        np.float32)
    jit_a = rng.uniform(0.6, 1.0, (n, 3)).astype(np.float32)
    m1 = real[:, None]
    perturbed = dataclasses.replace(
        scene,
        center=scene.center + jnp.asarray(np.where(m1, jit_c, 0.0)),
        radius=scene.radius * jnp.asarray(np.where(real, jit_r, 1.0)),
        albedo=jnp.clip(scene.albedo * jnp.asarray(jit_a), 0.0, 1.0),
        emissive=scene.emissive * 0.5,
    )
    fit_camera = bool(args.fit_camera)
    cam0 = camera
    if fit_camera:
        cam0 = dataclasses.replace(
            camera, position=camera.position + 0.05 * r_scale)

    def recovery(s, cam=None):
        dc = np.abs(np.asarray(s.center - scene.center))[real].mean()
        dr = np.abs(np.asarray(s.radius - scene.radius))[real].mean()
        da = np.abs(np.asarray(s.albedo - scene.albedo))[real].mean()
        out = dict(d_center=float(dc), d_radius=float(dr),
                   d_albedo=float(da))
        if fit_camera and cam is not None:
            out["d_camera"] = float(np.abs(
                np.asarray(cam.position - camera.position)).mean())
        return out

    # Optimizer scaling, both parts measured necessary (BASELINE.md r3):
    # 1) Per-group learning rates. Adam's unit step is ~lr in PARAMETER
    #    units; world geometry lives at WorldScale = 1/16 (mean real
    #    radius r_scale ~0.013 on rtweekend) while albedo lives in [0,1]
    #    — one flat lr either freezes materials or explodes geometry
    #    (measured: lr=0.05 moved centers ~4 radii per step; every
    #    backend diverged). Geometry+camera step at lr * r_scale.
    # 2) Per-group Adam eps from the measured initial gradient RMS.
    #    72-82%% of per-sphere parameters have |g| < 1e-8 (occluded or
    #    out of frame), and with the default eps=1e-8 Adam normalizes
    #    their noise to FULL-lr random walks — mean parameter error got
    #    WORSE while the loss fell. eps = 1%% of the strong-gradient RMS
    #    makes zero-signal parameters step ~0 while visible ones keep
    #    Adam scaling. (The gradients themselves are verified correct:
    #    -grad points toward truth for 100%% of nonzero albedo entries.)
    # Optimize exactly the PERTURBED parameter groups and freeze the
    # rest: free unperturbed groups do not stay at truth, they absorb the
    # residual (measured: with albedo perturbed and emissive free, the
    # loss fell 20x while albedo stayed wrong — emissive brightened the
    # dark spheres instead; free at-truth geometry walks away on
    # boundary-noise gradients).
    def _group(path, _):
        name = next((p.name for p in reversed(path)
                     if hasattr(p, "name")), "")
        if path and getattr(path[0], "key", None) == "camera":
            # only the nudged field trains; free at-truth pose fields
            # would absorb residual like unperturbed scene groups
            return "cam" if name == "position" else "frozen"
        if name in ("center", "radius"):
            return "geom"
        return {"albedo": "alb", "emissive": "emi"}.get(name, "frozen")

    params0 = {"scene": perturbed, "camera": cam0}
    labels = jax.tree_util.tree_map_with_path(_group, params0)
    g0 = jax.grad(lambda p: image_mse(render_mean(
        p["scene"], p["camera"], sample_start=0, **kw), target))(params0)

    def _rms(group):
        tot, cnt = 0.0, 0
        for lab, g in zip(jax.tree_util.tree_leaves(labels),
                          jax.tree_util.tree_leaves(g0)):
            if lab == group:
                tot += float(jnp.sum(jnp.square(g)))
                cnt += g.size
        return (tot / max(cnt, 1)) ** 0.5

    lr_geom = args.lr * r_scale if args.perturb_geom > 0 else 0.0
    has_emissive = bool(np.any(np.asarray(scene.emissive)[real] > 0.0))
    opt = optax.multi_transform(
        {"geom": optax.adam(lr_geom,
                            eps=max(1e-2 * _rms("geom"), 1e-12)),
         # nudge is 0.05*r_scale: lr a fifth of that so Adam closes it
         # in ~10 steps instead of oscillating across it every step
         "cam": optax.adam(0.01 * r_scale,
                           eps=max(1e-2 * _rms("cam"), 1e-12)),
         "alb": optax.adam(args.lr, eps=max(1e-2 * _rms("alb"), 1e-12)),
         "emi": (optax.adam(args.lr,
                            eps=max(1e-2 * _rms("emi"), 1e-12))
                 if has_emissive else optax.set_to_zero()),
         "frozen": optax.set_to_zero()},
        labels)
    init_fn, step_fn = make_train_step(
        mesh=mesh, optimizer=opt,
        train_camera=fit_camera, fixed_samples=True, remat=True, **kw)
    state = init_fn(perturbed, cam0)

    log = MetricsLogger(path=args.metrics)
    before = recovery(perturbed, cam0)
    log.log(fit_step=-1, **before)
    loss = float("nan")
    for i in range(args.steps):
        (state, loss), secs = StepTimer.timed(step_fn, state, target)
        log.log(fit_step=i, loss=float(loss), seconds=round(secs, 4))

    after = recovery(state.scene, state.camera)
    log.log(fit_step=args.steps, **after)
    img = render_mean(state.scene, state.camera, sample_start=0, **kw)
    write_png(args.out, jax.device_get(
        pack_rgba8(linear_to_srgb(img))[::-1]))
    print(f"wrote {args.out} (final loss {float(loss):.6f})", file=sys.stderr)
    for k in before:
        print(f"  {k}: {before[k]:.6f} -> {after[k]:.6f}", file=sys.stderr)
    return 0


def cmd_animate(args) -> int:
    """Turntable orbit render: the offline equivalent of the reference's
    interactive orbit camera (reference main.cpp:730-781) — one frame per
    orbit angle, camera pose swept around the scene's look-at point."""
    import os
    import numpy as np
    import jax
    from tpu_ray import PathTracer, RenderConfig, make_scene, orbit_camera
    from tpu_ray.utils import MetricsLogger, StepTimer, write_png

    cfg = RenderConfig(scene=args.scene, width=args.width, height=args.height,
                       spp=args.spp, max_bounces=args.max_bounces,
                       backend=args.backend, seed=args.seed,
                       ray_chunk=args.ray_chunk, shading=args.shading,
                       exact_argmin=args.exact_argmin,
                       cull_secondary=args.cull_secondary,
                       regen=_want_regen(args.regen, args.backend))
    tracer = PathTracer(cfg)
    scene = tracer.scene
    os.makedirs(args.out_dir, exist_ok=True)
    log = MetricsLogger(path=args.metrics)
    for f in range(args.frames):
        angle = scene.default_x_angle + 2.0 * np.pi * f / args.frames
        camera = orbit_camera(scene.look_at, scene.default_distance,
                              angle, scene.default_y_height)
        state = tracer.init_state()

        def frame():
            s, rays = tracer.step(state, camera)
            return s, rays

        (state, rays), secs = StepTimer.timed(frame)
        path = os.path.join(args.out_dir, f"frame_{f:04d}.png")
        write_png(path, jax.device_get(tracer.srgb_image(state)))
        log.log_pass(rays=int(rays), seconds=secs, frame=f)
    print(f"wrote {args.frames} frames -> {args.out_dir}", file=sys.stderr)
    return 0


def cmd_scenes(args) -> int:
    from tpu_ray import SCENE_BUILDERS, make_scene
    for i, name in enumerate(SCENE_BUILDERS):
        s = make_scene(name)
        tri = f", {s.tris.n_real} tris" if s.tris is not None else ""
        print(f"{i}: {name:12s} {s.n_real:4d} spheres "
              f"(padded {s.n_pad}){tri}, sky={s.use_sky}")
    return 0


def cmd_bench(args, extra) -> int:
    import os
    import subprocess
    import tpu_ray
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(tpu_ray.__file__))), "bench.py")
    if not os.path.exists(bench):
        print("error: bench.py not found (run from a repo checkout)",
              file=sys.stderr)
        return 2
    return subprocess.call([sys.executable, bench, *extra])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpu-ray", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="progressive render -> PNG")
    _add_common(r)
    r.add_argument("--passes", type=int, default=1,
                   help="progressive passes (each adds spp samples)")
    r.add_argument("--out", default="out.png")
    r.add_argument("--checkpoint", default=None, help="save state npz here")
    r.add_argument("--resume", default=None, help="resume from checkpoint")

    f = sub.add_parser("fit", help="inverse-rendering optimization demo")
    _add_common(f)
    f.add_argument("--steps", type=int, default=50)
    f.add_argument("--perturb-geom", type=float, default=0.0,
                   help="geometry perturbation scale (default 0: geometry "
                        "gradients are boundary-dominated and measured "
                        "direction-uncorrelated with truth — see cmd_fit "
                        "docstring; set >0 to demonstrate)")
    f.add_argument("--lr", type=float, default=0.05)
    f.add_argument("--target-spp", type=int, default=0,
                   help="target-render spp; 0 (default) = match "
                        "--spp and its RNG streams so the loss is "
                        "0 exactly at recovery")
    f.add_argument("--fit-camera", action="store_true",
                   help="also nudge + recover the camera pose")
    f.add_argument("--out", default="fit.png")

    a = sub.add_parser("animate", help="turntable orbit -> frame PNGs")
    _add_common(a)
    a.add_argument("--frames", type=int, default=12)
    a.add_argument("--out-dir", default="frames")

    sub.add_parser("scenes", help="list built-in scenes")
    sub.add_parser("bench", help="run the headline benchmark (bench.py)")

    args, extra = ap.parse_known_args(argv)
    if extra and args.cmd != "bench":
        ap.error(f"unrecognized arguments: {' '.join(extra)}")
    if args.cmd == "render":
        return cmd_render(args)
    if args.cmd == "fit":
        return cmd_fit(args)
    if args.cmd == "animate":
        return cmd_animate(args)
    if args.cmd == "scenes":
        return cmd_scenes(args)
    if args.cmd == "bench":
        return cmd_bench(args, extra)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
