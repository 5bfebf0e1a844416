#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, 1080p 64 spp.

The metric generalizes the reference's live stats panel (avg time per ray
cast = TimeElapsed/TotalRays, reference wasm/wasm.cpp:199, main.cpp:696-703):
total rays cast (one count per bounce-loop iteration entered, exactly the
reference's counter at main.cpp:390) divided by wall time for a full
forward+backward step (render + loss + gradients w.r.t. every scene
parameter and the camera pose).

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
reported against a per-chip speed-of-light derived from the MEASURED op
mix of the fused kernels (tools/bench_bounce.py attribution, 2026-08-17,
BASELINE.md "per-kernel attribution" row) rather than a guessed flat
flop count:

  fwd bounce = max(MXU search matmul, VPU root/argmin chain) + shade+gather
    - search: the quadratic-setup matmul is ONE DEFAULT pass with the 6
      significant bf16-chunk cross products K-stacked (K=54 padded to the
      128-wide MXU) -> 2*(2*n_pad)*128 flops/ray (measured ~2.8 ms of the
      11.6 ms all-alive fwd bounce at N=512 after the K-stack rewrite —
      the VPU chain is now the binding term of the max)
    - chain: ~12 VPU ops per (ray, sphere) pair (disc/sqrt/root-select +
      packed argmin bit ops)
    - shade+gather: 3-pass bf16 one-hot gather [48,N]@[N,BR] + ~250 VPU
      shading ops per ray
  fwd+bwd adds replay (shade+gather again) + bwd (~2x shade+gather; the
  in-kernel vjp re-runs the chain forward and once transposed).

The model is per PROCESSED lane; the reported metric divides by rays CAST
(alive lanes only), so vs_baseline < 1 also prices dead-lane waste. With
the regen backend (the default on every fused route) processed ~= cast —
lanes regenerate their next sample in-kernel when a ray dies — so
vs_baseline reflects kernel efficiency, not occupancy: measured r4, fwd
runs at 0.85 of this model and fwd+bwd at 0.76 (r3: 0.65 — the segment
backward's hand-written _shade transpose + winner stash + per-block
replay bounds harvested most of its 1.6x-over-3x-shade overhang;
attribution in BASELINE.md).

Prints a PROVISIONAL JSON line as soon as the first timed step exists and
the final line after the full measurement — the last stdout line is always
the best available result, so a driver-side timeout can no longer erase the
round's headline artifact (BENCH_r03 lesson: rc=124, parsed=null, with
~150 s of the 165 s wall being compile).
"""
from __future__ import annotations

import argparse
import json
import os

import jax

_ROOT = os.path.dirname(os.path.abspath(__file__))
_ENV_PLATFORM = os.environ.get("JAX_PLATFORMS", "")
if _ENV_PLATFORM:
    # The axon TPU plugin overrides the JAX_PLATFORMS env var at import
    # time; jax.config wins over the plugin (tests/conftest.py), so honor
    # the env contract in-process — the test suite's subprocess runs pin
    # cpu this way and must never open the one-client TPU tunnel.
    jax.config.update("jax_platforms", _ENV_PLATFORM)
if "cpu" not in _ENV_PLATFORM.split(","):
    # Persistent compilation cache, committed warm from the builder's own
    # TPU runs: a cold `python bench.py` skips the ~150 s regen-VJP
    # compile entirely (measured: 34 s -> 0.3 s on a probe jit through
    # the axon tunnel).
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

# Peak per-chip throughputs. VPU: measured effective f32 elementwise ops/s
# (the isolated nearest-hit kernel sustains ~1.5e12 on v5e). MXU: published
# bf16 peak.
VPU_F32_FLOPS = {"v5e": 1.5e12, "v5p": 3.5e12, "v4": 2.1e12}
MXU_BF16_FLOPS = {"v5e": 1.97e14, "v5p": 4.59e14, "v4": 2.75e14}
SEARCH_PASSES = 1         # ONE K-stacked DEFAULT matmul (K=54 -> 128 pad)
CHAIN_OPS_PER_PAIR = 12.0  # root chain + packed argmin (VPU)
SHADE_OPS_PER_RAY = 250.0  # per-lane shading chain (VPU)
GATHER_PASSES = 3          # exact bf16-chunk one-hot gather
TRI_MXU_PER_PAIR = 768.0   # 4 MT scalars x K=96 x 2 flops per (ray, tri)
TRI_CHAIN_PER_PAIR = 12.0  # det/uv/valid/select + packed argmin (VPU)
TRI_REACH = 0.55           # dry-run FALLBACK only: measured reachable-tile
                           # fraction on the builtin trimesh scene. Real
                           # bench runs MEASURE the per-scene fraction via
                           # kernels.bounce_step.measured_tri_reach so
                           # vs_baseline stays honest for arbitrary meshes.


SHADE_OPS_SIMPLE = 60.0    # flat / lambert-shadow per-ray shading chain
                           # (albedo+emissive select, or one n.l + masks):
                           # the non-path estimators' op mix is one search
                           # + this, per CAST ray (shadow probes count)


def speed_of_light_rays_per_s(n_pad: int, chip: str, mode: str,
                              m_pad: int = 0,
                              tri_reach: float = TRI_REACH,
                              shade_ops: float = SHADE_OPS_PER_RAY) -> float:
    mxu = MXU_BF16_FLOPS.get(chip, 1.97e14)
    vpu = VPU_F32_FLOPS.get(chip, 1.5e12)
    search_s = SEARCH_PASSES * 2.0 * (2 * n_pad) * 128 / mxu
    chain_s = CHAIN_OPS_PER_PAIR * n_pad / vpu
    # triangles: the resident-table list sweep folds only the reachable
    # tiles, so the floor scales with tri_reach * m_pad, not m_pad
    tri_s = tri_reach * m_pad * (TRI_MXU_PER_PAIR / mxu
                                 + TRI_CHAIN_PER_PAIR / vpu)
    shade_s = (GATHER_PASSES * 2.0 * 48 * (n_pad + m_pad) / mxu
               + shade_ops / vpu)
    per_ray = max(search_s, chain_s) + tri_s + shade_s
    if mode == "fwd+bwd":
        per_ray += 3.0 * shade_s          # replay + bwd (measured ~0.6x fwd)
    return 1.0 / per_ray


# Per-chip HBM bandwidth (bytes/s): the streaming route's DMA floor term.
HBM_BW_BYTES = {"v5e": 8.1e11, "v5p": 2.765e12, "v4": 1.2e12}


def measure_stream_floor(scene, camera, args, ray_chunk, chip: str,
                         stride: int = 4):
    """DMA-aware speed-of-light for the HBM-streaming big-mesh route.

    The static op-mix model cannot price this route: its dominant cost is
    streaming reachable [4*block_m,128] coefficient tiles from HBM per ray
    block per bounce. This measures the ACTUAL tile traffic — it re-runs
    the exact production wavefront (tile-major order, same chunking, the
    sorted-bounce permutation, alive-aware lists) on a strided subsample
    of chunks with trace_rays(collect_states=True), rebuilds each bounce's
    reachability lists from the collected post-sort states, and counts the
    tiles every ray block would DMA. The floor is then

        max(DMA bytes / HBM bandwidth, MT fold flops as executed)
        + cast_rays * (sphere search + shade op mix)     [+3x shade bwd]

    (the DMA and the MT fold overlap inside the double-buffered kernel —
    max; the sphere search and XLA shading glue run outside it — add).
    The backward never re-runs the search (save_hits DCE / stop_gradient),
    so fwd+bwd adds only the replay+transpose shade term of the main model.

    -> (floor_rays_per_s, stats dict for the bench record)."""
    import numpy as np
    from tpu_ray.kernels.bounce_step import (list_group, tri_block_lists,
                                             tri_tile_boxes)
    from tpu_ray.models.path_tracer import probe_jnp, tile_order, trace_rays
    from tpu_ray.ops.intersect import payload_tables
    from tpu_ray.ops.intersect_tri import tri_payload_tables
    from tpu_ray.ops.raygen import camera_rays

    w, h = args.width, args.height
    n = w * h
    chunk = ray_chunk or n
    n_chunks = n // chunk
    perm, _ = tile_order(w, h)
    pixels = jnp.asarray(perm[: n_chunks * chunk]).reshape(n_chunks, chunk)
    sampled = list(range(0, n_chunks, stride)) or [0]

    block_r, block_m = 1024, 128        # nearest_hit_tri_stream defaults
    m_pad = scene.tris.n_pad
    n_tiles = m_pad // block_m
    r_pad = -(-chunk // block_r) * block_r
    n_blocks = r_pad // block_r
    grp = list_group(n_blocks, n_tiles)
    boxes = tri_tile_boxes(scene.tris, block_m)
    tables = payload_tables(scene)
    tri_tables = tri_payload_tables(scene.tris)
    probe = lambda sc, o, d, **k: probe_jnp(sc, o, d, tables=tables,
                                            tri_tables=tri_tables, **k)
    # blocks served by each list group (the kernel DMAs cnt[g] tiles per
    # BLOCK in group g)
    gsz = np.minimum(grp, n_blocks - np.arange(0, n_blocks, grp))

    @jax.jit
    def chunk_stats(px):
        o, d, base = camera_rays(camera, w, h, px, jnp.uint32(0), 0)
        _, rays_cast, (so, sd, sa) = trace_rays(
            scene, o, d, base, args.max_bounces, probe, unroll=False,
            sort_rays=True, collect_states=True)

        def per_bounce(carry, st3):
            ob, db, ab = st3
            st = jnp.zeros((16, r_pad), jnp.float32)
            st = (st.at[0:3, :chunk].set(ob.T).at[3:6, :chunk].set(db.T)
                  .at[12, :chunk].set(ab.astype(jnp.float32)))
            cnt, _ = tri_block_lists(boxes, st, block_r, grp)
            return carry + jnp.sum(cnt[:, 0] * jnp.asarray(gsz)), None

        tiles, _ = jax.lax.scan(per_bounce, jnp.zeros((), jnp.int32),
                                (so, sd, sa))
        return tiles, jnp.sum(rays_cast)

    tiles = rays = 0
    for i in sampled:
        t, rc = chunk_stats(pixels[i])
        tiles += int(t)
        rays += int(rc)
    scale = n_chunks / len(sampled) * args.spp
    tiles_step = tiles * scale
    rays_step = rays * scale

    mxu = MXU_BF16_FLOPS.get(chip, 1.97e14)
    vpu = VPU_F32_FLOPS.get(chip, 1.5e12)
    bw = HBM_BW_BYTES.get(chip, 8.1e11)
    tile_bytes = 4 * block_m * 128 * 2          # bf16, K padded to 128
    dma_s = tiles_step * tile_bytes / bw
    # MT fold as executed: one [4*block_m,128]x[128,block_r] DEFAULT
    # matmul + ~12 VPU chain ops per (ray, tri) pair, ALL lanes of the
    # block (the kernel folds whole blocks)
    mt_s = tiles_step * (2.0 * 4 * block_m * 128 * block_r / mxu
                         + TRI_CHAIN_PER_PAIR * block_m * block_r / vpu)
    shade_s = (GATHER_PASSES * 2.0 * 48 * (scene.n_pad + m_pad) / mxu
               + SHADE_OPS_PER_RAY / vpu)
    sphere_s = max(SEARCH_PASSES * 2.0 * (2 * scene.n_pad) * 128 / mxu,
                   CHAIN_OPS_PER_PAIR * scene.n_pad / vpu)
    per_ray = sphere_s + shade_s
    if args.mode == "fwd+bwd":
        # the streaming route's backward is the PROBE path (save_hits
        # DCEs the search; XLA differentiates the O(R) payload
        # recompute): at minimum one more payload-gather + transposed
        # shade pass. The fused path's 3x-shade calibration OVERPRICES
        # it (measured 1.07x "over SoL" with 3x — a floor must
        # underestimate), so the floor charges 1x.
        per_ray += shade_s
    floor_s = max(dma_s, mt_s) + rays_step * per_ray
    return rays_step / floor_s, {
        "stream_tiles_per_step": round(tiles_step),
        "stream_gb_per_step": round(tiles_step * tile_bytes / 1e9, 3),
        "stream_dma_floor_s": round(dma_s, 4),
        "stream_mt_floor_s": round(mt_s, 4),
        "stream_rays_cast_modeled": round(rays_step),
    }


def measure_tri_reach(scene, camera, args, stride: int = 4) -> float:
    """Per-scene reachable-tile fraction of the list sweep, measured on a
    strided subsample of whole ray blocks (block coherence preserved — the
    lists are per-block-group, so sampling must keep blocks intact).

    regen runs (the fused default) measure their OWN wavefront's folds
    (kernels.regen.measured_tri_reach_regen: mixed bounced + regenerated
    lanes over all spp) instead of approximating with the per-sample
    sweep — the r4 approximation inherited a primary-heavy estimate."""
    from tpu_ray.kernels.bounce_step import BLOCK_R, measured_tri_reach
    from tpu_ray.models.path_tracer import tile_order
    from tpu_ray.ops.raygen import camera_rays
    perm, _ = tile_order(args.width, args.height)
    n = perm.size - perm.size % BLOCK_R
    pixel = jnp.asarray(perm[:n]).reshape(-1, BLOCK_R)[::stride].reshape(-1)
    if getattr(args, "regen", False):
        from tpu_ray.kernels.regen import measured_tri_reach_regen
        return measured_tri_reach_regen(
            scene, camera, pixel, args.spp, 0, args.max_bounces,
            args.width, args.height)
    o, d, base = camera_rays(camera, args.width, args.height, pixel,
                             jnp.uint32(0), 0)
    return measured_tri_reach(scene, o, d, base, args.max_bounces)


def bench_scaling(args, scene, camera, kw):
    """Scaling efficiency: sharded rays/s on 1..n_devices meshes, measured
    for BOTH the forward pass and the full fwd+bwd gradient step (gradient
    psum over the ray axis included — the exact shape of the BASELINE
    north-star metric, >=85% efficiency 1 chip -> N).

    `kw` carries the RESOLVED production routing (backend, regen, chunk) —
    the same defaults bench.py's headline run uses. With one real chip this
    mode measures the sharding machinery's overhead on whatever devices
    exist (run with the virtual CPU platform for an 8-way mesh; the
    driver's dryrun covers compile-correctness of the same path).
    """
    from tpu_ray.grad import image_mse, render_mean_sharded
    from tpu_ray.parallel import make_mesh, render_pass_sharded, shard_scene
    from tpu_ray.utils.metrics import hard_timeit

    n_dev = len(jax.devices())
    # full power-of-two sweep (1/2/4/8/...): per-n rays/s characterizes how
    # host-side orchestration overhead grows with shard count — the risk
    # SURVEY.md §7 names — even where per-device efficiency is meaningless
    # (virtual CPU devices share physical cores)
    sweep = sorted({1, n_dev} | {2 ** k for k in range(1, 30)
                                 if 2 ** k < n_dev})
    target = jnp.zeros((args.height, args.width, 3), jnp.float32)
    note = None
    if jax.devices()[0].platform == "cpu":
        note = ("virtual CPU devices share physical cores: per-device "
                "efficiency is not meaningful, only the correctness of the "
                "sharded path; run on a real multi-chip slice for the "
                "true number")
    total_rays = None  # identical at every shard count (psum'd pass total)
    for mode in (("fwd", "fwd+bwd") if args.mode == "scaling"
                 else (args.mode,)):
        results = {}
        for n in sweep:
            if n in results or args.width * args.height % n:
                continue
            mesh = make_mesh((n,))
            s = shard_scene(scene, mesh)
            if mode == "fwd":
                def step(s, camera, mesh=mesh):
                    img, rays = render_pass_sharded(
                        s, camera, mesh=mesh, sample_start=0, **kw)
                    return jnp.sum(img), rays
                _, rays = step(s, camera)
                total_rays = int(rays)
            else:
                gkw = {k: v for k, v in kw.items()
                       if k not in ("shading", "lights")}

                @jax.jit
                def step(s, camera, mesh=mesh, gkw=gkw):
                    def loss_fn(s, c):
                        return image_mse(render_mean_sharded(
                            s, c, mesh=mesh, sample_start=0, **gkw), target)
                    return jax.grad(loss_fn, argnums=(0, 1))(s, camera)
                if total_rays is None:
                    _, rays = render_pass_sharded(
                        s, camera, mesh=mesh, sample_start=0, **kw)
                    total_rays = int(rays)
            dt = hard_timeit(step, s, camera, iters=args.iters)
            results[n] = total_rays / dt
        eff = (results[n_dev] / n_dev) / results[1] if n_dev > 1 else 1.0
        print(json.dumps({
            **({"note": note} if note else {}),
            "metric": f"scaling efficiency {mode} 1->{n_dev} devices "
                      f"{args.width}x{args.height} {args.spp}spp "
                      f"{args.scene}",
            "value": round(eff, 4),
            "unit": "fraction",
            "vs_baseline": round(eff / 0.85, 4),
            "backend": kw["backend"] + ("+regen" if kw.get("regen") else ""),
            **{f"rays_per_s_{n}dev": round(v, 1)
               for n, v in results.items()},
        }), flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--backend", default="fused",
                    choices=["jnp", "pallas", "fused"],
                    help="fused = custom-VJP Pallas bounce kernels (both "
                         "sweeps), the headline path")
    ap.add_argument("--mode", default="fwd+bwd",
                    choices=["fwd", "fwd+bwd", "scaling"])
    ap.add_argument("--max-bounces", type=int, default=5)
    ap.add_argument("--ray-chunk", type=int, default=0,
                    help="rays per chunk (0 = auto)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chip", default="v5e")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the resolved routing (backend, chunk, "
                         "speed of light) without rendering")
    ap.add_argument("--cull-secondary", action="store_true",
                    help="fused backend: octant-split tile culling on "
                         "secondary bounces (bit-identical A/B knob; every "
                         "TPU measurement is a LOSS — see BASELINE.md)")
    ap.add_argument("--regen", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fused backend: persistent-wavefront sample "
                         "regeneration (kernels/regen.py), fwd AND fwd+bwd "
                         "(custom VJP, segment-fused backward). Default: ON "
                         "for every fused route — r4's record-derived "
                         "gather lists + per-block replay bounds flipped "
                         "the last holdout, the triangle-soup gradient "
                         "(6.13M regen vs 5.68M without — BASELINE.md)")
    args = ap.parse_args()

    from tpu_ray import make_scene, default_camera
    from tpu_ray.models.path_tracer import render_pass
    from tpu_ray.grad import image_mse, render_mean

    scene = make_scene(args.scene)
    camera = default_camera(scene)
    n = args.width * args.height
    prims = scene.n_pad + (scene.tris.n_pad if scene.tris is not None
                           else 0)
    ray_chunk = args.ray_chunk or None
    if ray_chunk is None and n * prims > (1 << 26):
        # bound the per-dispatch [chunk, prims] intersection work; the
        # regen backend additionally gains per-slab termination (each
        # slab's while_loop ends at ITS slowest lane: trimesh fwd
        # 7.90 -> 8.66M rays/s from chunking alone). Chunk-size sweeps
        # (BASELINE.md r3): spheres 86400 > 43200 (87.7 vs 86.6M);
        # trimesh 43200 > 28800 > 86400 > 14400 (8.82/8.79/8.66/8.61M —
        # smaller slabs also sharpen the tri reachability lists, whose
        # SMEM grouping turns off below ~64 ray blocks per slab)
        sizes = (43200, 86400, 28800, 129600, 65536, 32768, 14400,
                 7200, 3600)             if scene.tris is not None else             (86400, 65536, 129600, 131072, 43200, 32768, 28800, 14400,
             7200, 3600)
        ray_chunk = next((c for c in sizes if n % c == 0),
                         None)  # None: run unchunked

    kw = dict(width=args.width, height=args.height, spp=args.spp,
              seed=0, max_bounces=args.max_bounces, backend=args.backend,
              ray_chunk=ray_chunk)
    if args.cull_secondary:
        kw["cull_secondary"] = True
    if args.regen is None:
        # measured default (BASELINE.md r4): regen wins on every route,
        # including the triangle gradient step since the segment backward
        # gained record-derived gather-tile lists + per-block step bounds
        args.regen = args.backend == "fused"
    if args.regen:
        assert args.backend == "fused", (
            "--regen is the fused persistent wavefront")
        kw["regen"] = True
    if args.mode == "scaling":
        # kw now carries the RESOLVED production routing (r4 ordering bug:
        # scaling returned before regen was added, so SCALING_r4 swept the
        # per-sample fused backend instead of the headline fused+regen path)
        return bench_scaling(args, scene, camera, kw)

    m_pad = scene.tris.n_pad if scene.tris is not None else 0
    from tpu_ray.kernels.bounce_step import resident_tables_fit
    # past the residency cliff the render auto-routes to the HBM-streaming
    # search (models/path_tracer._with_triangles); the op-mix SoL does not
    # model the DMA stream, so vs_baseline keeps the static fallback there
    tri_stream = bool(m_pad) and not resident_tables_fit(scene.n_pad, m_pad)
    if args.dry_run:
        # resolved routing only (tests check backend/chunk defaults
        # without paying a compile); tri_reach is the static fallback here
        print(json.dumps({
            "metric": f"dry-run {args.mode} {args.scene}",
            "value": 0, "unit": "rays/s", "vs_baseline": 0,
            "backend": args.backend + ("+regen" if args.regen else ""),
            "ray_chunk": ray_chunk,
            "speed_of_light_rays_per_s": round(
                speed_of_light_rays_per_s(scene.n_pad, args.chip,
                                          args.mode, m_pad), 1),
            **({"tri_reach": TRI_REACH, "tri_reach_source": "static"}
               if m_pad else {}),
            **({"tri_stream": True} if tri_stream else {}),
            "ns_per_ray": 0,
        }))
        return None

    # ONE compiled step for either mode; the rays-cast counter (the
    # reference's stats metric, main.cpp:696-703) rides along as a
    # non-differentiated output instead of costing a second fwd compile
    if args.mode == "fwd":
        @jax.jit
        def step(scene, camera):
            # scalar image reduction so the hard host-fetch sync (see below)
            # transfers bytes, not the full frame
            img, rays = render_pass(scene, camera, sample_start=0, **kw)
            return jnp.sum(img), rays
    else:
        target = jnp.zeros((args.height, args.width, 3), jnp.float32)

        @jax.jit
        def step(scene, camera):
            def loss_fn(scene, camera):
                img, rays = render_mean(scene, camera, sample_start=0,
                                        remat="save_hits", return_rays=True,
                                        **kw)
                return image_mse(img, target), rays
            (_, rays), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(scene, camera)
            return grads, rays

    def emit(dt, total_rays, tri_reach, provisional: bool,
             sol_override=None, extra=None):
        value = total_rays / dt
        sol = sol_override or speed_of_light_rays_per_s(
            scene.n_pad, args.chip, args.mode, m_pad, tri_reach)
        backend = args.backend + ("+regen" if args.regen else "")
        if tri_stream:
            # the fused/regen kernels cannot run past the residency
            # cliff; report the route actually executed
            backend = "probe+stream"
        print(json.dumps({
            "metric": f"rays/s/chip {args.mode} {args.width}x{args.height} "
                      f"{args.spp}spp {args.scene}",
            "value": round(value, 1),
            "unit": "rays/s",
            "vs_baseline": round(value / sol, 4),
            "total_rays_per_step": total_rays,
            "step_seconds": round(dt, 4),
            "ns_per_ray": round(dt / total_rays * 1e9, 3),
            "backend": backend,
            "ray_chunk": ray_chunk,
            "speed_of_light_rays_per_s": round(sol, 1),
            **({"tri_reach": round(tri_reach, 4),
                "tri_reach_source": "static" if tri_reach == TRI_REACH
                else "measured"} if m_pad and not tri_stream else {}),
            **({"tri_stream": True,
                "sol_model": "static-fallback" if sol_override is None
                else "measured-dma"} if tri_stream else {}),
            **(extra or {}),
            **({"provisional": True, "iters": 1} if provisional else {}),
        }), flush=True)

    # timing discipline: every measured edge syncs with a HARD host fetch
    # (utils.metrics.hard_timeit) — jax.block_until_ready can return early
    # through the axon tunnel (BASELINE.md "Timing-method correction"), so
    # no code path here may produce an async-optimistic number, even for
    # user-supplied small configs where steps are sub-10 ms
    import numpy as np
    from tpu_ray.utils.metrics import hard_timeit

    out = step(scene, camera)           # compile + warm up
    np.asarray(jax.tree.leaves(out)[0])
    total_rays = int(out[1])            # both modes return (payload, rays)

    # first timed step -> provisional line immediately (a driver timeout
    # during the remaining iterations still leaves a parseable tail)
    dt1 = hard_timeit(step, scene, camera, iters=1)
    emit(dt1, total_rays, TRI_REACH, provisional=True)

    # per-scene measured reachable-tile fraction for the SoL floor
    # (resident tri scenes only); the streaming route instead gets the
    # measured DMA-aware floor (tile traffic of the real wavefront)
    tri_reach = measure_tri_reach(scene, camera, args) \
        if m_pad and not tri_stream else TRI_REACH
    stream_sol, stream_stats = (None, None)
    if tri_stream:
        stream_sol, stream_stats = measure_stream_floor(
            scene, camera, args, ray_chunk, args.chip)

    dt = hard_timeit(step, scene, camera, iters=args.iters)
    emit(dt, total_rays, tri_reach, provisional=False,
         sol_override=stream_sol, extra=stream_stats)


if __name__ == "__main__":
    main()
