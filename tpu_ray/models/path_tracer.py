"""Flagship model: the progressive Monte-Carlo wavefront path tracer.

The reference's per-pixel recursive loop (RenderTile, main.cpp:348-495)
becomes a batched wavefront: all H*W*spp rays advance together through a
`lax.fori_loop` over bounces with an alive mask instead of `break`
(divergence -> masking, SURVEY.md §7). The 32x32 tile/thread decomposition
(main.cpp:824-827, wasm/wasm.cpp:604-694) has no analogue within a chip —
XLA owns that — and across chips becomes ray sharding (tpu_ray.parallel).

rays_cast matches the reference metric exactly: +1 per bounce-loop iteration
entered per pixel sample (main.cpp:390), i.e. the sum of the alive mask at
the top of each bounce.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpu_ray.config import RenderConfig
from tpu_ray.core import rng
from tpu_ray.core.camera import Camera, default_camera
from tpu_ray.core.scene import F32_MAX, Scene, make_scene
from tpu_ray.ops.accumulate import AccumState, accumulate
from tpu_ray.ops.intersect import (Payload, hit_payload, nearest_hit_jnp,
                                   payload_tables)
from tpu_ray.ops.raygen import camera_rays
from tpu_ray.ops.shade import scatter_direction, sky_color
from tpu_ray.ops.tonemap import linear_to_srgb, pack_rgba8

# probe(scene, origins, directions) -> Payload: nearest hit + differentiable
# attributes. Pluggable so backends (jnp / pallas) and sharded probes
# (tpu_ray.parallel: per-sphere-shard partial minima + collective select)
# slot into one bounce loop.
ProbeFn = Callable[[Scene, jax.Array, jax.Array], Payload]


def _name_hit(hit, n_prim: int):
    """Tag the search result for the 'save_hits' remat policy (below): the
    O(R*N) search is forward-only, so saving its outcome lets the backward
    pass DCE the entire search recompute. Only 3 bytes/ray survive: the hit
    MASK (the sole consumer of t is the `t < F32_MAX` miss test) and the
    winner index narrowed by the static padded primitive count `n_prim`
    (i16 below 32768 primitives, i32 beyond — e.g. a subdivision-5 icosphere
    soup has 40962 tris) — at 1080p 64spp x 5 bounces that is 2.0 GB of
    saved residuals instead of 5.3 GB, and the backward is HBM-bound on
    exactly this stream."""
    from jax.ad_checkpoint import checkpoint_name
    mask = checkpoint_name(hit.t < F32_MAX, "hit_mask")
    idx_dtype = jnp.int16 if n_prim < 2 ** 15 else jnp.int32
    idx = checkpoint_name(hit.idx.astype(idx_dtype),
                          "hit_idx").astype(jnp.int32)
    return hit._replace(idx=idx), mask


def _with_triangles(scene: Scene, origins, directions,
                    sphere_payload: Payload, tri_tables=None,
                    tri_backend: str = "jnp", alive=None) -> Payload:
    """Combine the sphere payload with the triangle soup's nearest hit.

    No-op for sphere-only scenes (scene.tris is None — a static property, so
    the branch is resolved at trace time). Triangle ids are offset by the
    sphere count into one global primitive id space. tri_backend selects the
    Möller-Trumbore search implementation (jnp, or the MXU-bilinear Pallas
    kernel, kernels/tri_intersect.py). `alive` (optional) feeds the
    streaming route's reachability lists — dead lanes stream no tiles.
    """
    if scene.tris is None:
        return sphere_payload
    from tpu_ray.ops.intersect_tri import merge_payloads, tri_payload
    from tpu_ray.kernels.bounce_step import resident_tables_fit
    if not resident_tables_fit(scene.n_pad, scene.tris.n_pad):
        # past the VMEM-residency cliff (~13k tris) every backend routes
        # to the list-driven HBM-streaming search: the jnp brute force
        # materializes [R, M] and the resident kernels need the whole
        # table in VMEM (kernels/tri_intersect.nearest_hit_tri_stream)
        from tpu_ray.kernels.tri_intersect import nearest_hit_tri_stream
        raw = nearest_hit_tri_stream(scene.tris, origins, directions,
                                     alive=alive)
    elif tri_backend == "pallas":
        from tpu_ray.kernels.tri_intersect import nearest_hit_tri_pallas
        raw = nearest_hit_tri_pallas(scene.tris, origins, directions)
    else:
        from tpu_ray.ops.intersect_tri import nearest_hit_tri_jnp
        raw = nearest_hit_tri_jnp(scene.tris, origins, directions)
    hit, mask = _name_hit(raw, scene.tris.n_pad)
    tp = tri_payload(scene.tris, origins, directions, hit, tables=tri_tables,
                     hit_mask=mask)
    return merge_payloads(sphere_payload, tp, scene.n_pad)


def probe_jnp(scene: Scene, origins, directions, tables=None,
              tri_tables=None, alive=None) -> Payload:
    """jnp-backend probe: brute-force search + payload recompute."""
    hit, mask = _name_hit(nearest_hit_jnp(scene.center, scene.radius,
                                           origins, directions), scene.n_pad)
    p = hit_payload(scene, origins, directions, hit, tables=tables,
                    hit_mask=mask)
    return _with_triangles(scene, origins, directions, p,
                           tri_tables=tri_tables, alive=alive)


def probe_pallas(scene: Scene, origins, directions, tables=None,
                 tri_tables=None, alive=None) -> Payload:
    """Pallas-backend probe: VMEM-tiled search kernels + payload recompute."""
    from tpu_ray.kernels.sphere_intersect import nearest_hit_pallas
    hit, mask = _name_hit(nearest_hit_pallas(scene.center, scene.radius,
                                             origins, directions),
                          scene.n_pad)
    p = hit_payload(scene, origins, directions, hit, tables=tables,
                    hit_mask=mask)
    return _with_triangles(scene, origins, directions, p,
                           tri_tables=tri_tables, tri_backend="pallas",
                           alive=alive)


def probe_fn_for_backend(backend: str) -> ProbeFn:
    if backend in ("jnp", "fused"):  # fused uses jnp probes off the hot path
        return probe_jnp
    if backend == "pallas":
        return probe_pallas
    raise ValueError(backend)


def tile_order(width: int, height: int, tile: int = 32):
    """Flat pixel indices permuted to 32x32-tile-major order + inverse.

    The reference's tile decomposition (main.cpp:824-838) resurrected for a
    different reason: consecutive rays in the wavefront stay spatially
    coherent, so whole ray blocks of the fused kernel die together (sky
    tiles at bounce 1) and its dead-block skip actually fires.
    """
    import numpy as np
    idx = np.arange(width * height, dtype=np.int32).reshape(height, width)
    order = []
    for ty in range(0, height, tile):
        for tx in range(0, width, tile):
            order.append(idx[ty:ty + tile, tx:tx + tile].reshape(-1))
    perm = np.concatenate(order)
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


def untile_image(color_sum, width: int, height: int, inv):
    """Tile-major [n,3] color buffer -> [H,W,3] image.

    The tile-major permutation is [Ty, Tx, yy, xx] blocks, so per tile
    ROW its inverse is a pure reshape/transpose — XLA lowers those as
    relayout copies instead of a per-row gather (measured: the
    [262144,3] gather was 2.5 ms of config 2's 5.5 ms step). A ragged
    last row (height not a 32-multiple, e.g. 1080) is just a shorter
    segment; only width must be a 32-multiple, else fall back to the
    `inv` gather (from tile_order)."""
    if width % 32 == 0:
        segs = []
        off = 0
        for y0 in range(0, height, 32):
            ht = min(32, height - y0)
            seg = color_sum[off:off + ht * width]
            segs.append(seg.reshape(width // 32, ht, 32, 3)
                        .transpose(1, 0, 2, 3).reshape(ht, width, 3))
            off += ht * width
        return jnp.concatenate(segs, axis=0)
    return color_sum[jnp.asarray(inv)].reshape(height, width, 3)


def trace_rays(scene: Scene, origins, directions, stream_base,
               max_bounces: int, probe_fn: ProbeFn, bounce_policy=None,
               unroll: bool = True, sort_rays: bool | None = None,
               collect_states: bool = False):
    """Trace a flat ray wavefront to completion.

    -> (color [R,3] linear radiance, rays_cast [R] u32).
    Bounce loop = reference main.cpp:388-482 with alive-masking.
    bounce_policy: optional jax.checkpoint policy applied PER BOUNCE so the
    reverse sweep recomputes each bounce's shading chain instead of saving
    stacked [bounces, R, 3] intermediates (pairs with 'save_hits': the
    recompute is cheap because the search is DCE'd).

    sort_rays (default: on exactly for the HBM-streaming big-mesh route):
    re-sort the wavefront at the top of every bounce by (alive,
    direction octant), stable. Post-diffuse blocks mix hemisphere
    directions, so their reachable-tile lists degrade to ~hemispheres
    (measured bigmesh bounce 1: mean reach 408/1281 tiles natural vs 205
    octant-sorted — exactly 2x); the streaming search pays DMA + MT fold
    per listed tile, so block direction coherence halves the dominant
    secondary-bounce cost. Every per-lane value rides the permutation
    (including the RNG stream base) and the output is unsorted at the
    end, so results are BIT-IDENTICAL to the unsorted trace — the sort
    only regroups lanes into blocks. Dead rays sort last, so exhausted
    blocks become all-dead and — because the alive mask feeds the
    reachability lists — stream zero tiles.

    collect_states=True additionally returns the per-bounce post-sort
    (origin, direction, alive) stacks [B,R,...] — the roofline
    measurement's input (bench.py measures the streaming route's
    DMA-byte floor from the reachability lists of exactly these states);
    never set on a timed path.
    """
    if sort_rays is None:
        from tpu_ray.kernels.bounce_step import resident_tables_fit
        sort_rays = (scene.tris is not None and
                     not resident_tables_fit(scene.n_pad,
                                             scene.tris.n_pad))

    def bounce(carry, b):
        origin, direction, atten, color, alive, rays_cast, base, slot = \
            carry
        if sort_rays:
            # 8 octants measured best end-to-end. Finer 2-bit/axis bins
            # cut bounce-1 LIST reach further (bigmesh: 408 natural /
            # 205 octants / 107 at 64 bins) yet run SLOWER at the real
            # 43200-ray slab size (1.250 vs 1.328M rays/s): 64 keys
            # across ~42 blocks fragment the stable sort's origin
            # locality, and the extra DMA'd tiles cost less than the
            # coherence lost
            octant = ((direction[:, 0] > 0.0).astype(jnp.int32) * 4
                      + (direction[:, 1] > 0.0).astype(jnp.int32) * 2
                      + (direction[:, 2] > 0.0).astype(jnp.int32))
            order = jnp.argsort(jnp.where(alive, octant, jnp.int32(8)),
                                stable=True)
            origin, direction, atten, color = (
                origin[order], direction[order], atten[order],
                color[order])
            alive, rays_cast, base, slot = (
                alive[order], rays_cast[order], base[order], slot[order])
        rays_cast = rays_cast + alive.astype(jnp.uint32)

        # aliveness feeds the streaming route's reachability lists (dead
        # lanes stream no tiles); resident searches ignore it
        p = probe_fn(scene, origin, direction, alive=alive)

        # miss: optional sky emission, then the ray dies (main.cpp:433-440)
        if scene.use_sky:
            sky_mask = (alive & ~p.hit)[..., None]
            color = color + jnp.where(sky_mask, sky_color(direction) * atten, 0.0)

        live_hit = alive & p.hit
        lh = live_hit[..., None]
        color = color + jnp.where(lh, p.emissive * atten, 0.0)
        atten = jnp.where(lh, atten * p.albedo, atten)

        rand3 = jnp.stack(
            [rng.draw_uniform(base, b, s, -1.0, 1.0, jnp) for s in range(3)],
            axis=-1,
        )
        rand_reflect = rng.draw_uniform(base, b, 3, 0.0, 1.0, jnp)
        new_dir = scatter_direction(
            direction, p.normal_raw, p.inside, p.specular, p.ior,
            rand3, rand_reflect,
        )
        new_direction = jnp.where(lh, new_dir, direction)
        new_origin = jnp.where(lh, p.next_origin, origin)
        ys = (origin, direction, alive) if collect_states else None
        return (new_origin, new_direction, atten, color, live_hit,
                rays_cast, base, slot), ys

    n = origins.shape[0]
    init = (
        origins,
        directions,
        jnp.ones((n, 3), jnp.float32),    # attenuation (main.cpp:375)
        jnp.zeros((n, 3), jnp.float32),   # output color
        jnp.ones((n,), bool),             # alive
        jnp.zeros((n,), jnp.uint32),      # rays cast
        stream_base,                      # per-ray RNG base (rides sorts)
        jnp.arange(n, dtype=jnp.int32),   # original slot (for unsorting)
    )
    # scan (not fori_loop) so the bounce loop is reverse-differentiable for
    # the inverse-rendering path (tpu_ray.grad); identical forward ops.
    if bounce_policy is not None:
        bounce = jax.checkpoint(bounce, policy=bounce_policy)
    # unroll=True: XLA fuses across consecutive bounces, cutting
    # inter-bounce HBM round-trips (measured ~1.18x fwd+bwd on unchunked
    # wavefronts; REGRESSES inside lax.map ray-chunking, so chunked traces
    # pass unroll=False)
    (_, _, _, color, _, rays_cast, _, slot), states = jax.lax.scan(
        bounce, init, jnp.arange(max_bounces, dtype=jnp.uint32),
        unroll=bool(unroll))
    if sort_rays:
        inv = jnp.argsort(slot)
        color, rays_cast = color[inv], rays_cast[inv]
    if collect_states:
        return color, rays_cast, states
    return color, rays_cast


def _trace_maybe_chunked(scene, origins, directions, base, max_bounces,
                         probe_fn, ray_chunk: Optional[int],
                         bounce_policy=None, sort_rays=None):
    if ray_chunk is None:
        return trace_rays(scene, origins, directions, base, max_bounces,
                          probe_fn, bounce_policy, unroll=True,
                          sort_rays=sort_rays)
    n = origins.shape[0]
    k = n // ray_chunk

    def one(args):
        o, d, bs = args
        return trace_rays(scene, o, d, bs, max_bounces, probe_fn,
                          bounce_policy, unroll=False,
                          sort_rays=sort_rays)

    color, rays = jax.lax.map(one, (
        origins.reshape(k, ray_chunk, 3),
        directions.reshape(k, ray_chunk, 3),
        base.reshape(k, ray_chunk),
    ))
    return color.reshape(n, 3), rays.reshape(n)


def render_pixels(scene: Scene, camera: Camera, pixel, *, width: int,
                  height: int, spp: int, sample_start, seed: int = 0,
                  max_bounces: int = 5, probe_fn: ProbeFn = probe_jnp,
                  ray_chunk: Optional[int] = None, remat: bool = False,
                  shading: str = "path", lights: tuple = (),
                  light_data=None, backend_is_fused: bool = False,
                  exact_argmin: bool = False, cull_secondary: bool = False,
                  regen: bool = False):
    """`spp` jittered samples for an arbitrary flat pixel subset.

    pixel [R] i32 flat indices (row-major). -> (color_sum [R,3] linear
    radiance summed over spp, rays_cast [] u32). This is the shard-local body
    used both single-chip (pixel = full arange) and under shard_map (pixel =
    this device's slice of the ray axis, tpu_ray.parallel).

    remat=True rematerializes the per-sample trace in the backward pass
    (recompute-instead-of-save, SURVEY.md §7 "Backward memory"): reverse-mode
    residuals drop from O(spp * bounces * R) to O(spp * R) carries.
    remat="save_hits" additionally SAVES the per-bounce nearest-hit records
    (t [R] f32 + idx [R] i32, tagged via _name_hit) so the backward pass
    dead-code-eliminates the O(R*N) search recompute entirely — the
    recompute-vs-save sweet spot: 8 bytes/ray/bounce buys back ~the full
    search cost in the backward wall time.
    """
    n = pixel.shape[0]
    if backend_is_fused and scene.tris is not None:
        from tpu_ray.kernels.bounce_step import resident_tables_fit
        if not resident_tables_fit(scene.n_pad, scene.tris.n_pad):
            # past the residency cliff the fused/regen mega-kernels would
            # stream the full tri table per ray block (O(B*M) HBM) and
            # their i16 hit records overflow beyond 32k primitives —
            # auto-route to the probe path, whose triangle search is the
            # list-driven HBM-streaming kernel (_with_triangles)
            if shading != "path":
                # the estimator kernels also need resident tables; the
                # ~2.8x-slower probe fallback must not be silent
                import warnings
                warnings.warn(
                    f"fused {shading} estimator needs VMEM-resident "
                    f"tables; {scene.tris.n_pad} padded tris exceed the "
                    "~13k residency cliff — falling back to the probe "
                    "path + streaming search (slower)", stacklevel=2)
            backend_is_fused = False
            regen = False
            probe_fn = probe_jnp
    # hoist the payload gather tables out of every scan below
    if probe_fn in (probe_jnp, probe_pallas):
        tables = payload_tables(scene)
        tri_tables = None
        if scene.tris is not None:
            from tpu_ray.ops.intersect_tri import tri_payload_tables
            tri_tables = tri_payload_tables(scene.tris)
        base_probe = probe_fn
        probe_fn = lambda sc, o, d, **k: base_probe(
            sc, o, d, tables=tables, tri_tables=tri_tables, **k)
    bounce_policy = None
    if remat == "save_hits_bounce":
        bounce_policy = jax.checkpoint_policies.save_only_these_names(
            "hit_mask", "hit_idx")
    if shading == "path" and backend_is_fused and regen:
        # Persistent-wavefront trace: all spp samples in ONE kernel loop
        # with in-lane sample regeneration (kernels/regen.py) — the
        # occupancy-waste fix. make_regen_trace carries a custom VJP whose
        # PRIMAL is the plain forward while-loop (a forward-only call pays
        # nothing extra), so this one route serves render AND gradients.
        # (Measured dead end, 2026-08-19 r3: pilot-sorted lane assignment —
        # sort pixels by a 1-sample path-length pilot so blocks hold
        # similar-length lanes. Live-block steps only drop ~8% (tile-major
        # order already groups path lengths; the block max is within-pixel
        # sample variance, not pixel mix) while the pilot+gathers cost ~6%:
        # TPU fwd 167.2M -> 156.8M. Reverted.)
        from tpu_ray.kernels.regen import make_regen_trace
        run = make_regen_trace(width, height, seed, max_bounces, spp,
                               exact_argmin=exact_argmin)
        if ray_chunk is None:
            return run(scene, camera, pixel, sample_start)
        # slab the ray axis: each slab's while_loop terminates at ITS OWN
        # slowest lane (sky-dominated slabs exhaust their samples in
        # ~1.2*spp steps, glass-heavy slabs run longer), so the whole-image
        # worst lane no longer sets the step count — and the streamed
        # state is one slab, not the full wavefront
        k = n // ray_chunk

        def one(px_slab):
            return run(scene, camera, px_slab, sample_start)

        color, rays = jax.lax.map(one, pixel.reshape(k, ray_chunk))
        return color.reshape(n, 3), jnp.sum(rays)
    if (shading in ("flat", "lambert_shadow") and backend_is_fused):
        # Fused estimator mega-kernel (kernels/simple_shade.py): in-kernel
        # raygen + search + winner gather + estimator shading (+ shadow
        # searches) for all spp samples in one launch per ray block —
        # removes the probe path's XLA payload/mask glue (measured 0.19 of
        # the op-mix floor, BASELINE config 2). Carries a custom VJP whose
        # backward re-runs the probe estimator (exact-gradient route).
        # r5: triangle soups join the folds when VMEM-resident.
        from tpu_ray.kernels.simple_shade import make_simple_trace
        run = make_simple_trace(width, height, seed, spp, shading,
                                lights=lights, exact_argmin=exact_argmin)
        if ray_chunk is None:
            return run(scene, camera, pixel, sample_start)
        k = n // ray_chunk
        color, rays = jax.lax.map(
            lambda px: run(scene, camera, px, sample_start),
            pixel.reshape(k, ray_chunk))
        return color.reshape(n, 3), jnp.sum(rays)
    if shading == "path" and backend_is_fused:
        # The fused sample carries its own custom VJP (raygen + bounce scan
        # in one boundary, saving only the [B,R] i16 hit records — the
        # 'save_hits' budget built in), so the remat wrappers below are
        # bypassed: wrapping the custom_vjp in jax.checkpoint would re-run
        # the fused search per sample in the backward.
        from tpu_ray.kernels.bounce_step import make_fused_sample
        fused_sample = make_fused_sample(width, height, seed, max_bounces,
                                         exact_argmin=exact_argmin,
                                         cull_secondary=cull_secondary)

        def sample_body(carry, s):
            color_sum, rays = carry
            color, rc = fused_sample(scene, camera, pixel, s)
            return (color_sum + color, rays + jnp.sum(rc)), None

        init = (jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.uint32))
        samples = (jnp.asarray(sample_start, jnp.uint32)
                   + jnp.arange(spp, dtype=jnp.uint32))
        (color_sum, rays), _ = jax.lax.scan(sample_body, init, samples)
        return color_sum, rays
    if shading == "path":
        trace = lambda sc, o, d, b, mb, pf, rc: _trace_maybe_chunked(
            sc, o, d, b, mb, pf, rc, bounce_policy)
    elif shading == "flat":
        from tpu_ray.ops.shading_modes import trace_flat
        trace = lambda sc, o, d, b, mb, pf, rc: trace_flat(sc, o, d, pf)
    elif shading == "lambert_shadow":
        from tpu_ray.ops.shading_modes import trace_lambert_shadow
        trace = lambda sc, o, d, b, mb, pf, rc: trace_lambert_shadow(
            sc, o, d, pf, lights, light_data)
    else:
        raise ValueError(shading)
    def sample_fn(scene, camera, pixel, s):
        o, d, base = camera_rays(camera, width, height, pixel, s, seed)
        return trace(scene, o, d, base, max_bounces, probe_fn, ray_chunk)

    # The checkpoint boundary covers raygen too, so per-sample residuals are
    # just the sample index (rays are recomputed in the backward); with
    # "save_hits" the per-bounce (t, idx) hit records are additionally saved
    # so the backward DCEs the O(R*N) search recompute.
    if remat in ("save_hits", "save_hits_bounce"):
        policy = jax.checkpoint_policies.save_only_these_names(
            "hit_mask", "hit_idx")
        sample_fn = jax.checkpoint(sample_fn, policy=policy)
    elif remat:
        sample_fn = jax.checkpoint(sample_fn)

    def sample_body(carry, s):
        color_sum, rays = carry
        color, rc = sample_fn(scene, camera, pixel, s)
        return (color_sum + color, rays + jnp.sum(rc)), None

    init = (jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.uint32))
    samples = jnp.asarray(sample_start, jnp.uint32) + jnp.arange(spp, dtype=jnp.uint32)
    (color_sum, rays), _ = jax.lax.scan(sample_body, init, samples)
    return color_sum, rays


@partial(jax.jit, static_argnames=(
    "width", "height", "spp", "max_bounces", "backend", "ray_chunk", "seed",
    "shading", "lights", "exact_argmin", "cull_secondary", "regen"))
def render_pass(scene: Scene, camera: Camera, *, width: int, height: int,
                spp: int, sample_start, seed: int = 0, max_bounces: int = 5,
                backend: str = "jnp", ray_chunk: Optional[int] = None,
                shading: str = "path", lights: tuple = (),
                exact_argmin: bool = False, cull_secondary: bool = False,
                regen: bool = False):
    """One progressive pass: `spp` jittered samples for every pixel.

    -> (image_sum [H,W,3] linear radiance summed over spp, rays_cast [] u32).
    The spp axis is a lax.scan (sample batches), the reference's
    one-pass-per-frame progressive loop collapsed into one dispatch.
    `shading` selects the estimator: 'path' (the reference algorithm),
    'flat', or 'lambert_shadow' (needs static `lights` indices — see
    ops/shading_modes.scene_light_indices).
    """
    fused = backend == "fused"
    if fused:
        # tile-major ray order makes the fused kernel dead-block skip
        # effective; unpermute once per pass (one gather per pass, not
        # per sample)
        perm, inv = tile_order(width, height)
        pixel = jnp.asarray(perm)
    else:
        pixel = jnp.arange(width * height, dtype=jnp.int32)
    color_sum, rays = render_pixels(
        scene, camera, pixel, width=width, height=height, spp=spp,
        sample_start=sample_start, seed=seed, max_bounces=max_bounces,
        probe_fn=probe_fn_for_backend(backend), ray_chunk=ray_chunk,
        shading=shading, lights=lights, backend_is_fused=fused,
        exact_argmin=exact_argmin, cull_secondary=cull_secondary,
        regen=regen)
    if fused:
        return untile_image(color_sum, width, height, inv), rays
    return color_sum.reshape(height, width, 3), rays


class PathTracer:
    """Progressive path tracer bound to a RenderConfig.

    The host-side progressive loop replaces the reference's rAF frame loop
    (wasm/wasm.cpp:176-222): each `step` folds one spp-sample pass into the
    accumulator; `srgb_image` is the displayable u8 frame.
    """

    def __init__(self, config: RenderConfig, scene: Scene | None = None):
        self.config = config
        self.scene = scene if scene is not None else make_scene(config.scene)
        self.camera = default_camera(self.scene)
        self.lights: tuple = ()
        if config.shading == "lambert_shadow":
            from tpu_ray.ops.shading_modes import scene_light_indices
            self.lights = scene_light_indices(self.scene)

    def init_state(self) -> AccumState:
        return AccumState.zeros(self.config.height, self.config.width)

    def step(self, state: AccumState, camera: Camera | None = None):
        """One progressive pass -> (new AccumState, rays_cast u32)."""
        cfg = self.config
        img_sum, rays = render_pass(
            self.scene, camera or self.camera,
            width=cfg.width, height=cfg.height, spp=cfg.spp,
            sample_start=state.samples.astype(jnp.uint32),
            seed=cfg.seed, max_bounces=cfg.max_bounces,
            backend=cfg.backend, ray_chunk=cfg.ray_chunk,
            shading=cfg.shading, lights=self.lights,
            exact_argmin=cfg.exact_argmin, cull_secondary=cfg.cull_secondary,
            regen=cfg.regen,
        )
        return accumulate(state, img_sum, cfg.spp), rays

    def srgb_image(self, state: AccumState):
        """u8 RGBA frame, rows flipped so row 0 is the image top."""
        srgb = linear_to_srgb(state.mean, exact=self.config.exact_srgb)
        return pack_rgba8(srgb)[::-1]

    def render(self, passes: int = 1, camera: Camera | None = None):
        """Host progressive loop -> (AccumState, total rays cast: int)."""
        state = self.init_state()
        total_rays = 0
        for _ in range(passes):
            state, rays = self.step(state, camera)
            total_rays += int(rays)
        return state, total_rays
