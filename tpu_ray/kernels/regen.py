"""Persistent-wavefront forward kernel with in-lane sample regeneration.

The occupancy problem it solves: in the per-sample bounce sweep
(kernels/bounce_step.trace_rays_fused), only 7-24% of rays are alive at
bounces 2-4 (rtweekend, measured) yet ~70% of ray blocks still hold >=1
alive ray, so the whole-block dead skip recovers little — deaths scatter
finely, and every compaction scheme (chunk partition, per-ray one-hot
permutes, octant masks) measures as a wash on TPU because moving rays costs
what the dead lanes waste (BASELINE.md "occupancy front").

This kernel removes the waste WITHOUT moving a single ray: each lane owns
ONE pixel for the whole render and cycles through that pixel's spp samples
in place. When its ray dies (miss, or the bounce budget is spent) the lane
immediately regenerates the next sample's camera ray IN-KERNEL — the
counter-based RNG (core/rng.py) makes primary-ray generation a pure
function of (pixel, sample, camera), so regeneration is ~40 VPU ops and
zero data movement. Occupancy stays ~100% until a lane exhausts all spp
samples; whole blocks then go idle and the existing dead-block skip ends
them. Per-block work drops from
    spp * (bounces where ANY lane is alive)          (~ spp * 3.4, measured)
to  max over lanes of (total bounces over spp samples)  (~ spp * 2.1-2.6)
— the statistical concentration of per-sample bounce counts over spp
samples is what the per-sample sweep can never exploit.

The reference analogue: its threads render PIXELS, not bounces — a thread
finishing a short path immediately starts the pixel's next sample
(reference main.cpp:373-388, the sample loop inside the pixel loop). This
kernel is that loop structure, vectorized: the per-sample wavefront sweep
was the transpose, and this transposes it back at full SIMD width.

Parity with make_fused_sample/trace_rays_fused: same search (shared tile
sweeps), same RNG draws (same (pixel, sample, bounce, slot) counters),
same shading chain (`_shade`), same left-fold accumulation order
(per-sample color accumulates in channels 9-11 exactly as the per-sample
sweep's state does, and flushes into the running total 16-18 once per
sample in sample order), and an op-for-op replay of the XLA raygen
(_regen_rays). The one residual: the compiler contracts FP differently in
different kernel bodies (~1-ulp scatter-direction drift), which chaotically
flips rare near-tie winners — measured 1 path in ~8k samples, same error
class as the packed argmin, so parity tests are statistical
(tests/test_regen.py).

Differentiable via `make_regen_trace` (bottom of this file): a custom VJP
whose primal is the plain forward while-loop. Under differentiation the
forward records a per-step [R] i16 winner index (-2 = whole block dead —
the backward's per-block replay-bound sentinel) plus a [24,R] state
checkpoint every `seg` steps; the backward runs ONE segment kernel per
checkpoint (`regen_seg_bwd`): a search-free forward replay of the segment
into VMEM scratch (stashing each step's gathered winner), then a reverse
sweep through the HAND-WRITTEN transpose of the shade+regen chain
(`bounce_step._shade_vjp`; camera cotangents included). Each block replays
exactly its own live step count (thi), and for tables wider than one
gather tile the replay gather + d_table scatter fold only the tiles this
block's records name (gather_tile_lists). Scene cotangents accumulate on
the winner table; camera cotangents route through the XLA raygen vjp —
exact because `_regen_rays` replays it bit-for-bit.

State layout [24, R] (f32; ch 13/21 are u32 bitcast):
   0-2  origin        3-5  direction     6-8  attenuation
   9-11 color of the CURRENT sample (matches bounce_step ch 9-11)
   12   alive (0/1)   13   rng stream base (u32 bits)
   14   sample index s_i (exact small f32)
   15   bounce index b_i within the sample (exact small f32)
   16-18 color running total over finished samples
   19   x: the lane's pixel x coordinate (exact f32)
   20   y: the lane's pixel y coordinate
   21   h1: per-(pixel, seed) hash (u32 bits); stream base of sample s is
        pcg_hash(h1 + s * MIX_SAMPLE) — core/rng.ray_base split so the
        pixel half is hoisted out of the kernel
   22   rays-cast counter (exact f32; <= spp * max_bounces <= 2^24)
   23   unused

Camera SMEM block [1, 12]: position(3) film_center(3) cam_x(3) cam_y(3);
width/height/film extent are static and baked into the kernel. The
in-kernel raygen replays ops/raygen.camera_rays' f32 op sequence EXACTLY
(_regen_rays docstring) — that, plus the shared counter RNG, is what makes
regeneration bit-identical to XLA-generated primary rays.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_MAX, Scene
from tpu_ray.kernels.bounce_step import (
    BLOCK_R, _draw, _exact_tile, _fused_tables, _gather_winner, _interpret,
    _normalize_eps3, _pack_bits, _pack_tile, _pcg_hash, _shade, _tile_roots,
    _tile_tri_t, _u32, _unpack, _use_pack, permute_scene)

_MIX_SAMPLE = 0x85EBCA6B   # core/rng.py ray_base sample mixer
_MIX_BOUNCE = 0x632BE59B


def _rand_draws_ch(st):
    """The four per-bounce draws keyed by the PER-LANE bounce channel 15
    (bounce_step._rand_draws takes the bounce as an SMEM scalar — here
    lanes sit at different bounces of different samples)."""
    base = _u32(jax.lax.stop_gradient(st[13:14, :]))
    b_u32 = pltpu.bitcast(st[15:16, :].astype(jnp.int32), jnp.uint32)
    bterm = b_u32 * jnp.uint32(_MIX_BOUNCE)
    return (_draw(base, bterm, 0, -1.0, 1.0),
            _draw(base, bterm, 1, -1.0, 1.0),
            _draw(base, bterm, 2, -1.0, 1.0),
            _draw(base, bterm, 3, 0.0, 1.0))


def _regen_rays(cam_ref, st, s_next, width: int, height: int,
                film_w: float, film_h: float):
    """In-kernel primary-ray generation for per-lane sample s_next [1,BR]
    from the wavefront state's raygen rows (19 = x, 20 = y, 21 = h1)."""
    return _lane_rays(cam_ref, st[19:20, :], st[20:21, :],
                      _u32(st[21:22, :]), s_next, width, height,
                      film_w, film_h)


def _lane_rays(cam_ref, ax, ay, h1, s_next, width: int, height: int,
               film_w: float, film_h: float):
    """In-kernel primary-ray generation for per-lane pixel (ax, ay [1,BR]
    f32), pixel hash h1 [1,BR] u32 and sample s_next [1,BR] i32.

    -> (o3 [3,BR], d3 [3,BR], base [1,BR] u32). BIT-identical to
    ops/raygen.camera_rays: same h1/sample hash split, same slot-4/5
    jitter draws, and — crucially — the exact same f32 op sequence for the
    film math and the eps-normalize (including the true divide by width
    and the 1/sqrt form of ops/vec.normalize_eps; algebraically equal
    rewrites like pre-distributed jitter coefficients or lax.rsqrt flip
    rare near-tie winners and break bit parity — measured)."""
    from tpu_ray.core.scene import F32_EPS
    base = _pcg_hash(h1 + pltpu.bitcast(s_next, jnp.uint32)
                     * jnp.uint32(_MIX_SAMPLE))
    zero = jnp.uint32(0)
    jx = _draw(base, zero, 4, -0.5, 0.5)
    jy = _draw(base, zero, 5, -0.5, 0.5)

    px, py, pz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    fcx, fcy, fcz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
    cxx, cxy, cxz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
    cyx, cyy, cyz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]

    # ops/raygen.camera_rays:31-44, op for op
    film_x = -1.0 + ((ax + jx) * 2.0) / jnp.float32(width)
    film_y = -1.0 + ((ay + jy) * 2.0) / jnp.float32(height)
    fx = film_x * jnp.float32(film_w) * 0.5
    fy = film_y * jnp.float32(film_h) * 0.5
    rx = fcx + fx * cxx + fy * cyx - px
    ry = fcy + fx * cxy + fy * cyy - py
    rz = fcz + fx * cxz + fy * cyz - pz
    lsq = rx * rx + ry * ry + rz * rz
    ok = lsq > F32_EPS
    inv = 1.0 / jnp.sqrt(jnp.where(ok, lsq, 1.0))
    zf = jnp.zeros_like(rx)
    dx = jnp.where(ok, rx * inv, zf)
    dy = jnp.where(ok, ry * inv, zf)
    dz = jnp.where(ok, rz * inv, zf)
    o3 = jnp.concatenate([jnp.full_like(dx, px), jnp.full_like(dx, py),
                          jnp.full_like(dx, pz)], axis=0)
    d3 = jnp.concatenate([dx, dy, dz], axis=0)
    return o3, d3, base


def _step_tail(cam_ref, st, idx, hit, table_ref, *, n_pad: int, m_pad: int,
               p_pad: int, use_sky: bool, max_bounces: int, width: int,
               height: int, film_w: float, film_h: float, winner=None):
    """Everything after the search: winner gather + shading + in-lane
    regeneration. st [24,BR], idx [1,BR] i32 (winner id; only read on
    hit lanes — the gather of -1 yields a zero column and `_shade` masks
    every winner-dependent row by `live`), hit [1,BR] bool.
    -> (out [24,BR], saved idx record [1,BR] i32: winner id on live lanes,
    -1 on miss/dead — the regen analogue of bounce_step's hit record).
    Shared verbatim by the forward kernel (idx/hit from the search carry)
    and the replay kernel (idx from the saved record, hit = idx >= 0), so
    replay is bit-identical to the forward by construction. `winner`
    optionally supplies a pre-gathered [16,BR] winner block (the segment
    backward gathers once and stashes it for its reverse sweep)."""
    if winner is None:
        winner, _ = _gather_winner(table_ref, idx, p_pad)
    alive = st[12:13, :] > 0.5
    live = alive & hit
    sky_mask = alive & jnp.logical_not(hit)
    is_tri = (idx >= n_pad) if m_pad else None
    rand = _rand_draws_ch(st)
    shaded = _shade(st[0:16], winner, live, sky_mask, rand, use_sky,
                    is_tri)

    # ---- regeneration (the part bounce_step has no analogue for) ----
    b_next = st[15:16, :] + 1.0
    s_i = st[14:15, :]
    # sample ends: ray died (miss), or its bounce budget is spent
    cont = live & (b_next < jnp.float32(max_bounces))
    finished = alive & jnp.logical_not(cont)
    s_next = s_i + jnp.where(finished, 1.0, 0.0)
    has_more = finished & (s_next < cam_ref[0, 12])   # s_end scalar

    # flush the finished sample's color into the running total (the
    # same one-add-per-sample left fold as the per-sample sweep)
    total = st[16:19, :] + jnp.where(finished, shaded[9:12, :], 0.0)
    color = jnp.where(finished, 0.0, shaded[9:12, :])

    o3, d3, base = _regen_rays(cam_ref, st, s_next.astype(jnp.int32),
                               width, height, film_w, film_h)
    fin3 = jnp.broadcast_to(has_more, (3, has_more.shape[1]))
    new_o = jnp.where(fin3, o3, shaded[0:3, :])
    new_d = jnp.where(fin3, d3, shaded[3:6, :])
    new_at = jnp.where(fin3, 1.0, shaded[6:9, :])
    new_alive = jnp.where(finished,
                          jnp.where(has_more, 1.0, 0.0),
                          shaded[12:13, :])
    new_base = jnp.where(has_more,
                         pltpu.bitcast(base, jnp.float32),
                         shaded[13:14, :])
    new_b = jnp.where(finished, 0.0, b_next)
    rays = st[22:23, :] + jnp.where(alive, 1.0, 0.0)

    out = jnp.concatenate([
        new_o, new_d, new_at, color, new_alive, new_base,
        s_next, new_b, total, st[19:22, :], rays, st[23:24, :],
    ], axis=0)
    return out, jnp.where(live, idx, jnp.int32(-1))


def _regen_kernel(cam_ref, state_ref, stab_ref, *refs, n_pad: int,
                  m_pad: int, p_pad: int, block_n: int, block_m: int,
                  use_sky: bool, pack: bool, max_bounces: int,
                  width: int, height: int, film_w: float, film_h: float,
                  with_idx: bool = False):
    n_tiles_s = n_pad // block_n if n_pad else 0
    n_tiles_t = m_pad // block_m if m_pad else 0
    n_tiles = n_tiles_s + n_tiles_t
    k = 0
    tri_ref = None
    if m_pad:
        tri_ref = refs[k]; k += 1
    table_ref, out_ref = refs[k:k + 2]
    k += 2
    idx_ref = None
    if with_idx:
        idx_ref = refs[k]; k += 1
    scratch = refs[k:]

    j = pl.program_id(1)
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    low_mask, miss_s = _pack_bits(p_pad)
    if pack:
        carry_s, = scratch

        @pl.when(j == 0)
        def _():
            carry_s[:] = jnp.full_like(carry_s, miss_s)
    else:
        tmin_s, idxc_s = scratch

        @pl.when(j == 0)
        def _():
            tmin_s[:] = jnp.full_like(tmin_s, F32_MAX)
            idxc_s[:] = jnp.zeros_like(idxc_s)

    # identical tile sweep to bounce_step._fwd_kernel (unculled shapes)
    if n_tiles_s:
        @pl.when(block_alive & (j < n_tiles_s))
        def _():
            tb = _tile_roots(state_ref[0:16], stab_ref, block_n)
            row0 = j * block_n
            if pack:
                carry_s[:] = jnp.minimum(
                    carry_s[:],
                    jnp.min(_pack_tile(tb, row0, low_mask), axis=0,
                            keepdims=True))
            else:
                tmin, idxc = _exact_tile(tb, row0, shift_valid=True)
                better = tmin < tmin_s[:]
                idxc_s[:] = jnp.where(better, idxc, idxc_s[:])
                tmin_s[:] = jnp.where(better, tmin, tmin_s[:])

    if n_tiles_t:
        @pl.when(block_alive & (j >= n_tiles_s))
        def _():
            tb = _tile_tri_t(state_ref[0:16], tri_ref, block_m)
            row0 = n_pad + (j - n_tiles_s) * block_m
            if pack:
                carry_s[:] = jnp.minimum(
                    carry_s[:],
                    jnp.min(_pack_tile(tb, row0, low_mask), axis=0,
                            keepdims=True))
            else:
                tmin, idxc = _exact_tile(tb, row0, shift_valid=False)
                better = tmin < tmin_s[:]
                idxc_s[:] = jnp.where(better, idxc, idxc_s[:])
                tmin_s[:] = jnp.where(better, tmin, tmin_s[:])

    @pl.when((j == n_tiles - 1) & jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]
        if with_idx:
            # -2 (vs -1 = lane miss): the whole BLOCK was dead this step —
            # the backward derives per-block replay bounds from lane 0
            idx_ref[:] = jnp.full_like(idx_ref, -2)

    @pl.when((j == n_tiles - 1) & block_alive)
    def _():
        st = state_ref[:]
        if pack:
            idx, hit = _unpack(carry_s[:], low_mask, miss_s)
        else:
            idx = idxc_s[:]
            hit = tmin_s[:] < F32_MAX
        out, rec = _step_tail(cam_ref, st, idx, hit, table_ref,
                              n_pad=n_pad, m_pad=m_pad, p_pad=p_pad,
                              use_sky=use_sky, max_bounces=max_bounces,
                              width=width, height=height, film_w=film_w,
                              film_h=film_h)
        out_ref[:] = out
        if with_idx:
            idx_ref[:] = rec


def _regen_multi_kernel(cam_ref, state_ref, stab_ref, table_ref, out_ref,
                        *maybe_idx, p_pad: int, block_n: int,
                        use_sky: bool, pack: bool, max_bounces: int,
                        width: int, height: int, film_w: float,
                        film_h: float, with_idx: bool, steps: int):
    """`steps` fused wavefront steps per launch for SINGLE-TILE scenes
    (n_tiles == 1, no triangle soup): the state stays in VMEM across the
    fused steps instead of round-tripping [24,R] through HBM per step,
    and the launch count drops `steps`-fold. Measured motivation (r5
    profile): the recording forward's 5634 launches cost ~114 ms of
    state DMA + ~tens of ms fixed overhead of the 2.87 s headline step.
    Same op sequence per sub-step as _regen_kernel (shared _step_tail);
    sub-steps on an all-dead block are identities, the per-sub-step
    record keeps the -2 whole-block-dead sentinel (aliveness checked at
    each sub-step's entry, exactly the 1-step kernel's rule), and a
    block dead at LAUNCH entry skips all compute like the 1-step
    dead-block branch. The rays counter is EXACT vs 1-step launches;
    radiance/gradients sit in the usual cross-program contraction class
    (the compiler fuses across sub-steps, ~1-ulp drift + rare near-tie
    winner flips — measured 0/2048 pixels >1e-3;
    tests/test_regen_grad.py::test_fuse_steps_bit_identical)."""
    idx_ref = maybe_idx[0] if with_idx else None
    low_mask, miss_s = _pack_bits(p_pad)
    entry_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(entry_alive))
    def _():
        out_ref[:] = state_ref[:]
        if with_idx:
            idx_ref[:] = jnp.full_like(idx_ref, -2)

    @pl.when(entry_alive)
    def _():
        st = state_ref[:]
        for s in range(steps):
            tb = _tile_roots(st[0:16], stab_ref, block_n)
            if pack:
                carry = jnp.minimum(
                    jnp.int32(miss_s),
                    jnp.min(_pack_tile(tb, 0, low_mask), axis=0,
                            keepdims=True))
                idx, hit = _unpack(carry, low_mask, miss_s)
            else:
                tmin, idx = _exact_tile(tb, 0, shift_valid=True)
                hit = tmin < F32_MAX
            alive_now = jnp.max(st[12:13, :]) > 0.5
            out, rec = _step_tail(cam_ref, st, idx, hit, table_ref,
                                  n_pad=p_pad, m_pad=0, p_pad=p_pad,
                                  use_sky=use_sky,
                                  max_bounces=max_bounces, width=width,
                                  height=height, film_w=film_w,
                                  film_h=film_h)
            st = out
            if with_idx:
                idx_ref[pl.ds(s, 1), :] = jnp.where(alive_now, rec,
                                                    jnp.int32(-2))
        out_ref[:] = st


def _regen_list_kernel(cam_ref, cnt_ref, lst_ref, state_ref, stab_ref,
                       tri_ref, table_ref, *refs, n_pad: int, m_pad: int,
                       p_pad: int, block_n: int, block_m: int,
                       use_sky: bool, pack: bool, max_bounces: int,
                       width: int, height: int, film_w: float,
                       film_h: float, group: int, with_idx: bool):
    """Persistent-wavefront step with the RESIDENT-table list sweep for
    triangle soups (the regen form of bounce_step._fwd_list_kernel): grid
    over ray blocks only, whole tri table VMEM-resident, a dynamic-trip
    fori_loop over this block group's compacted reachable-tile list
    (tri_block_lists — recomputed on the host per regen step, exactly as
    the per-sample fused path does per bounce), then the shared
    `_step_tail`. Bit-identical folds to _regen_kernel's streamed sweep."""
    out_ref = refs[0]
    idx_ref = refs[1] if with_idx else None

    n_tiles_s = n_pad // block_n if n_pad else 0
    n_tiles_t = m_pad // block_m
    low_mask, miss_s = _pack_bits(p_pad)
    i = pl.program_id(0) // group
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]
        if with_idx:
            # -2 (vs -1 = lane miss): the whole BLOCK was dead this step —
            # the backward derives per-block replay bounds from lane 0
            idx_ref[:] = jnp.full_like(idx_ref, -2)

    @pl.when(block_alive)
    def _():
        from tpu_ray.kernels.bounce_step import _tri_bk
        st = state_ref[:]
        cnt = cnt_ref[i, 0]
        br = st.shape[1]

        def tri_rows(k):
            # double clamp: k past cnt re-folds the LAST listed tile —
            # the min/strict-< folds are idempotent, so the 2x-unrolled
            # loop below needs no odd-tail handling
            tile = lst_ref[i, jnp.minimum(jnp.minimum(k, cnt - 1),
                                          n_tiles_t - 1)]
            return (tri_ref[pl.ds(tile * (4 * block_m), 4 * block_m), :],
                    n_pad + tile * block_m)

        bk = _tri_bk(st[0:16])

        if pack:
            carry = jnp.full((1, br), miss_s, jnp.int32)
            for js in range(n_tiles_s):
                stab_js = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
                tb = _tile_roots(st[0:16], stab_js, block_n)
                carry = jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, js * block_n, low_mask),
                                   axis=0, keepdims=True))

            def w_body(k, carry):
                rows, row0 = tri_rows(k)
                tb = _tile_tri_t(st[0:16], rows, block_m, bk)
                return jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, row0, low_mask),
                                   axis=0, keepdims=True))

            # 2x unroll (knee: 9.16M at 2x vs 9.19M at 4x vs 8.77M
            # rolled on config 4 regen fwd); tri_rows' cnt clamp makes
            # the odd tail a harmless duplicate fold
            def w_pair(j, carry):
                return w_body(2 * j + 1, w_body(2 * j, carry))

            carry = jax.lax.fori_loop(0, (cnt + 1) // 2, w_pair, carry)
            idx, hit = _unpack(carry, low_mask, miss_s)
        else:
            tmin = jnp.full((1, br), F32_MAX, jnp.float32)
            idxc = jnp.zeros((1, br), jnp.int32)
            for js in range(n_tiles_s):
                stab_js = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
                tb = _tile_roots(st[0:16], stab_js, block_n)
                tm, ic = _exact_tile(tb, js * block_n, shift_valid=True)
                better = tm < tmin
                idxc = jnp.where(better, ic, idxc)
                tmin = jnp.where(better, tm, tmin)

            def w_body(k, c):
                tmin, idxc = c
                rows, row0 = tri_rows(k)
                tb = _tile_tri_t(st[0:16], rows, block_m, bk)
                tm, ic = _exact_tile(tb, row0, shift_valid=False)
                better = tm < tmin
                idxc = jnp.where(better, ic, idxc)
                tmin = jnp.where(better, tm, tmin)
                return tmin, idxc

            def w_pair(j, c):
                return w_body(2 * j + 1, w_body(2 * j, c))

            tmin, idxc = jax.lax.fori_loop(0, (cnt + 1) // 2, w_pair,
                                           (tmin, idxc))
            idx = idxc
            hit = tmin < F32_MAX

        out, rec = _step_tail(cam_ref, st, idx, hit, table_ref,
                              n_pad=n_pad, m_pad=m_pad, p_pad=p_pad,
                              use_sky=use_sky, max_bounces=max_bounces,
                              width=width, height=height, film_w=film_w,
                              film_h=film_h)
        out_ref[:] = out
        if with_idx:
            idx_ref[:] = rec


def _regen_seg_kernel(cam_ref, camr_ref, chk_ref, recs_ref, table_ref,
                      dout_ref, *refs,
                      seg: int, n_pad: int, m_pad: int, p_pad: int,
                      use_sky: bool, max_bounces: int, width: int,
                      height: int, film_w: float, film_h: float,
                      use_list: bool = False, n_gt: int = 0):
    """One SEGMENT of the regen backward in a single kernel launch.

    Forward-replays `seg` steps from the segment checkpoint into VMEM
    scratch (search-free, shared `_step_tail` — states reproduce the
    recording forward's), STASHING each step's gathered winner block, then
    sweeps them in reverse through the HAND-WRITTEN transpose of the
    shade+regen chain (`_shade_vjp` — r4 replacement for the in-kernel
    jax.vjp: the linearize-then-transpose route materialized a residual
    per nonlinear op; the fused transpose recomputes each primal inline
    and consumes it immediately, and the winner stash removes the reverse
    sweep's second full-table gather entirely). The camera cotangent of
    the REGENERATED primary rays is computed in-kernel too, transposed
    against the broadcast camera rows camr_ref [16,BR] (position,
    film_center, cam_x, cam_y — the same values `_cam13` packs), so
    d_camera accumulates as per-lane rows in dcam_ref instead of a
    per-step XLA camera_rays vjp.
    vs the per-step unfused path this removes: 2 kernel launches per step,
    seg [24,R] state HBM round-trips per segment, the separate replay
    gather+shade, and seg XLA raygen re-executions — measured 2026-08-19
    (1080p64 headline): the backward-sweep time halves.

    Cotangent routing invariants (mirrors the retired per-step kernels):
    the regenerated o/d enter through where(fin3, ., shaded), so camera
    cotangents flow only on has_more lanes; st rows 19:21 (pixel coords,
    rng hash) and s_next are non-differentiable closures; the winner
    cotangent becomes this block's d_table PARTIAL (_dtable_delta),
    carried in registers and written once — dtable/dcam are per-BLOCK
    outputs summed by XLA, not a shared accumulator ref, so the grid
    dimension is parallel. (Measured wash on the headline, 87.5 vs
    87.7M: one tensor core executes grid steps sequentially either way
    and the sequential-accumulator version pipelined equally well; kept
    for the cleaner dataflow. Variant timings that motivated the probe:
    per alive block-step the search-free replay costs ~as much as the
    full searching forward step — the segment backward's 1.6x-over-
    3x-shade-model factor is real op volume, i.e. stack writes + second
    gather + vjp residual recompute, not a scheduling pathology.)

    use_list=True (big tables, p_pad > _GATHER_TILE): table_ref is the
    gather_table_rt sublane-stacked layout, refs lead with this block's
    record-derived gather-tile list (cnt/lst SMEM, gather_tile_lists),
    both gathers fold ONLY listed tiles, and the d_table partial
    accumulates in a sublane-stacked VMEM scratch (dtable_rt_to_flat on
    the host) — the trimesh-gradient fix: the full-table one-hot gathers
    were ~15 ns/lane-step at p_pad ~10.5k and winners touch only 1-3 of
    the 11 tiles."""
    from tpu_ray.kernels.bounce_step import (
        _dtable_delta, _gather_winner_list, _nrm3_bwd, _nrm3_fwd,
        _scatter_dtable_list, _shade_vjp)

    i = pl.program_id(0)
    thi_ref = refs[0]
    if use_list:
        cnt_ref, lst_ref = refs[1:3]
        dstate_ref, dtable_ref, dcam_ref, states, winners, dtab_s = refs[3:]
        cnt = cnt_ref[0, i]
        tile_at = lambda k: lst_ref[k, i]
    else:
        dstate_ref, dtable_ref, dcam_ref, states, winners = refs[1:]

    # per-block replay bound: this block's last alive step within the
    # segment + 1, derived host-side from the -2 dead-block record
    # sentinel. Steps >= thi were identities on this block (forward
    # skipped them), so the replay and the reverse sweep skip them too —
    # a block dying mid-segment (or a short trace under a long seg) no
    # longer pays tail steps; thi = 0 reduces to the old dead-block
    # branch (cotangent passes through, zero partials).
    thi = thi_ref[0, i]

    br = chk_ref.shape[1]

    def fbody(t, st):
        # reduced stash (r5): the reverse sweep reads only rows 0:16 —
        # the running total (16:18) and rays counter (22) are dead in the
        # backward, and the per-lane constants x/y/h1 (19:21) come from
        # the checkpoint. 16 rows written+read per step instead of 24.
        # (A 12-row stash — also dropping color, which is a pass-through
        # add, and the rng base, derivable as pcg_hash(h1 + s*MIX) — is
        # blocked by Mosaic: dynamic sublane stores must be provably
        # 8-aligned, and t*12 is not.)
        states[pl.ds(t * 16, 16), :] = st[0:16, :]
        idx = recs_ref[pl.ds(t, 1), :]
        if use_list:
            winner = _gather_winner_list(table_ref, idx, cnt, tile_at)
        else:
            winner, _ = _gather_winner(table_ref, idx, p_pad)
        winners[pl.ds(t * 16, 16), :] = winner
        out, _ = _step_tail(cam_ref, st, idx, idx >= 0, table_ref,
                            n_pad=n_pad, m_pad=m_pad, p_pad=p_pad,
                            use_sky=use_sky, max_bounces=max_bounces,
                            width=width, height=height, film_w=film_w,
                            film_h=film_h, winner=winner)
        return out

    if use_list:
        dtab_s[:] = jnp.zeros_like(dtab_s)

    # manual unroll (lax unroll= needs static bounds): the dynamic-trip
    # loops pay a fixed per-iteration cost; 8x measured the knee on TPU
    # (headline 95.6 -> 97.0 (2x) -> 97.3 (4x) -> 97.8M (8x)). Interpret
    # mode keeps 2x so the CPU suite still exercises the block+remainder
    # structure without 8x trace blowup.
    uf = 2 if _interpret() else 8

    def fbody_blk(k, st):
        for u in range(uf):
            st = fbody(uf * k + u, st)
        return st

    st_f = jax.lax.fori_loop(0, thi // uf, fbody_blk, chk_ref[:])
    jax.lax.fori_loop(thi // uf * uf, thi, fbody, st_f)

    def bbody_core(t2, d_st, dcam):
        t = thi - 1 - t2
        st16 = states[pl.ds(t * 16, 16), :]
        idx = recs_ref[pl.ds(t, 1), :]
        winner = winners[pl.ds(t * 16, 16), :]
        alive = st16[12:13, :] > 0.5
        live = alive & (idx >= 0)
        sky_mask = alive & jnp.logical_not(idx >= 0)
        is_tri = (idx >= n_pad) if m_pad else None
        rand = _rand_draws_ch(st16)
        # per-lane constants from the checkpoint (rows 19:21 never change)
        h1 = _u32(chk_ref[21:22, :])
        # control closures, recomputed exactly as _step_tail's
        b_next = st16[15:16, :] + 1.0
        cont = live & (b_next < jnp.float32(max_bounces))
        finished = alive & jnp.logical_not(cont)
        s_next = st16[14:15, :] + jnp.where(finished, 1.0, 0.0)
        has_more = finished & (s_next < cam_ref[0, 12])
        fin3 = jnp.broadcast_to(has_more, (3, br))
        fdone3 = jnp.broadcast_to(finished, (3, br))
        # jitter/film constants of the regenerated rays (no camera
        # dependence; same draws as _regen_rays)
        base = _pcg_hash(h1 + pltpu.bitcast(
            s_next.astype(jnp.int32), jnp.uint32)
            * jnp.uint32(_MIX_SAMPLE))
        zero_u = jnp.uint32(0)
        jx = _draw(base, zero_u, 4, -0.5, 0.5)
        jy = _draw(base, zero_u, 5, -0.5, 0.5)
        film_x = -1.0 + ((chk_ref[19:20, :] + jx) * 2.0) \
            / jnp.float32(width)
        film_y = -1.0 + ((chk_ref[20:21, :] + jy) * 2.0) \
            / jnp.float32(height)
        fx = film_x * jnp.float32(film_w) * 0.5
        fy = film_y * jnp.float32(film_h) * 0.5

        # ---- hand transpose of _step_tail's smooth rows ----
        # out rows: 0:3 where(fin3, cam_pos, shaded) / 3:6 where(fin3,
        # d3, shaded) / 6:9 where(fin3, 1, shaded) / 9:12 where(fdone3,
        # 0, shaded); total += where(fdone3, shaded[9:12], 0)
        g_out = d_st[0:12, :]
        g_tot = d_st[16:19, :]
        zf = jnp.zeros_like(g_tot[0:1, :])
        g16 = jnp.concatenate([
            jnp.where(fin3, 0.0, g_out[0:3, :]),
            jnp.where(fin3, 0.0, g_out[3:6, :]),
            jnp.where(fin3, 0.0, g_out[6:9, :]),
            jnp.where(fdone3, g_tot, g_out[9:12, :]),
            jnp.zeros((4, br), jnp.float32),
        ], axis=0)
        d_st16, d_wn = _shade_vjp(st16, winner, live, sky_mask,
                                  rand, use_sky, g16, is_tri)

        # camera cotangent of the regenerated rays: transpose of
        # d3 = normalize_eps(fc + fx cam_x + fy cam_y - pos)
        cam_b = camr_ref[:]
        g_d3 = jnp.where(fin3, g_out[3:6, :], 0.0)
        rx = cam_b[3:4] + fx * cam_b[6:7] + fy * cam_b[9:10] \
            - cam_b[0:1]
        ry = cam_b[4:5] + fx * cam_b[7:8] + fy * cam_b[10:11] \
            - cam_b[1:2]
        rz = cam_b[5:6] + fx * cam_b[8:9] + fy * cam_b[11:12] \
            - cam_b[2:3]
        nx, ny, nz, inv, ok = _nrm3_fwd(rx, ry, rz)
        d_rx, d_ry, d_rz = _nrm3_bwd(nx, ny, nz, inv, ok,
                                     g_d3[0:1, :], g_d3[1:2, :],
                                     g_d3[2:3, :])
        d_rvec = jnp.concatenate([d_rx, d_ry, d_rz], axis=0)
        dcam = dcam + jnp.concatenate([
            jnp.where(fin3, g_out[0:3, :], 0.0) - d_rvec,
            d_rvec, fx * d_rvec, fy * d_rvec,
            jnp.zeros((4, br), jnp.float32),
        ], axis=0)
        zeros5 = jnp.zeros((5, br), jnp.float32)
        return (jnp.concatenate([d_st16, g_tot, zeros5], axis=0),
                dcam, d_wn, idx)

    def bbody(t2, carry):
        d_st, dtab, dcam = carry
        d_st, dcam, d_wn, idx = bbody_core(t2, d_st, dcam)
        if use_list:
            _scatter_dtable_list(dtab_s, d_wn, idx, cnt, tile_at)
        else:
            dtab = dtab + _dtable_delta(d_wn, idx, p_pad)
        return d_st, dtab, dcam

    init = (dout_ref[:],
            jnp.zeros((1, 1), jnp.float32) if use_list
            else jnp.zeros((16, p_pad), jnp.float32),
            jnp.zeros((16, br), jnp.float32))
    # reverse sweep, same unroll: the t2 % uf remainder steps run first
    # (t2 counts DOWN from the segment end, so the remainder is the
    # segment's top steps), then thi // uf full blocks
    rem = thi % uf
    carry0 = jax.lax.fori_loop(0, rem, bbody, init)

    # (Measured dead end, r5: batching the d_table accumulation across
    # the uf unrolled steps — ONE [16, uf*BR]-lane gather-transpose
    # matmul per block instead of uf — ran 96.6 vs 97.7M AND its
    # [P, uf*BR] bf16 one-hot (8.4 MB at P=512) blew the seg=96 scoped-
    # VMEM budget: the concat moves cost more than the saved matmul-pass
    # overhead. Per-step deltas stay.)
    def bbody_blk(k, c):
        for u in range(uf):
            c = bbody(rem + uf * k + u, c)
        return c

    d0, dtab, dcam = jax.lax.fori_loop(0, thi // uf, bbody_blk, carry0)
    dstate_ref[:] = d0
    dtable_ref[:] = dtab_s[:] if use_list else dtab
    dcam_ref[:] = dcam


@functools.partial(jax.jit, static_argnames=(
    "use_sky", "block_r", "max_bounces", "exact_argmin",
    "width", "height", "with_idx", "group", "steps"))
def regen_step(cam13, table48, stab, state, tri_tab=None, tri_lists=None,
               *, use_sky: bool,
               max_bounces: int, width: int, height: int,
               block_r: int = BLOCK_R, exact_argmin: bool = False,
               with_idx: bool = False, group: int = 1, steps: int = 1):
    """One persistent-wavefront step over every ray block: search + shade
    + in-lane regeneration. cam13 [1,13] f32 (position, film_center,
    cam_x, cam_y, s_end = sample_start + spp as exact f32),
    state [24, R]. tri_lists optional (cnt [B/G,1], lst [B/G,T]) from
    tri_block_lists at group=G: routes the triangle sweep through the
    RESIDENT-table list kernel (_regen_list_kernel — bit-identical folds,
    same win as bounce_fwd_list). -> new state [24, R]; with_idx=True
    additionally returns the saved winner record [R] i32 (live winner id,
    -1 on miss/dead) for the differentiable path's replay."""
    from tpu_ray.core.camera import film_extent
    film_w, film_h = film_extent(width, height)
    p_pad = table48.shape[1]
    assert table48.shape[0] == 48 and table48.dtype == jnp.bfloat16
    r_tot = state.shape[1]
    assert state.shape[0] == 24 and r_tot % block_r == 0
    m_pad = 0 if tri_tab is None else tri_tab.shape[0] // 4
    n_pad = p_pad - m_pad
    block_n = min(n_pad, 1024)
    block_m = min(m_pad, 128) if m_pad else 128
    n_tiles_s = n_pad // block_n
    n_tiles = n_tiles_s + (m_pad // block_m if m_pad else 0)
    pack = _use_pack(p_pad, exact_argmin)

    if steps > 1:
        # fused multi-step launch (see _regen_multi_kernel): single-tile
        # sphere scenes only — a multi-tile search cannot complete inside
        # one grid step, and the tri list path rebuilds its lists in XLA
        # between steps
        assert n_tiles == 1 and m_pad == 0 and tri_lists is None, (
            "steps > 1 needs a single-tile sphere search", n_tiles, m_pad)
        out_specs = [pl.BlockSpec((24, block_r), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((24, r_tot), jnp.float32)]
        if with_idx:
            out_specs.append(pl.BlockSpec((steps, block_r),
                                          lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((steps, r_tot), jnp.int32))
        out = pl.pallas_call(
            functools.partial(
                _regen_multi_kernel, p_pad=p_pad, block_n=block_n,
                use_sky=use_sky, pack=pack, max_bounces=max_bounces,
                width=width, height=height, film_w=float(film_w),
                film_h=float(film_h), with_idx=with_idx, steps=steps),
            grid=(r_tot // block_r,),
            in_specs=[
                pl.BlockSpec((1, 13), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((24, block_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * n_pad, 54), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((48, p_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs if with_idx else out_specs[0],
            out_shape=out_shape if with_idx else out_shape[0],
            input_output_aliases={1: 0},     # state updates in place
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(cam13, state, stab, table48)
        if with_idx:
            return out[0], out[1]            # records [steps, R]
        return out

    if tri_lists is not None:
        assert m_pad and block_m == 128, (m_pad, block_m)
        n_blocks = r_tot // block_r
        n_groups = -(-n_blocks // group)
        cnt, lst = tri_lists
        n_tiles_t = m_pad // block_m
        assert cnt.shape == (n_groups, 1), (cnt.shape, n_groups)
        assert lst.shape == (n_groups, n_tiles_t), lst.shape
        out_specs = [pl.BlockSpec((24, block_r), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((24, r_tot), jnp.float32)]
        if with_idx:
            out_specs.append(pl.BlockSpec((1, block_r), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((1, r_tot), jnp.int32))
        out = pl.pallas_call(
            functools.partial(
                _regen_list_kernel, n_pad=n_pad, m_pad=m_pad, p_pad=p_pad,
                block_n=block_n, block_m=block_m, use_sky=use_sky,
                pack=pack, max_bounces=max_bounces, width=width,
                height=height, film_w=float(film_w), film_h=float(film_h),
                group=group, with_idx=with_idx),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 13), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_groups, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_groups, n_tiles_t), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((24, block_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * n_pad, 54), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * m_pad, 96), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((48, p_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs if with_idx else out_specs[0],
            out_shape=out_shape if with_idx else out_shape[0],
            input_output_aliases={3: 0},     # state updates in place
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(cam13, cnt, lst, state, stab, tri_tab, table48)
        if with_idx:
            return out[0], out[1][0]
        return out

    tri_in, tri_spec = [], []
    if m_pad:
        tri_in = [tri_tab]
        tri_spec = [pl.BlockSpec(
            (4 * block_m, 96),
            lambda i, j: (jnp.clip(j - n_tiles_s, 0,
                                   m_pad // block_m - 1), 0),
            memory_space=pltpu.VMEM)]
    if pack:
        scratch = [pltpu.VMEM((1, block_r), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((1, block_r), jnp.float32),
                   pltpu.VMEM((1, block_r), jnp.int32)]

    out_specs = [pl.BlockSpec((24, block_r), lambda i, j: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((24, r_tot), jnp.float32)]
    if with_idx:
        out_specs.append(pl.BlockSpec((1, block_r), lambda i, j: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, r_tot), jnp.int32))
    out = pl.pallas_call(
        functools.partial(_regen_kernel, n_pad=n_pad, m_pad=m_pad,
                          p_pad=p_pad, block_n=block_n, block_m=block_m,
                          use_sky=use_sky, pack=pack,
                          max_bounces=max_bounces, width=width,
                          height=height, film_w=float(film_w),
                          film_h=float(film_h), with_idx=with_idx),
        grid=(r_tot // block_r, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 13), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((24, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_n, 54),
                         lambda i, j: (jnp.minimum(j, n_tiles_s - 1), 0),
                         memory_space=pltpu.VMEM),
            *tri_spec,
            pl.BlockSpec((48, p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if with_idx else out_specs[0],
        out_shape=out_shape if with_idx else out_shape[0],
        scratch_shapes=scratch,
        # the state buffer updates in place (input 1 -> output 0): the
        # persistent-wavefront while loop otherwise pays one [24,R] HBM
        # copy per step (measured 143 ms of the 1080p64 headline step)
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(cam13, state, stab, *tri_in, table48)
    if with_idx:
        return out[0], out[1][0]
    return out


@functools.partial(jax.jit, static_argnames=(
    "seg", "use_sky", "block_r", "max_bounces", "width", "height", "m_pad",
    "n_pad"))
def regen_seg_bwd(cam13, cam16, table48, chk, recs, d_out, thi,
                  gather_lists=None, *, seg: int,
                  use_sky: bool, max_bounces: int, width: int, height: int,
                  m_pad: int = 0, block_r: int = BLOCK_R,
                  n_pad: int | None = None):
    """Reverse of one `seg`-step segment from its checkpoint state.

    cam16 [16, block_r]: the 12 `_cam13` basis values broadcast across
    lanes (+4 zero rows) — the differentiable camera operand. chk [24,R]
    segment checkpoint, recs [seg,R] i32 winner records, d_out [24,R]
    cotangent at the segment END. thi [1, B] i32: per-block last-alive
    step + 1 within this segment (from the -2 record sentinel) — the
    replay/reverse loops run exactly that many steps per block.
    -> (d_state at segment START [24,R],
    d_table PARTIALS [B*16,P] — one [16,P] row block per ray block,
    reduce with _sum_blocks; d_camrows PARTIALS [B*16,block_r] likewise,
    then sum over lanes and feed the `_cam13`-rows vjp). Per-block
    partial outputs keep the grid parallel (kernel docstring).

    gather_lists (cnt [B,1], lst [B,n_gt] from gather_tile_lists): list-
    driven gathers for big tables — table48 must then be the
    gather_table_rt layout [n_gt*48, GT], and the d_table partials come
    back sublane-stacked ([B*n_gt*16, GT]; reassemble per block with
    dtable_rt_to_flat)."""
    from tpu_ray.core.camera import film_extent
    from tpu_ray.kernels.bounce_step import _GATHER_TILE
    film_w, film_h = film_extent(width, height)
    use_list = gather_lists is not None
    r_tot = chk.shape[1]
    n_blocks = r_tot // block_r
    m_pad = int(m_pad)
    if use_list:
        cnt, lst = gather_lists
        n_gt = lst.shape[0]
        assert table48.shape == (n_gt * 48, _GATHER_TILE), table48.shape
        # the padded id space: the true sphere/tri split must come in via
        # n_pad (p_pad - m_pad would misplace the is_tri boundary)
        assert n_pad is not None, "use_list needs the true n_pad"
        p_pad = n_gt * _GATHER_TILE
        assert cnt.shape == (1, n_blocks) and lst.shape == (n_gt, n_blocks)
        list_in = [cnt, lst]
        list_specs = [
            pl.BlockSpec((1, n_blocks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_gt, n_blocks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        table_spec = pl.BlockSpec((n_gt * 48, _GATHER_TILE),
                                  lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        dtab_rows, dtab_cols = n_gt * 16, _GATHER_TILE
        extra_scratch = [pltpu.VMEM((n_gt * 16, _GATHER_TILE), jnp.float32)]
    else:
        p_pad = table48.shape[1]
        n_gt = 0
        list_in, list_specs = [], []
        table_spec = pl.BlockSpec((48, p_pad), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        dtab_rows, dtab_cols = 16, p_pad
        extra_scratch = []
    return pl.pallas_call(
        functools.partial(_regen_seg_kernel, seg=seg,
                          n_pad=(p_pad - m_pad) if n_pad is None else n_pad,
                          m_pad=m_pad, p_pad=p_pad, use_sky=use_sky,
                          max_bounces=max_bounces, width=width,
                          height=height, film_w=float(film_w),
                          film_h=float(film_h), use_list=use_list,
                          n_gt=n_gt),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 13), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((seg, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            table_spec,
            pl.BlockSpec((24, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *list_specs,
        ],
        out_specs=[
            pl.BlockSpec((24, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # per-BLOCK d_table / d_cam partials (row block i): no shared
            # accumulator, so the grid dimension stays parallel
            pl.BlockSpec((dtab_rows, dtab_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((24, r_tot), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * dtab_rows, dtab_cols),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 16, block_r), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((seg * 16, block_r), jnp.float32),
                        pltpu.VMEM((seg * 16, block_r), jnp.float32),
                        *extra_scratch],
        # the segment cotangent updates in place (d_out input 5 ->
        # d_state output 0): one [24,R] HBM copy per segment saved in
        # the reverse scan
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(cam13, cam16, chk, recs, table48, d_out, thi, *list_in)


def _sum_blocks(x, rows: int):
    """[B*rows, C] per-block partials -> [rows, C] total."""
    return x.reshape(-1, rows, x.shape[1]).sum(axis=0)


def _cam13(camera, s_end):
    """Traced camera basis + sample end -> [1,13] f32 SMEM operand:
    position(3), film_center(3), cam_x(3), cam_y(3), s_end (exact f32;
    lanes exhaust when their sample index reaches it). Film extent and
    width/height are static and baked into the kernel."""
    cam_x, cam_y, _, film_center = camera.basis()
    return jnp.concatenate([
        camera.position, film_center, cam_x, cam_y,
        jnp.asarray(s_end, jnp.float32).reshape(1),
    ]).reshape(1, 13).astype(jnp.float32)


def _wave_init(camera, pixel, spp: int, seed: int, sample_start,
               width: int, height: int, block_r: int):
    """Initial persistent-wavefront state (module-docstring layout) for the
    pixel set: sample `sample_start` primary rays from the XLA raygen +
    the per-lane regeneration constants. -> (st [24,r_pad], cam13, r)."""
    from tpu_ray.core import rng
    from tpu_ray.ops.raygen import camera_rays

    r = pixel.shape[0]
    r_pad = -(-r // block_r) * block_r

    s0 = jnp.asarray(sample_start, jnp.uint32)
    o, d, base0 = camera_rays(camera, width, height, pixel, s0, seed)
    # per-lane raygen constants: raw pixel coordinates (the kernel
    # replays camera_rays' film math op for op) + the pixel-half hash
    ax = (pixel % width).astype(jnp.float32)
    ay = (pixel // width).astype(jnp.float32)
    h1 = rng.pcg_hash(pixel.astype(jnp.uint32)
                      * jnp.uint32(0x9E3779B1)
                      ^ jnp.uint32(int(seed) & 0xFFFFFFFF), jnp)

    st = jnp.zeros((24, r_pad), jnp.float32)
    st = st.at[0:3, :r].set(o.T)
    st = st.at[3:6, :r].set(d.T)
    st = st.at[6:9, :r].set(1.0)
    st = st.at[12, :r].set(1.0)
    st = st.at[13, :r].set(
        jax.lax.bitcast_convert_type(base0, jnp.float32))
    st = st.at[14, :r].set(s0.astype(jnp.float32))
    st = st.at[19, :r].set(ax)
    st = st.at[20, :r].set(ay)
    st = st.at[21, :r].set(
        jax.lax.bitcast_convert_type(h1, jnp.float32))
    s_end = s0.astype(jnp.float32) + jnp.float32(spp)
    # padding lanes: s_i = s_end marks them exhausted from step 0
    if r_pad > r:
        st = st.at[14, r:].set(s_end)
    return st, _cam13(camera, s_end), r


def _list_mode(tb, r_pad: int, block_r: int):
    """-> (use_list, group) for the resident-table tri list sweep."""
    from tpu_ray.kernels.bounce_step import (_TRI_TILE, list_group,
                                             resident_tables_fit)
    if not (tb["m_pad"] and resident_tables_fit(tb["n_pad"], tb["m_pad"])):
        return False, 1
    return True, list_group(r_pad // block_r, tb["m_pad"] // _TRI_TILE)


def _step_lists(tb, st, block_r: int, group: int):
    """Per-regen-step reachable-tile lists from the live state (the regen
    analogue of the per-bounce lists in bounce_step's fused path)."""
    from tpu_ray.kernels.bounce_step import tri_block_lists
    return tri_block_lists(tb["tri_boxes"], st[0:16], block_r, group)


# (Measured dead end, 2026-08-20 r4: a SPHERE reachability-list sweep —
# the exact tri machinery applied to 32/64/128-sphere tiles of the
# rtweekend table, sph_tile_boxes + tri_block_lists + a
# _regen_sph_list_kernel mirroring _regen_list_kernel's dynamic-trip
# fori over a VMEM-resident tile-major search table, bit-identical fwd
# AND grads on CPU interpret. Host-side list building fuses into the
# step for free (0.670 vs 0.672 ms/step) and mean block reach measured
# 0.60/0.74/0.85 at tiles 32/64/128 — but the TPU fwd headline LOST at
# every tile size: 160.8/163.4/164.2M vs 170.5M streamed. The sphere
# chain is only ~12 VPU ops per (ray, sphere) pair, so skipping
# 15-40% of pairs saves less than the ~88 ns/tile-iteration the
# dynamic-slice loop costs; triangles win the same trade because each
# pair carries 768 MXU flops + chain and reach is 0.55. Reverted —
# spheres keep the straight-line one-tile resident sweep.)


def _fuse_steps(tb) -> int:
    """Wavefront steps fused per regen_step launch (single-tile sphere
    scenes only — see _regen_multi_kernel). Env TPU_RAY_REGEN_FUSE
    overrides the measured default: 8 is the knee of the r5 headline
    sweep (fuse 1/2/4/8/16/32 -> 97.7/98.5/100.1/100.6/92.0/94.3M
    rays/s) — past it the intra-launch waste takes over, because the
    dead-block skip coarsens from per-step to per-launch: a block whose
    lanes exhaust at sub-step k pays fuse-k-1 identity sub-steps (the r4
    lesson that guarded-off bodies are not free rules out per-sub-step
    conds). Interpret mode keeps 2 so the CPU suite exercises the fused
    structure without the trace blowup."""
    if tb["m_pad"] or tb["n_pad"] > 1024:
        return 1
    return max(1, int(os.environ.get("TPU_RAY_REGEN_FUSE",
                                     "2" if _interpret() else "8")))


def measured_tri_reach_regen(scene: Scene, camera, pixel, spp: int,
                             seed: int, max_bounces: int, width: int,
                             height: int, sample_start=0,
                             block_r: int = BLOCK_R) -> float:
    """Measured reachable-tile fraction of the REGEN wavefront's resident
    list sweep: (tile folds performed) / (live block-group steps * tiles).

    The r4 bench approximated regen runs with the per-sample sweep's
    reach (bounce_step.measured_tri_reach), inheriting a primary-heavy
    estimate (VERDICT r4 weak item 5); this runs the actual
    persistent-wavefront loop — mixed bounced + regenerated lanes, the
    same _step_lists the production kernel folds — so the SoL floor's
    tri term prices exactly the folds a regen run pays."""
    from tpu_ray.kernels.bounce_step import _TRI_TILE
    scene = permute_scene(scene)
    tb = _fused_tables(scene)
    assert tb["m_pad"] > 0, "sphere-only scene has no tri reach"
    st0, cam13, r = _wave_init(camera, pixel, spp, seed, sample_start,
                               width, height, block_r)
    use_list, grp = _list_mode(tb, st0.shape[1], block_r)
    assert use_list, "regen tri reach needs the resident list mode"
    n_tiles = tb["m_pad"] // _TRI_TILE
    k_max = spp * max_bounces

    @jax.jit
    def sweep(st):
        def cond(c):
            st, t, _, _ = c
            return (t < k_max) & (jnp.max(st[12, :]) > 0.5)

        def body(c):
            st, t, folds, gsteps = c
            lists = _step_lists(tb, st, block_r, grp)
            folds = folds + jnp.sum(lists[0].astype(jnp.float32))
            alive_b = jnp.any((st[12] > 0.5).reshape(-1, block_r), axis=1)
            pad = (-alive_b.shape[0]) % grp
            if pad:
                alive_b = jnp.concatenate(
                    [alive_b, jnp.zeros((pad,), bool)])
            alive_g = alive_b.reshape(-1, grp).any(axis=1)
            gsteps = gsteps + jnp.sum(alive_g.astype(jnp.float32))
            st = regen_step(cam13, tb["t48"], tb["stab_full"], st,
                            tb["tri_full"], lists, use_sky=scene.use_sky,
                            max_bounces=max_bounces, width=width,
                            height=height, block_r=block_r, group=grp)
            return st, t + 1, folds, gsteps

        _, _, folds, gsteps = jax.lax.while_loop(
            cond, body, (st, jnp.int32(0), jnp.zeros((), jnp.float32),
                         jnp.zeros((), jnp.float32)))
        return folds, gsteps

    folds, gsteps = sweep(st0)
    return float(folds) / (max(float(gsteps), 1.0) * n_tiles)


def make_trace_regen(width: int, height: int):
    """Persistent-wavefront spp-sample trace bound to a film size
    (width/height are film-math statics, mirroring ops/raygen.camera_rays).

    -> run(scene, camera, pixel, spp, seed, max_bounces, ...) giving
    (color_sum [R,3] summed over spp, rays_cast [] u32 — the reference
    counter). pixel [R] i32 flat indices (tile-major for block coherence,
    exactly as render_pass feeds the fused backend). Forward-only;
    bit-identical totals to the per-sample fused sweep (module docstring).
    For gradients use `make_regen_trace` (custom VJP, identical forward).
    """
    def run(scene: Scene, camera, pixel, spp: int, seed: int,
            max_bounces: int, sample_start=0, block_r: int = BLOCK_R,
            exact_argmin: bool = False):
        scene = permute_scene(scene)
        tb = _fused_tables(scene)
        st, cam13, r = _wave_init(camera, pixel, spp, seed, sample_start,
                                  width, height, block_r)
        k_max = spp * max_bounces
        use_list, grp = _list_mode(tb, st.shape[1], block_r)
        fuse = _fuse_steps(tb)

        def cond(carry):
            st, t = carry
            return (t < k_max) & (jnp.max(st[12, :]) > 0.5)

        def body(carry):
            st, t = carry
            st = regen_step(cam13, tb["t48"], tb["stab_full"], st,
                            tb["tri_full"],
                            _step_lists(tb, st, block_r, grp) if use_list
                            else None,
                            use_sky=scene.use_sky,
                            max_bounces=max_bounces,
                            width=width, height=height,
                            block_r=block_r, exact_argmin=exact_argmin,
                            group=grp, steps=fuse)
            return st, t + fuse

        st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
        color = st[16:19, :r].T
        rays = jnp.sum(st[22, :r].astype(jnp.uint32))
        return color, rays

    return run


@functools.lru_cache(maxsize=None)
def make_regen_trace(width: int, height: int, seed: int, max_bounces: int,
                     spp: int, block_r: int = BLOCK_R,
                     exact_argmin: bool = False, seg: int | None = None):
    """Differentiable persistent-wavefront trace: (scene, camera, pixel, s0)
    -> (color_sum [R,3], rays_cast [] u32), with a custom VJP.

    The PRIMAL is exactly `make_trace_regen`'s while-loop (so a forward-only
    call pays nothing extra). Under differentiation the forward instead
    records, per step, the [R] i16 winner record (regen analogue of
    bounce_step's save_hits residual) plus a [24,R] state CHECKPOINT every
    `seg` steps; the backward walks segments in reverse, ONE
    `regen_seg_bwd` kernel per segment: a search-free forward replay of
    the segment into VMEM scratch (states never touch HBM), then a
    reverse sweep through the in-kernel jax.vjp of the shade+regen chain.
    Scene cotangents accumulate on the winner table ([16,P], MXU scatter)
    and flow out through prim_table's vjp; camera cotangents of the
    REGENERATED rays accumulate in-kernel as per-lane rows against the
    broadcast camera basis (exact: the kernel re-expresses the same
    raygen ops), and the sample-s0 rays of the initial state route
    through the XLA raygen vjp once.

    Residual budget per trace: k_max*R i16 records + ceil(k_max/seg)
    [24,R] f32 checkpoints; the backward's transient is one seg-deep
    VMEM state stack per ray block. Steps past the forward's termination
    point are all-dead and the segment kernel skips them as identities,
    so the reverse sweep does the same live work the forward did — the
    occupancy win carries to the whole fwd+bwd step. seg default 64
    (env TPU_RAY_REGEN_SEG overrides): before the r4 per-block replay
    bounds, longer segments wasted tail steps past t_final and seg=16
    measured best (2026-08-19: 83.7M vs 83.5M seg=32, 81.9M seg=64);
    with thi bounds the tail cost is gone and fewer checkpoints win
    (2026-08-20 headline: 93.5M seg=16, 94.3M seg=32, 95.5M seg=64,
    95.5M seg=80, seg=96 exceeds the 16 MB scoped-VMEM stack; config 3
    k_max=80: 103.5M seg=64 vs 103.3M seg=16, seg=80 VMEM-OOMs at the
    unchunked r_pad).
    """
    from tpu_ray.kernels.bounce_step import prim_table, table_chunks
    from tpu_ray.ops.raygen import camera_rays

    k_max = spp * max_bounces
    if seg is None:
        seg = int(os.environ.get("TPU_RAY_REGEN_SEG", "64"))
    # short traces (k_max < seg): clamp so the one segment kernel does not
    # replay seg - k_max pure-tail steps on every alive block (spp 2 at 5
    # bounces under the default seg=16 was paying 16 steps for <=10)
    seg = min(seg, k_max)
    n_seg = max(1, -(-k_max // seg))
    k_pad = n_seg * seg

    def _run_fast(scene, camera, pixel, s0):
        run = make_trace_regen(width, height)
        return run(scene, camera, pixel, spp, seed, max_bounces,
                   sample_start=s0, block_r=block_r,
                   exact_argmin=exact_argmin)

    @jax.custom_vjp
    def regen_trace(scene, camera, pixel, s0):
        return _run_fast(scene, camera, pixel, s0)

    def fwd(scene, camera, pixel, s0):
        scene_p = permute_scene(scene)
        tb = _fused_tables(scene_p)
        assert tb["n_pad"] + tb["m_pad"] < 2 ** 15, (
            "saved winner records are i16", tb["n_pad"], tb["m_pad"])
        st, cam13, r = _wave_init(camera, pixel, spp, seed, s0,
                                  width, height, block_r)
        r_pad = st.shape[1]
        use_list, grp = _list_mode(tb, r_pad, block_r)
        # fused multi-step recording: checkpoint boundaries must land on
        # fuse strides, so drop to the largest divisor of seg (a short
        # trace with seg=min(64, k_max)=20 keeps fuse=4 instead of 1)
        fuse = _fuse_steps(tb)
        while seg % fuse:
            fuse //= 2
        ib = jnp.full((k_pad, r_pad), -2, jnp.int16)
        cb = jnp.zeros((n_seg, 24, r_pad), jnp.float32)

        def cond(carry):
            st, t, _, _ = carry
            return (t < k_max) & (jnp.max(st[12, :]) > 0.5)

        def body(carry):
            st, t, ib, cb = carry
            cb = jax.lax.cond(
                t % seg == 0,
                lambda cb: jax.lax.dynamic_update_slice(
                    cb, st[None], (t // seg, 0, 0)),
                lambda cb: cb, cb)
            st2, rec = regen_step(
                cam13, tb["t48"], tb["stab_full"], st, tb["tri_full"],
                _step_lists(tb, st, block_r, grp) if use_list else None,
                use_sky=scene_p.use_sky, max_bounces=max_bounces,
                width=width, height=height, block_r=block_r,
                exact_argmin=exact_argmin, with_idx=True, group=grp,
                steps=fuse)
            rec = rec.astype(jnp.int16)
            ib = jax.lax.dynamic_update_slice(
                ib, rec if rec.ndim == 2 else rec[None, :], (t, 0))
            return st2, t + fuse, ib, cb

        st, t_final, ib, cb = jax.lax.while_loop(
            cond, body, (st, jnp.int32(0), ib, cb))
        color = st[16:19, :r].T
        rays = jnp.sum(st[22, :r].astype(jnp.uint32))
        return (color, rays), (scene, camera, pixel, s0, ib, cb, t_final)

    def bwd(res, cts):
        scene, camera, pixel, s0, ib, cb, t_final = res
        d_color, _ = cts                     # rays_cast is integer: no ct
        r = pixel.shape[0]
        r_pad = ib.shape[1]
        use_sky = scene.use_sky
        m_pad = scene.tris.n_pad if scene.tris is not None else 0
        # same deterministic permutation as the forward: records live in
        # Morton order; d_table scatters back through the permutation vjp
        table, table_vjp = jax.vjp(
            lambda sc: prim_table(permute_scene(sc)), scene)
        t48 = table_chunks(table)
        s_end = jnp.asarray(s0, jnp.float32) + jnp.float32(spp)
        cam13 = _cam13(camera, s_end)

        # differentiable camera rows (the kernel's cam_b operand): the 12
        # _cam13 basis values broadcast across one ray block
        def rows_fn(cam):
            cam_x, cam_y, _, film_center = cam.basis()
            return jnp.concatenate([cam.position, film_center, cam_x,
                                    cam_y, jnp.zeros(4, jnp.float32)])

        rows16, rows_vjp = jax.vjp(rows_fn, camera)
        # Large soups: the segment kernel's unrolled one-hot gather tiles
        # are [_GATHER_TILE, block_r] bf16 x ceil(P/tile) with no Mosaic
        # stack reuse across the replay and the vjp — 30.5 MB scoped vmem
        # at p_pad ~10k (measured OOM; same class as bounce_bwd's). A
        # narrower backward ray block shrinks every one-hot 4x.
        br_bwd = block_r if t48.shape[1] <= 4096 else min(block_r, 256)
        cam16 = jnp.broadcast_to(rows16.reshape(16, 1), (16, br_bwd))

        # Big tables: record-derived gather-tile lists (the winners of a
        # (segment, block) cluster in 1-3 of the ceil(P/1024) gather tiles
        # — Morton scene order x tile-major rays), so both segment-kernel
        # gathers and the d_table scatter fold only listed tiles.
        from tpu_ray.kernels.bounce_step import (
            _GATHER_TILE, dtable_rt_to_flat, gather_table_rt,
            gather_tile_lists)
        p_pad = t48.shape[1]
        n_gt = -(-p_pad // _GATHER_TILE)
        use_list = n_gt > 1
        if use_list:
            t48k = gather_table_rt(t48, n_gt)
            cnt_all, lst_all = gather_tile_lists(
                ib.astype(jnp.int32).reshape(n_seg, seg, r_pad),
                br_bwd, n_gt)
            n_pad_true = scene.n_pad

        d_st = jnp.zeros((24, r_pad), jnp.float32)
        d_st = d_st.at[16:19, :r].set(d_color.T)

        # per-(segment, block) replay bounds from the -2 dead-block
        # sentinel: lane 0 of a block reads >= -1 iff the block was alive
        # that step (live blocks record -1 for misses, never -2)
        alive_tb = (ib[:, ::br_bwd] >= -1).reshape(n_seg, seg, -1)
        thi_all = jnp.max(
            jnp.where(alive_tb,
                      (jnp.arange(seg, dtype=jnp.int32) + 1)[None, :, None],
                      0), axis=1)[:, None, :]              # [n_seg,1,B]

        def seg_body(carry):
            sidx, d_st, d_tab, d_cr = carry
            st_seg = jax.lax.dynamic_index_in_dim(cb, sidx, 0,
                                                  keepdims=False)
            idxs = jax.lax.dynamic_slice(
                ib, (sidx * seg, 0), (seg, r_pad)).astype(jnp.int32)
            thi = jax.lax.dynamic_index_in_dim(thi_all, sidx, 0,
                                               keepdims=False)
            if use_list:
                gl = (jax.lax.dynamic_index_in_dim(cnt_all, sidx, 0,
                                                   keepdims=False),
                      jax.lax.dynamic_index_in_dim(lst_all, sidx, 0,
                                                   keepdims=False))
                d_st, d_t, d_c = regen_seg_bwd(
                    cam13, cam16, t48k, st_seg, idxs, d_st, thi, gl,
                    seg=seg,
                    use_sky=use_sky, max_bounces=max_bounces, width=width,
                    height=height, m_pad=m_pad, block_r=br_bwd,
                    n_pad=n_pad_true)
                d_tab = d_tab + dtable_rt_to_flat(
                    _sum_blocks(d_t, n_gt * 16), p_pad)
            else:
                d_st, d_t, d_c = regen_seg_bwd(
                    cam13, cam16, t48, st_seg, idxs, d_st, thi, seg=seg,
                    use_sky=use_sky, max_bounces=max_bounces, width=width,
                    height=height, m_pad=m_pad, block_r=br_bwd)
                d_tab = d_tab + _sum_blocks(d_t, 16)
            return (sidx - 1, d_st, d_tab, d_cr + _sum_blocks(d_c, 16))

        last_seg = jnp.maximum(t_final - 1, 0) // seg
        _, d_st0, d_table, d_camrows = jax.lax.while_loop(
            lambda c: c[0] >= 0, seg_body,
            (last_seg, d_st, jnp.zeros_like(table),
             jnp.zeros((16, br_bwd), jnp.float32)))
        (d_cam,) = rows_vjp(jnp.sum(d_camrows, axis=1))

        # sample-s0 rays of the initial state came from the XLA raygen
        def rg0(cam):
            o, d, _ = camera_rays(cam, width, height, pixel,
                                  jnp.asarray(s0, jnp.uint32), seed)
            return o, d

        _, rg0_vjp = jax.vjp(rg0, camera)
        (dc0,) = rg0_vjp((d_st0[0:3, :r].T, d_st0[3:6, :r].T))
        d_camera = jax.tree.map(jnp.add, d_cam, dc0)
        d_scene = table_vjp(d_table)[0]
        return (d_scene, d_camera,
                np.zeros(pixel.shape, dtype=jax.dtypes.float0),
                np.zeros(jnp.shape(s0), dtype=jax.dtypes.float0))

    regen_trace.defvjp(fwd, bwd)
    return regen_trace
