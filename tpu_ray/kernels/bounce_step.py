"""Fused bounce mega-kernels: search + winner gather + shading in one pass,
forward AND backward.

The forward render's cost splits ~2:1 between the O(R*N) search and O(R)
per-bounce work (payload gathers, scatter math, RNG) — the latter is slow in
XLA because every elementwise step round-trips the wavefront through HBM and
the winner gathers are row-granular. These kernels keep one ray block
entirely in VMEM for a whole bounce. This is the TPU translation of the
reference's whole RenderTile inner loop (reference main.cpp:387-482) as ONE
kernel per bounce, for BOTH sweeps (SURVEY.md §7 step 4: "custom_vjp pairing
forward Pallas with a hand-written backward ... saved-hit replay").

Orientation: everything is channel-major. Ray state is [16, R] (rays on the
128-lane axis) and the search runs as [N, BLOCK_R] — spheres on sublanes,
rays on lanes:

  1. search: dcT = C @ D and -2 oc = (-2C) @ O are [N,3]x[3,BR] MXU
     matmuls straight off the state rows (no per-bounce ray-major transpose
     in XLA), the root-selection chain is ~12 VPU ops/pair, and the
     nearest-hit reduction is a SUBLANE min (cross-lane reductions are the
     expensive ones on TPU). Invalid roots are rejected arithmetically:
     sqrt(disc<0) -> NaN and t <= eps -> negative both order ABOVE every
     real hit under the sign-flipped-bits integer order, so the
     valid-mask/select ops of the v1 kernel disappear.
  2. winner "gather" as an MXU matmul: table [16,N] @ one_hot [N,BR]
     -> winner [16,BR]; the one-hot operand is fused (never in HBM).
  3. payload recompute + shading + counter RNG as [1,BR] lane-packed ops.

Three kernels share ONE differentiable shading chain (`_shade`):
  - `_fwd_kernel`    : search + shade; also emits the per-ray winner index
                       (i16 on the host side, -1 = miss/dead) — the
                       3-byte/ray/bounce hit record of the 'save_hits' remat
                       policy, here as a kernel output.
  - `_replay_kernel` : shade only, winner recomputed from the SAVED index
                       (one-hot matmul) — the backward pass's
                       search-free forward re-execution.
  - `_bwd_kernel`    : jax.vjp of `_shade` traced INSIDE the kernel (the
                       whole linearization lives in VMEM), producing
                       d_state_in and the d_table partial via a second MXU
                       matmul d_winner @ one_hot^T accumulated across the
                       (sequential) ray-block grid.

`make_fused_sample` wires them into a jax.custom_vjp over one full
(raygen -> B bounces) sample: forward saves ONLY the [B, R] i16 index stack
(+ the tiny scene/camera pytrees); backward re-derives rays from the camera,
replays states, then runs the reverse bounce sweep. Residual memory matches
the jnp path's 'save_hits' policy; compute never re-runs the O(R*N) search.

State channel layout [16, R] (f32; ch 13 is u32 bitcast):
   0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 color,
   12 alive (0/1), 13 rng stream base, 14-15 unused.
Shading table layout [16, N] (`scene_table`):
   0-2 center, 3 radius, 4-6 albedo, 7-9 emissive, 10 specular, 11 ior,
   12-15 unused.
Search table layout [2N, 54] bf16 (`search_table`, stop-gradient by
construction): stacked tp / q coefficient rows against the ray monomials
[o, d, o.d, |o|^2, 1], K-stacked as exact bf16 chunk groups — see
`_tile_roots`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX, Scene

BLOCK_R = 1024  # swept 128-2048: per-block overhead beats finer dead-block skip
_I32_MAX = 2**31 - 1
_MIX_BOUNCE = 0x632BE59B
_MIX_SLOT = 0xC2B2AE35
# Search-matmul precision must stay ~f32: disc = tp^2 - q needs absolute
# error << r_min^2 (1.6e-4) against |c|^2 ~ 25 terms, i.e. ~2^-19 relative;
# single-pass bf16 (DEFAULT) systematically deletes the small grid spheres
# (round-1 finding). Achieved via the K-stacked bf16x6 scheme in
# _tile_roots/search_table: ONE DEFAULT matmul, HIGHEST-class accuracy.


def _u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _split3_bf16(x, bitcast, from_u32):
    """f32 -> three bf16 chunks that sum back to x EXACTLY.

    Truncation-based: c1/c2 are the top-16-bit TRUNCATIONS of x and of the
    first residual (pure bit ops; each truncation and each subtraction is
    exact in f32), leaving a second residual with <= 8 significant bits
    that bf16 rounding captures exactly in c3.

    Deliberately avoids the textbook `x - x.astype(bf16).astype(f32)`
    round-trip: XLA's excess-precision simplifier is entitled to rewrite
    convert_f32(convert_bf16(x)) -> x, which silently collapses the
    residual chunks to zero (observed on TPU whenever the table is a
    traced value rather than a constant-folded one — bf16-level geometry
    error then resurrects dead rays via the inside-sphere rule). Bit-ops
    give the simplifier nothing value-changing to remove.
    """
    mask = jnp.uint32(0xFFFF0000)
    h1 = from_u32(bitcast(x) & mask)
    r1 = x - h1
    h2 = from_u32(bitcast(r1) & mask)
    r2 = r1 - h2
    return h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16), \
        r2.astype(jnp.bfloat16)


def _pcg_hash(x):
    # stateless PCG permutation, bit-identical to tpu_ray/core/rng.py
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * jnp.uint32(277803737)
    return (word >> jnp.uint32(22)) ^ word


def _u32_to_f32(u):
    """Exact emulation of f32(u32) (Mosaic has no u32->f32 cast).

    Split into 16-bit halves: both convert exactly via i32, and
    hi*65536 + lo rounds the exact value of u once — identical to a
    direct round-to-nearest conversion.
    """
    hi = pltpu.bitcast(u >> jnp.uint32(16), jnp.int32).astype(jnp.float32)
    lo = pltpu.bitcast(u & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    return hi * 65536.0 + lo


def _draw(base, bounce_term, slot, lo, hi):
    u = _pcg_hash(base + bounce_term + jnp.uint32((slot * _MIX_SLOT)
                                                  & 0xFFFFFFFF))
    scale = jnp.float32((hi - lo) * (1.0 / 4294967296.0))
    return _u32_to_f32(u) * scale + jnp.float32(lo)


def _rand_draws(st, b_ref):
    """The four per-bounce RNG draws, [1,BR] each. Pure u32 math off the
    (non-differentiable) stream-base channel — computed OUTSIDE the
    differentiable chain so jax.vjp never sees the integer bitcasts."""
    base = _u32(jax.lax.stop_gradient(st[13:14, :]))
    bterm = b_ref[0, 0].astype(jnp.uint32) * jnp.uint32(_MIX_BOUNCE)
    return (_draw(base, bterm, 0, -1.0, 1.0),
            _draw(base, bterm, 1, -1.0, 1.0),
            _draw(base, bterm, 2, -1.0, 1.0),
            _draw(base, bterm, 3, 0.0, 1.0))


# ---------------------------------------------------------------------------
# differentiable shading chain (shared by forward / replay / backward)
# ---------------------------------------------------------------------------

def _safe_sqrt(x):
    """sqrt with zero value AND zero gradient for x <= 0 (ops/vec.safe_sqrt);
    the double-where keeps NaN out of reverse-mode (sqrt'(0) = inf)."""
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def _normalize_eps3(x, y, z):
    """Reference v3::Normalize (x64_math.h:234-245): 0 when |v|^2 <= eps."""
    lsq = x * x + y * y + z * z
    ok = lsq > F32_EPS
    inv = jax.lax.rsqrt(jnp.where(ok, lsq, 1.0))
    zero = jnp.zeros_like(x)
    return (jnp.where(ok, x * inv, zero), jnp.where(ok, y * inv, zero),
            jnp.where(ok, z * inv, zero))


def _shade(st, winner, live, sky_mask, rand, use_sky: bool):
    """One bounce's smooth state update given the (non-diff) winner.

    st [16,BR] f32 state, winner [16,BR] gathered winner columns (garbage on
    non-live lanes — masked out), live / sky_mask [1,BR] bool closures
    (alive&hit / alive&miss), rand = 4x [1,BR] f32 draws. -> [16,BR].

    Differentiable w.r.t. st and winner: this single function is the
    reference's per-pixel shading (main.cpp:446-481 + sky 433-440 + payload
    recompute 401-417), and `_bwd_kernel` takes jax.vjp of it in-kernel.
    Every sqrt/normalize is guarded so reverse-mode never sees sqrt(0)/NaN.
    """
    def ch(a, c):
        return a[c:c + 1, :]

    ox_, oy_, oz_ = ch(st, 0), ch(st, 1), ch(st, 2)
    dx_, dy_, dz_ = ch(st, 3), ch(st, 4), ch(st, 5)
    ax_, ay_, az_ = ch(st, 6), ch(st, 7), ch(st, 8)
    cr_, cg_, cb_ = ch(st, 9), ch(st, 10), ch(st, 11)

    cx_, cy_, cz_ = ch(winner, 0), ch(winner, 1), ch(winner, 2)
    r_ = ch(winner, 3)
    alr, alg, alb = ch(winner, 4), ch(winner, 5), ch(winner, 6)
    emr, emg, emb = ch(winner, 7), ch(winner, 8), ch(winner, 9)
    spec = ch(winner, 10)
    ior = ch(winner, 11)

    # sky emission for dying rays (reference main.cpp:433-440)
    if use_sky:
        a = (dy_ + 1.0) * 0.5
        cr_ = cr_ + jnp.where(sky_mask, ((1.0 - a) + a * 0.5) * ax_, 0.0)
        cg_ = cg_ + jnp.where(sky_mask, ((1.0 - a) + a * 0.7) * ay_, 0.0)
        cb_ = cb_ + jnp.where(sky_mask, ((1.0 - a) + a * 1.0) * az_, 0.0)

    # payload recompute (projection form, reference main.cpp:401-417)
    mx, my, mz = cx_ - ox_, cy_ - oy_, cz_ - oz_
    tp2 = mx * dx_ + my * dy_ + mz * dz_
    px_, py_, pz_ = mx - dx_ * tp2, my - dy_ * tp2, mz - dz_ * tp2
    dsq = px_ * px_ + py_ * py_ + pz_ * pz_
    xx = _safe_sqrt(r_ * r_ - dsq)
    tn = tp2 - xx
    inside = tn < F32_EPS
    tt = jnp.where(inside, tp2 + xx, tn)

    nox, noy, noz = ox_ + dx_ * tt, oy_ + dy_ * tt, oz_ + dz_ * tt
    nrx, nry, nrz = dx_ * tt - mx, dy_ * tt - my, dz_ * tt - mz

    # emissive add + albedo attenuation (main.cpp:446-447)
    cr_ = cr_ + jnp.where(live, emr * ax_, 0.0)
    cg_ = cg_ + jnp.where(live, emg * ay_, 0.0)
    cb_ = cb_ + jnp.where(live, emb * az_, 0.0)
    ax_ = jnp.where(live, ax_ * alr, ax_)
    ay_ = jnp.where(live, ay_ * alg, ay_)
    az_ = jnp.where(live, az_ * alb, az_)

    # scatter (reference main.cpp:446-481 / ops/shade.py)
    nx, ny, nz = _normalize_eps3(nrx, nry, nrz)
    dn = dx_ * nx + dy_ * ny + dz_ * nz
    purex, purey, purez = dx_ - 2.0 * dn * nx, dy_ - 2.0 * dn * ny, \
        dz_ - 2.0 * dn * nz
    sgn = jnp.where(inside, -1.0, 1.0)
    n2x, n2y, n2z = sgn * nx, sgn * ny, sgn * nz

    r0, r1, r2, rrefl = rand
    rux, ruy, ruz = _normalize_eps3(r0, r1, r2)
    rbx, rby, rbz = n2x + rux, n2y + ruy, n2z + ruz
    omspec = 1.0 - spec
    ddx, ddy, ddz = _normalize_eps3(
        omspec * rbx + spec * purex,
        omspec * rby + spec * purey,
        omspec * rbz + spec * purez)

    is_diel = ior != 0.0
    ior_safe = jnp.where(is_diel, ior, 1.0)
    ri = jnp.where(inside, ior_safe, 1.0 / ior_safe)
    cos_t = jnp.minimum(-(dx_ * n2x + dy_ * n2y + dz_ * n2z), 1.0)
    sin_t = _safe_sqrt(1.0 - cos_t * cos_t)
    cant = ri * sin_t > 1.0
    perpx = ri * (dx_ + cos_t * n2x)
    perpy = ri * (dy_ + cos_t * n2y)
    perpz = ri * (dz_ + cos_t * n2z)
    par = -_safe_sqrt(jnp.abs(
        1.0 - (perpx * perpx + perpy * perpy + perpz * perpz)))
    rfx, rfy, rfz = _normalize_eps3(
        perpx + par * n2x, perpy + par * n2y, perpz + par * n2z)
    # Schlick (reference main.cpp:292-300)
    sr0 = (1.0 - ri) / (1.0 + ri)
    sr0 = sr0 * sr0
    sr1 = 1.0 - cos_t
    sr1 = sr1 * sr1 * sr1 * sr1 * sr1
    schlick = sr0 + (1.0 - sr0) * sr1
    choose_reflect = (cant | (schlick > rrefl)) & ~inside
    dlx = jnp.where(choose_reflect, purex, rfx)
    dly = jnp.where(choose_reflect, purey, rfy)
    dlz = jnp.where(choose_reflect, purez, rfz)

    ndx = jnp.where(is_diel, dlx, ddx)
    ndy = jnp.where(is_diel, dly, ddy)
    ndz = jnp.where(is_diel, dlz, ddz)

    return jnp.concatenate([
        jnp.where(live, nox, ox_),
        jnp.where(live, noy, oy_),
        jnp.where(live, noz, oz_),
        jnp.where(live, ndx, dx_),
        jnp.where(live, ndy, dy_),
        jnp.where(live, ndz, dz_),
        ax_, ay_, az_, cr_, cg_, cb_,
        jnp.where(live, 1.0, 0.0),
        st[13:16, :],
    ], axis=0)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _winner_from_idx(table_ref, idx, n_pad):
    """Gather as an EXACT 3-pass bf16 matmul: the one-hot operand is
    bf16-representable (0/1) and the f32 table is pre-split into three
    bf16 chunks whose sum reconstructs it exactly (8+8+8 mantissa bits),
    so three DEFAULT-precision passes with f32 accumulation equal the f32
    gather at half the bf16x6 HIGHEST cost. idx [1,BR] i32; -1 (miss/dead)
    selects no row -> all-zero winner column."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, idx.shape[1]), 0)
    onehot = (rows == idx).astype(jnp.bfloat16)
    w48 = jnp.dot(table_ref[:], onehot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)     # [48,BR]
    winner = w48[0:16, :] + w48[16:32, :] + w48[32:48, :]
    return winner, onehot


def _tile_roots(st, stab_ref, block_n: int):
    """Shifted root chain for ONE sphere tile, [bn,BR]. -> tb = t - eps
    (<= 0 / NaN where invalid; see packed-order comment below).

    The whole quadratic setup is ONE K-stacked MXU matmul against the
    per-ray monomials [o, d, o.d, |o|^2, 1]; coefficient rows 0:bn produce
    tp, rows bn:2bn produce q:
        tp = c.d - o.d
        q  = -2 c.o + (|c|^2 - r^2) + |o|^2
    — the per-ray combine ops disappear into the matmul.

    Precision WITHOUT passes: the f32 x f32 product needs ~2^-19 relative
    accuracy (disc = tp^2 - q vs r_min^2 = 1.6e-4; single-pass bf16
    deletes the small grid spheres — round-1 finding), i.e. the bf16x6
    scheme (3 exact bf16 chunks per side, the 6 significant cross
    products). XLA's HIGHEST runs those as 6 SEPARATE matmul passes, each
    padding K=9 to the MXU's 128 — 93% of the systolic array wasted, six
    times. Here the 6 chunk pairs are stacked ALONG K instead: the search
    table carries [a1 a1 a2 a1 a2 a3] (column groups, search_table) and
    the kernel builds [b1; b2; b1; b3; b2; b1] (row groups of the
    bit-split monomials), so ONE DEFAULT-precision K=54 matmul (still
    under one 128 pad) accumulates exactly the same 6 products in f32 —
    identical error class to HIGHEST at 1/6 the MXU cost (measured: the
    passes were 75% of the all-alive forward bounce)."""
    o = st[0:3, :]
    d = st[3:6, :]
    oo = jnp.sum(o * o, axis=0, keepdims=True)       # [1,BR]
    od = jnp.sum(o * d, axis=0, keepdims=True)
    one = jnp.ones_like(oo)

    feats = jnp.concatenate([o, d, od, oo, one], axis=0)   # [9,BR]
    b1, b2, b3 = _split3_bf16(
        feats, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    bk = jnp.concatenate([b1, b2, b1, b3, b2, b1], axis=0)  # [54,BR]
    tpq = jnp.dot(stab_ref[:], bk,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)     # [2bn,BR]
    tp = tpq[0:block_n, :]
    q = tpq[block_n:2 * block_n, :]
    disc = tp * tp - q
    x = jnp.sqrt(disc)            # NaN when disc < 0: rejected by the order
    tn = tp - x
    t = jnp.where(tn < F32_EPS, tp + x, tn)
    # shift by eps: t <= eps becomes <= 0, whose sign-flipped bit pattern
    # (like NaN's) orders above every valid hit — no mask/select needed
    return t - F32_EPS


def _pack_bits(n_pad: int):
    """Packed-argmin layout: index bits stolen from the t mantissa, plus
    the miss sentinel in sign-flipped-i32 space (F32_MAX bit pattern)."""
    idx_bits = max(1, (n_pad - 1).bit_length())
    low_mask = (1 << idx_bits) - 1
    miss_bits = int(np.float32(F32_MAX).view(np.uint32)) & (
        ~low_mask & 0xFFFFFFFF)
    miss_s = int(np.uint32(miss_bits ^ 0x80000000).astype(np.int32))
    return low_mask, miss_s


def _search_tile_packed(st, stab_ref, row0, block_n: int, low_mask: int):
    """One tile's packed (t | index) sublane min, [1,BR] i32 (sign-flipped
    order: positive-f32 bits order like ints; negatives/NaN order above
    after flipping the sign bit). Winner selection compares t at ~2^-14
    relative resolution, so near-exact ties can flip (a fwd accuracy/speed
    knob; exact_argmin=True and the jnp backend stay exact)."""
    tb = _tile_roots(st, stab_ref, block_n)
    rows = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + row0
    bits = _u32(tb)
    packed = (bits & jnp.uint32(~low_mask & 0xFFFFFFFF)) | _u32(rows)
    ps = pltpu.bitcast(packed ^ jnp.uint32(0x80000000), jnp.int32)
    return jnp.min(ps, axis=0, keepdims=True)          # [1,BR]


def _unpack(pmin, low_mask: int, miss_s: int):
    """Packed carry -> (idx [1,BR] i32, hit [1,BR] bool)."""
    pminu = pltpu.bitcast(pmin, jnp.uint32) ^ jnp.uint32(0x80000000)
    idx = pltpu.bitcast(pminu & jnp.uint32(low_mask), jnp.int32)
    hit = pmin < jnp.int32(miss_s)
    return idx, hit


def _search_tile_exact(st, stab_ref, row0, block_n: int):
    """One tile's exact two-reduction (tmin [1,BR] f32, idx [1,BR] i32);
    full-precision t comparison — the bit-stable verification mode."""
    tb = _tile_roots(st, stab_ref, block_n)
    tv = jnp.where(tb > 0.0, tb, F32_MAX)
    tmin = jnp.min(tv, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + row0
    cand = jnp.where(tv == tmin, rows, jnp.int32(_I32_MAX))
    idx = jnp.min(cand, axis=0, keepdims=True)
    return tmin, idx


def _fwd_kernel(*refs, n_pad: int, block_n: int, use_sky: bool,
                exact_argmin: bool, culled: bool):
    if culled:
        b_ref, mask_ref, state_ref, stab_ref, table_ref, out_ref, \
            idx_ref = refs
    else:
        b_ref, state_ref, stab_ref, table_ref, out_ref, idx_ref = refs
    # Whole-block dead-ray skip: rays die in raster-coherent clumps (sky
    # pixels at bounce 1, absorbed paths later), so entire ray blocks go
    # dead as bounces progress — the dynamic early-out XLA's static graph
    # cannot express (the reference's per-pixel `break`, main.cpp:433-440,
    # reborn at block granularity).
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5
    # mask is ONE flat [1, B*T] SMEM block shared by every grid step
    # (per-step (1, n_tiles) blocks violate the TPU block-shape rules);
    # this step's row starts at program_id * n_tiles. Hoisted out of the
    # pl.when closures: program_id has no lowering inside their cond body.
    m0 = pl.program_id(0) * (n_pad // block_n) if culled else 0

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    @pl.when(block_alive)
    def _():
        st = state_ref[:]
        n_tiles = n_pad // block_n
        low_mask, miss_s = _pack_bits(n_pad)
        br = st.shape[1]

        # Sphere-TILE culling (culled=True; primary-bounce only — see
        # trace_rays_fused): the search runs as a static loop over
        # block_n-sphere tiles, each guarded by the per-(ray block, tile)
        # conservative reachability mask (cull_mask) — a culled tile's
        # matmul+chain never executes. Output-invariant by construction:
        # the mask is 1 whenever any ray in the block could hit any sphere
        # in the tile. This is the TPU rebirth of the reference's
        # sphere-group early-out (main.cpp:411,421) at tile granularity.
        # culled=False (block_n = n_pad): ONE unconditional full-scene
        # matmul + reduction — no cond overhead, maximal MXU shapes.
        def guard(j, live_fn, noop, carry):
            if not culled:
                return live_fn(carry)
            return jax.lax.cond(mask_ref[0, m0 + j] > 0, live_fn, noop,
                                carry)

        if exact_argmin:
            tmin = jnp.full((1, br), F32_MAX, jnp.float32)
            idxc = jnp.zeros((1, br), jnp.int32)
            for j in range(n_tiles):
                sl = stab_ref[2 * block_n * j:2 * block_n * (j + 1), :]

                def live_fn(c, sl=sl, j=j):
                    tmin, idxc = c
                    tt, ii = _search_tile_exact(st, sl, j * block_n,
                                                block_n)
                    better = tt < tmin
                    return (jnp.where(better, tt, tmin),
                            jnp.where(better, ii, idxc))

                tmin, idxc = guard(j, live_fn, lambda c: c, (tmin, idxc))
            hit = tmin < F32_MAX
            idx = idxc
        else:
            pmin = jnp.full((1, br), miss_s, jnp.int32)
            for j in range(n_tiles):
                sl = stab_ref[2 * block_n * j:2 * block_n * (j + 1), :]

                def live_fn(pmin, sl=sl, j=j):
                    return jnp.minimum(pmin, _search_tile_packed(
                        st, sl, j * block_n, block_n, low_mask))

                pmin = guard(j, live_fn, lambda p: p, pmin)
            idx, hit = _unpack(pmin, low_mask, miss_s)

        winner, _ = _winner_from_idx(table_ref, idx, n_pad)
        alive = st[12:13, :] > 0.5
        live = alive & hit
        sky_mask = alive & jnp.logical_not(hit)
        rand = _rand_draws(st, b_ref)
        out_ref[:] = _shade(st, winner, live, sky_mask, rand, use_sky)
        # the saved hit record: winner index for live rays, -1 otherwise
        idx_ref[:] = jnp.where(live, idx, jnp.int32(-1))


def _replay_kernel(b_ref, state_ref, idx_ref, table_ref, out_ref, *,
                   n_pad: int, use_sky: bool):
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]

    @pl.when(block_alive)
    def _():
        st = state_ref[:]
        idx = idx_ref[:]
        winner, _ = _winner_from_idx(table_ref, idx, n_pad)
        live = idx >= 0                       # saved as -1 for miss AND dead
        alive = st[12:13, :] > 0.5
        sky_mask = alive & jnp.logical_not(live)
        rand = _rand_draws(st, b_ref)
        out_ref[:] = _shade(st, winner, live, sky_mask, rand, use_sky)


def _bwd_kernel(b_ref, state_ref, idx_ref, table_ref, dout_ref,
                dstate_ref, dtable_ref, *, n_pad: int, use_sky: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)

    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        # forward was the identity on dead blocks
        dstate_ref[:] = dout_ref[:]

    @pl.when(block_alive)
    def _():
        st = state_ref[:]
        idx = idx_ref[:]
        winner, onehot = _winner_from_idx(table_ref, idx, n_pad)
        live = idx >= 0
        alive = st[12:13, :] > 0.5
        sky_mask = alive & jnp.logical_not(live)
        rand = _rand_draws(st, b_ref)

        # the whole linearization of the shading chain, traced in-kernel:
        # every residual stays in VMEM, nothing touches HBM
        _, vjp_fn = jax.vjp(
            lambda s_, w_: _shade(s_, w_, live, sky_mask, rand, use_sky),
            st, winner)
        d_st, d_wn = vjp_fn(dout_ref[:])
        dstate_ref[:] = d_st
        # gather transpose on the MXU, same exact 3-chunk bf16 scheme:
        # d_table += d_winner @ one_hot^T with d_winner split at runtime
        c1, c2, c3 = _split3_bf16(
            d_wn, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
        d48 = jax.lax.dot_general(
            jnp.concatenate([c1, c2, c3], axis=0), onehot,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [48,N]
        dtable_ref[:] = dtable_ref[:] + (
            d48[0:16, :] + d48[16:32, :] + d48[32:48, :])


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def scene_table(scene: Scene):
    """[16, N] shading constant table (see module docstring)."""
    c = scene.center.T                               # [3,N]
    r = scene.radius[None, :]
    zero = jnp.zeros_like(r)
    return jnp.concatenate([
        c, r, scene.albedo.T, scene.emissive.T, scene.specular[None, :],
        scene.ior[None, :], zero, zero, zero, zero], axis=0)


def table_chunks(table):
    """f32 [16,N] -> bf16 [48,N]: three stacked bf16 chunks that sum to
    the f32 table EXACTLY (8+8+8 mantissa bits cover f32's 24) — the
    operand encoding for the exact 3-pass gathers (_winner_from_idx).
    Truncation-split (see _split3_bf16) so the residuals survive XLA's
    excess-precision simplifier when `table` is traced, not constant."""
    c1, c2, c3 = _split3_bf16(
        table,
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32),
        lambda u: jax.lax.bitcast_convert_type(u, jnp.float32))
    return jnp.concatenate([c1, c2, c3], axis=0)


BLOCK_N = 128   # spheres per cull tile (SPHERE_PAD multiple, so n_pad | it)


def search_table(scene: Scene, block_n: int = BLOCK_N):
    """[2N, 54] bf16 tile-major stacked search coefficient table
    (stop-gradient: the search is the non-differentiable discrete
    selection, ops/intersect docstring). Feature order
    [o(3), d(3), o.d, |o|^2, 1]; tp coefficient rows are
    [0 | c | -1 | 0 | 0], q rows [-2c | 0 | 0 | 1 | |c|^2-r^2].
    Columns are the K-stacked bf16 chunk groups [a1 a1 a2 a1 a2 a3] of
    the exact 3-chunk split — one DEFAULT matmul against the kernel's
    [b1; b2; b1; b3; b2; b1] monomial rows reproduces the bf16x6 HIGHEST
    product (see _tile_roots). Layout is [n_tiles, 2*block_n, 54]
    flattened — each tile's [tp; q] rows are contiguous so the kernel's
    per-tile slice is one static [2*block_n, 54] block."""
    c = jax.lax.stop_gradient(scene.center)          # [N,3]
    r = jax.lax.stop_gradient(scene.radius)
    n = c.shape[0]
    ccmr = (jnp.sum(c * c, axis=1) - r * r)[:, None]
    one = jnp.ones_like(ccmr)
    zero = jnp.zeros_like(ccmr)
    z3 = jnp.zeros_like(c)
    tp_rows = jnp.concatenate([z3, c, -one, zero, zero], axis=1)
    q_rows = jnp.concatenate([-2.0 * c, z3, zero, one, ccmr], axis=1)
    n_t = max(1, n // block_n)
    rows = jnp.concatenate([tp_rows.reshape(n_t, block_n, 9),
                            q_rows.reshape(n_t, block_n, 9)],
                           axis=1).reshape(2 * n, 9)
    a1, a2, a3 = _split3_bf16(
        rows,
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32),
        lambda u: jax.lax.bitcast_convert_type(u, jnp.float32))
    return jnp.concatenate([a1, a1, a2, a1, a2, a3], axis=1)  # [2N,54]


def _spread3(x):
    """10-bit u32 -> bits spread to every 3rd position (Morton helper)."""
    x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return x


def morton_perm(scene: Scene):
    """Spatial (Morton/Z-order) sphere permutation -> [N] i32.

    Scene builders emit spheres in *generation* order (reference
    main.cpp:93-268), which scatters each 128-sphere cull tile across the
    whole world — every tile AABB then covers everything and cull_mask
    never fires. Sorting by the 30-bit Morton code of the quantized center
    makes tiles spatially compact. Padding spheres (radius <= 0) sort
    last, preserving the contiguous radius-0 tail. stop_gradient'd: a pure
    reindexing, applied symmetrically to all tables."""
    c = jax.lax.stop_gradient(scene.center)
    r = jax.lax.stop_gradient(scene.radius)
    valid = r > 0.0
    v3 = valid[:, None]
    lo = jnp.min(jnp.where(v3, c, F32_MAX), axis=0)
    hi = jnp.max(jnp.where(v3, c, -F32_MAX), axis=0)
    ext = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((c - lo) / ext * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << jnp.uint32(1))
            | (_spread3(q[:, 2]) << jnp.uint32(2)))
    code = jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(code).astype(jnp.int32)


def permute_spheres(scene: Scene, perm):
    """Scene with the per-sphere arrays reordered by perm (differentiable:
    the vjp scatters cotangents back through the gather)."""
    import dataclasses
    return dataclasses.replace(
        scene, center=scene.center[perm], radius=scene.radius[perm],
        albedo=scene.albedo[perm], emissive=scene.emissive[perm],
        specular=scene.specular[perm], ior=scene.ior[perm])


def tile_bounds(scene: Scene, block_n: int = BLOCK_N):
    """Radius-inflated AABBs of the sphere tiles -> (lo [T,3], hi [T,3]).

    Padding spheres (radius <= 0, scene.py's radius-0 sentinel trick) are
    excluded, so an all-padding tile gets an empty box (lo > hi) and every
    ray block culls it. Computed from stop_gradient'd geometry — culling
    is output-invariant so no gradient flows through the decision."""
    c = jax.lax.stop_gradient(scene.center)
    r = jax.lax.stop_gradient(scene.radius)[:, None]
    valid = r > 0.0
    lo = jnp.where(valid, c - r, F32_MAX)
    hi = jnp.where(valid, c + r, -F32_MAX)
    n_t = max(1, c.shape[0] // block_n)
    return (lo.reshape(n_t, block_n, 3).min(axis=1),
            hi.reshape(n_t, block_n, 3).max(axis=1))


def ray_block_bounds(state, block_r: int):
    """Alive-masked per-ray-block component bounds of origin/direction.

    state [16, R] -> (olo, ohi, dlo, dhi) each [B, 3] with B = R/block_r.
    All-dead blocks produce inverted (+inf/-inf) bounds; their mask value
    is irrelevant because the kernel's dead-block skip fires first."""
    b = state.shape[1] // block_r
    sv = state.reshape(16, b, block_r)
    alive = sv[12:13] > 0.5                      # [1,B,br]
    big = jnp.float32(F32_MAX)

    def lohi(x):
        return (jnp.where(alive, x, big).min(axis=2).T,
                jnp.where(alive, x, -big).max(axis=2).T)

    olo, ohi = lohi(sv[0:3])
    dlo, dhi = lohi(sv[3:6])
    return olo, ohi, dlo, dhi


def cull_mask(olo, ohi, dlo, dhi, tlo, thi):
    """Conservative (ray block x sphere tile) reachability -> [B,T] i32.

    Interval relaxation: with o_k in [olo_k, ohi_k] and d_k in
    [dlo_k, dhi_k] independently, the reachable set on axis k at ray
    parameter t >= 0 is exactly [olo_k + t*dlo_k, ohi_k + t*dhi_k] — a
    superset of the true ray block (components decorrelated, |d|=1
    dropped), so a hit implies reachability. The tile box [tlo, thi] is
    reachable iff some common t >= 0 satisfies, per axis,
        olo_k + t*dlo_k <= thi_k   and   ohi_k + t*dhi_k >= tlo_k.
    Each constraint is linear in t -> a t-interval; the mask is 1 iff the
    six intervals and [0, inf) intersect. Any real intersection point
    o + t*d lies ON the winning sphere, hence inside the radius-inflated
    tile AABB, so culled tiles can never contain the nearest hit and
    masked rendering is BIT-IDENTICAL to unmasked."""
    inf = jnp.float32(np.inf)

    def le_interval(a, b, c):
        # feasible t for a + t*b <= c  (a,b: [B,3] bcast vs c: [T,3])
        a, b, c = a[:, None, :], b[:, None, :], c[None, :, :]
        q = (c - a) / jnp.where(b == 0.0, 1.0, b)
        lo = jnp.where(b < 0.0, q, jnp.where((b == 0.0) & (a > c), inf, -inf))
        hi = jnp.where(b > 0.0, q, jnp.where((b == 0.0) & (a > c), -inf, inf))
        return lo, hi

    lo1, hi1 = le_interval(olo, dlo, thi)          # olo + t dlo <= thi
    lo2, hi2 = le_interval(-ohi, -dhi, -tlo)       # ohi + t dhi >= tlo
    t_lo = jnp.maximum(jnp.max(lo1, axis=2), jnp.max(lo2, axis=2))
    t_lo = jnp.maximum(t_lo, 0.0)
    t_hi = jnp.minimum(jnp.min(hi1, axis=2), jnp.min(hi2, axis=2))
    return (t_lo <= t_hi).astype(jnp.int32)        # [B,T]


def bounce_cull_mask(scene: Scene, state, block_r: int,
                     block_n: int = BLOCK_N):
    """Per-bounce cull mask [R/block_r, n_pad/block_n] for bounce_fwd."""
    tlo, thi = tile_bounds(scene, block_n)
    return cull_mask(*ray_block_bounds(state, block_r), tlo, thi)


def _interpret():
    return jax.default_backend() == "cpu"


def _smem_bounce(b):
    return jnp.asarray(b, jnp.int32).reshape(1, 1)


def _check_shapes(table48, state, block_r):
    n_pad = table48.shape[1]
    assert table48.shape[0] == 48 and table48.dtype == jnp.bfloat16, (
        "kernels take the bf16 chunk table (table_chunks(scene_table(s)))")
    r_tot = state.shape[1]
    assert r_tot % block_r == 0, (r_tot, block_r)
    assert n_pad <= 1024, "single-shot search; use the jnp path beyond 1k"
    return n_pad, r_tot


@functools.partial(jax.jit, static_argnames=("use_sky", "block_r",
                                             "block_n", "exact_argmin"))
def bounce_fwd(table48, stab, state, bounce, mask=None, *, use_sky: bool,
               block_r: int = BLOCK_R, block_n: int = BLOCK_N,
               exact_argmin: bool = False):
    """One fused forward bounce. table48 [48,N] bf16 chunk table,
    stab [2N,54] bf16 tile-major (search_table), state [16,R] (R multiple of
    block_r), bounce [] i32, mask optional [R/block_r, N/block_n] i32
    tile-cull mask (bounce_cull_mask). mask=None compiles the UNCULLED
    kernel: one full-scene search matmul, no per-tile conds (the fast
    shape for incoherent bounces, where the mask never fires anyway)
    -> (new state [16,R], winner idx [R] i32, -1 = miss/dead)."""
    n_pad, r_tot = _check_shapes(table48, state, block_r)
    n_blocks = r_tot // block_r
    culled = mask is not None
    if not culled:
        block_n = n_pad            # single unconditional tile
    n_tiles = n_pad // block_n
    mask_in = []
    mask_spec = []
    if culled:
        mask_in = [mask.reshape(1, n_blocks * n_tiles)]
        mask_spec = [pl.BlockSpec((1, n_blocks * n_tiles), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)]
    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, n_pad=n_pad, block_n=block_n,
                          use_sky=use_sky, exact_argmin=exact_argmin,
                          culled=culled),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *mask_spec,
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_pad, 54), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
            jax.ShapeDtypeStruct((1, r_tot), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(_smem_bounce(bounce), *mask_in, state, stab, table48)
    return out, idx[0]


@functools.partial(jax.jit, static_argnames=("use_sky", "block_r"))
def bounce_replay(table48, state, idx, bounce, *, use_sky: bool,
                  block_r: int = BLOCK_R):
    """Search-free forward bounce from the saved winner idx [R] i32."""
    n_pad, r_tot = _check_shapes(table48, state, block_r)
    return pl.pallas_call(
        functools.partial(_replay_kernel, n_pad=n_pad, use_sky=use_sky),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(_smem_bounce(bounce), state, idx.reshape(1, r_tot), table48)


@functools.partial(jax.jit, static_argnames=("use_sky", "block_r"))
def bounce_bwd(table48, state, idx, bounce, d_out, *, use_sky: bool,
               block_r: int = BLOCK_R):
    """Reverse of one bounce: (state_in, saved idx, d_state_out)
    -> (d_state_in [16,R], d_table [16,N])."""
    n_pad, r_tot = _check_shapes(table48, state, block_r)
    d_state, d_table = pl.pallas_call(
        functools.partial(_bwd_kernel, n_pad=n_pad, use_sky=use_sky),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # d_table is revisited by every grid step (accumulation), which
            # requires the sequential ("arbitrary") grid below
            pl.BlockSpec((16, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
            jax.ShapeDtypeStruct((16, n_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(_smem_bounce(bounce), state, idx.reshape(1, r_tot), table48, d_out)
    return d_state, d_table


# ---------------------------------------------------------------------------
# trace-level API
# ---------------------------------------------------------------------------

def _init_state(origins, directions, stream_base, block_r: int):
    r = origins.shape[0]
    r_pad = -(-r // block_r) * block_r
    st = jnp.zeros((16, r_pad), jnp.float32)
    st = st.at[0:3, :r].set(origins.T)
    st = st.at[3:6, :r].set(directions.T)
    st = st.at[6:9, :r].set(1.0)
    st = st.at[12, :r].set(1.0)
    st = st.at[13, :r].set(jax.lax.bitcast_convert_type(
        stream_base, jnp.float32))
    return st, r, r_pad


def trace_rays_fused(scene: Scene, origins, directions, stream_base,
                     max_bounces: int, block_r: int = BLOCK_R,
                     exact_argmin: bool = False, cull: bool = True):
    """Forward-only fused trace: drop-in for trace_rays (path shading).

    -> (color [R,3], rays_cast [R] u32). Requires a sphere-only scene with
    n_pad <= 1024. rays_cast accumulates sum(alive) at the top of each
    bounce, matching the reference counter (main.cpp:390). For the
    differentiable path use `make_fused_sample`.

    cull=True tile-culls the PRIMARY bounce only (bit-identical output; see
    cull_mask): camera-ray blocks are direction-coherent narrow frusta that
    skip ~25% of sphere tiles, but diffuse-bounce blocks span all
    directions, so their interval mask never fires (measured: 1.000 tiles
    searched at bounces 1-4, rtweekend) — those bounces run the uncalled
    single-matmul kernel instead of paying per-tile cond overhead.
    """
    assert scene.tris is None, "fused path is sphere-only; use backend='jnp'"
    if cull:
        scene = permute_spheres(scene, morton_perm(scene))
    t48 = table_chunks(scene_table(scene))
    n_pad = scene.n_pad
    stab_full = search_table(scene, n_pad)
    st, r, r_pad = _init_state(origins, directions, stream_base, block_r)
    rays = jnp.zeros((r_pad,), jnp.uint32)
    b_start = 1 if (cull and max_bounces > 0) else 0

    if b_start:
        stab_tiled = search_table(scene)
        tb_lo, tb_hi = tile_bounds(scene)
        rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
        mask = cull_mask(*ray_block_bounds(st, block_r), tb_lo, tb_hi)
        st, _ = bounce_fwd(t48, stab_tiled, st, jnp.int32(0), mask,
                           use_sky=scene.use_sky, block_r=block_r,
                           exact_argmin=exact_argmin)

    def bounce(carry, b):
        st, rays = carry
        rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
        st, _ = bounce_fwd(t48, stab_full, st, b, None,
                           use_sky=scene.use_sky,
                           block_r=block_r, exact_argmin=exact_argmin)
        return (st, rays), None

    (st, rays), _ = jax.lax.scan(
        bounce, (st, rays),
        jnp.arange(b_start, max_bounces, dtype=jnp.int32))
    return st[9:12, :r].T, rays[:r]


@functools.lru_cache(maxsize=None)
def make_fused_sample(width: int, height: int, seed: int, max_bounces: int,
                      block_r: int = BLOCK_R, exact_argmin: bool = False):
    """Differentiable fused sample: (scene, camera, pixel, s)
    -> (color_sum [R,3], rays_cast [R] u32), with a custom VJP.

    The forward runs raygen (XLA) + the fused bounce scan, saving ONLY the
    [B, R_pad] i16 winner-index stack (3 B/ray/bounce with the mask folded
    in as -1 — the 'save_hits' residual budget). The backward re-derives
    rays from the camera, replays the per-bounce input states with the
    search-free kernel, then runs the reverse bounce sweep, accumulating
    d_table on the MXU; scene cotangents flow through scene_table's concat
    transpose, camera cotangents through raygen's VJP in XLA.
    """
    from tpu_ray.ops.raygen import camera_rays

    def _forward(scene, camera, pixel, s):
        o, d, base = camera_rays(camera, width, height, pixel, s, seed)
        scene = permute_spheres(scene, morton_perm(scene))
        t48 = table_chunks(scene_table(scene))
        stab_full = search_table(scene, scene.n_pad)
        st, r, r_pad = _init_state(o, d, base, block_r)
        rays = jnp.zeros((r_pad,), jnp.uint32)
        b_start = 1 if max_bounces > 0 else 0

        idx0 = []
        if b_start:
            # primary bounce: tile-culled (camera-ray blocks are coherent
            # frusta; later diffuse bounces never cull — see
            # trace_rays_fused docstring)
            stab_tiled = search_table(scene)
            tb_lo, tb_hi = tile_bounds(scene)
            rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
            mask = cull_mask(*ray_block_bounds(st, block_r), tb_lo, tb_hi)
            st, i0 = bounce_fwd(t48, stab_tiled, st, jnp.int32(0), mask,
                                use_sky=scene.use_sky,
                                block_r=block_r, exact_argmin=exact_argmin)
            idx0 = [i0.astype(jnp.int16)[None]]

        def body(carry, b):
            st, rays = carry
            rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
            st, idx = bounce_fwd(t48, stab_full, st, b, None,
                                 use_sky=scene.use_sky,
                                 block_r=block_r, exact_argmin=exact_argmin)
            return (st, rays), idx.astype(jnp.int16)

        (st, rays), idx_rest = jax.lax.scan(
            body, (st, rays),
            jnp.arange(b_start, max_bounces, dtype=jnp.int32))
        idx_stack = jnp.concatenate(idx0 + [idx_rest], axis=0)
        return st[9:12, :r].T, rays[:r], idx_stack

    @jax.custom_vjp
    def fused_sample(scene, camera, pixel, s):
        color, rays, _ = _forward(scene, camera, pixel, s)
        return color, rays

    def fwd(scene, camera, pixel, s):
        color, rays, idx_stack = _forward(scene, camera, pixel, s)
        return (color, rays), (scene, camera, pixel, s, idx_stack)

    def bwd(res, cts):
        scene, camera, pixel, s, idx_stack = res
        d_color, _ = cts                      # rays_cast is integer: no ct

        def rg(cam):
            o, d, _ = camera_rays(cam, width, height, pixel, s, seed)
            return o, d

        (o, d), rg_vjp = jax.vjp(rg, camera)
        base = camera_rays(camera, width, height, pixel, s, seed)[2]
        # same deterministic permutation as _forward: the saved idx stack
        # lives in Morton order, and d_table scatters back through the
        # permutation's vjp
        perm = morton_perm(scene)
        table, table_vjp = jax.vjp(
            lambda sc: scene_table(permute_spheres(sc, perm)), scene)
        t48 = table_chunks(table)
        st0, r, r_pad = _init_state(o, d, base, block_r)
        bounces = jnp.arange(max_bounces, dtype=jnp.int32)
        idx_stack = idx_stack.astype(jnp.int32)

        # replay: per-bounce INPUT states, stacked [B,16,R_pad] (transient —
        # only live inside this sample's backward)
        def rbody(st, binfo):
            b, idx = binfo
            st2 = bounce_replay(t48, st, idx, b, use_sky=scene.use_sky,
                                block_r=block_r)
            return st2, st

        _, states = jax.lax.scan(rbody, st0, (bounces, idx_stack))

        d_st = jnp.zeros((16, r_pad), jnp.float32)
        d_st = d_st.at[9:12, :r].set(d_color.T)

        def bbody(carry, binfo):
            d_st, d_table = carry
            b, idx, st_in = binfo
            d_in, d_tab = bounce_bwd(t48, st_in, idx, b, d_st,
                                     use_sky=scene.use_sky, block_r=block_r)
            return (d_in, d_table + d_tab), None

        (d_st0, d_table), _ = jax.lax.scan(
            bbody, (d_st, jnp.zeros_like(table)),
            (bounces, idx_stack, states), reverse=True)

        d_o = d_st0[0:3, :r].T
        d_d = d_st0[3:6, :r].T
        (d_camera,) = rg_vjp((d_o, d_d))
        d_scene = table_vjp(d_table)[0]
        return (d_scene, d_camera,
                np.zeros(pixel.shape, dtype=jax.dtypes.float0),
                np.zeros(jnp.shape(s), dtype=jax.dtypes.float0))

    fused_sample.defvjp(fwd, bwd)
    return fused_sample
