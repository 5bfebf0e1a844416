"""Fused bounce mega-kernels: search + winner gather + shading in one pass,
forward AND backward, for BOTH primitive types (spheres and triangles).

The forward render's cost splits ~2:1 between the O(R*P) search and O(R)
per-bounce work (payload gathers, scatter math, RNG) — the latter is slow in
XLA because every elementwise step round-trips the wavefront through HBM and
the winner gathers are row-granular. These kernels keep one ray block
entirely in VMEM for a whole bounce. This is the TPU translation of the
reference's whole RenderTile inner loop (reference main.cpp:387-482) as ONE
kernel per bounce, for BOTH sweeps (SURVEY.md §7 step 4: "custom_vjp pairing
forward Pallas with a hand-written backward ... saved-hit replay").

Grid layout: (ray blocks, primitive tiles). The ray-state block [16, BLOCK_R]
stays resident in VMEM across the whole tile sweep (rightmost grid dim is
innermost); each tile step streams one search-coefficient block and folds its
candidates into a per-ray running-min scratch carry; the LAST tile step
finalizes: winner unpack, tiled one-hot gather, shading, state write-out.
Sphere tiles come first (block_n spheres each), triangle tiles after
(block_m triangles each, Möller-Trumbore) — one global primitive id space
(spheres, then tris), matching ops/intersect_tri.merge_payloads. The tile
axis is also the unit of conservative culling (cull_mask) and lifts any
whole-scene VMEM cap: primitive counts are bounded by HBM, not VMEM.

  1. sphere search: ONE K-stacked MXU matmul per tile ([2bn,54] @ [54,BR])
     computes the quadratic setup off the ray monomials; the root-selection
     chain is ~12 VPU ops/pair; invalid roots are rejected arithmetically
     (sqrt(disc<0) -> NaN, t <= eps -> negative: both order ABOVE every real
     hit under the sign-flipped-bits integer order).
  2. triangle search: ONE K-stacked matmul per tile ([4bm,96] @ [96,BR])
     computes det / t*det / u*det / v*det row-stacked (the MXU bilinear
     recast of Möller-Trumbore, kernels/tri_intersect.py), then the
     sign-folded barycentric tests (~19 VPU ops/pair).
  3. nearest hit: packed (t-bits | global index) single-reduction argmin
     carried across tiles in one i32 scratch; auto-falls back to the exact
     two-scratch carry when the index bits would eat too much mantissa
     (P > _PACK_MAX_P) or on request (exact_argmin).
  4. winner "gather" as tiled MXU matmuls: table [48,Pt] @ one_hot [Pt,BR]
     accumulated over <=1024-wide primitive tiles (the one-hot operand never
     exists in HBM, and VMEM never holds more than one tile of it).
  5. payload recompute + shading + counter RNG as [1,BR] lane-packed ops;
     triangles recompute t from the plane equation n.x = k (algebraically
     identical to Möller-Trumbore's t), whose (n, k) live in the same winner
     channels as the sphere (center, radius).

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
                       d_state_in and the d_table partial via tiled MXU
                       matmuls d_winner @ one_hot^T accumulated across the
                       (sequential) ray-block grid.

`make_fused_sample` wires them into a jax.custom_vjp over one full
(raygen -> B bounces) sample: forward saves ONLY the [B, R] i16 index stack
(+ the tiny scene/camera pytrees); backward re-derives rays from the camera,
replays states, then runs the reverse bounce sweep. Residual memory matches
the jnp path's 'save_hits' policy; compute never re-runs the O(R*P) search.

State channel layout [16, R] (f32; ch 13 is u32 bitcast):
   0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 color,
   12 alive (0/1), 13 rng stream base, 14-15 unused.
Winner table layout [16, P] (`prim_table`): sphere columns
   0-2 center, 3 radius, 4-6 albedo, 7-9 emissive, 10 specular, 11 ior;
triangle columns (same material slots)
   0-2 geometric normal e1 x e2 (area-scaled), 3 plane constant n.v0.
Sphere search table [2N, 54] bf16 (`search_table`, stop-gradient by
construction): stacked tp / q coefficient rows against the ray monomials
[o, d, o.d, |o|^2, 1], K-stacked as exact bf16 chunk groups — see
`_tile_roots`. Triangle search table [4M, 96] bf16: see
kernels/tri_intersect.tri_search_tables.
"""
from __future__ import annotations

import dataclasses
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
_PACK_MAX_P = 2048   # beyond this the packed index bits cost >2^-13 of t
_GATHER_TILE = 1024  # primitive tile of the one-hot winner gather (VMEM)
_SPH_TILE_MAX = 1024  # sphere tile cap (tpq [2bn,BR] f32 = 8 MB scoped VMEM)
# Triangle tile = TRI_PAD (128) everywhere: every soup padding divides it,
# so ONE [4M,96] table serves the culled and uncalled paths, and the
# kernel's tri m_pad equals the soup's (global ids stay in range). tpq4 is
# [512,BR] f32 = 2 MB scoped VMEM per tile.
_TRI_TILE = 128
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


def _shade(st, winner, live, sky_mask, rand, use_sky: bool, is_tri=None):
    """One bounce's smooth state update given the (non-diff) winner.

    st [16,BR] f32 state, winner [16,BR] gathered winner columns (garbage on
    non-live lanes — masked out), live / sky_mask [1,BR] bool closures
    (alive&hit / alive&miss), rand = 4x [1,BR] f32 draws, is_tri optional
    [1,BR] bool closure (the winner is a triangle; None for sphere-only
    scenes — a static property, so the triangle chain costs nothing there).
    -> [16,BR].

    Differentiable w.r.t. st and winner: this single function is the
    reference's per-pixel shading (main.cpp:446-481 + sky 433-440 + payload
    recompute 401-417, extended with the triangle plane recompute of
    ops/intersect_tri.tri_payload), and `_bwd_kernel` takes jax.vjp of it
    in-kernel. Every sqrt/normalize/reciprocal is guarded so reverse-mode
    never sees sqrt(0)/NaN/inf.
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

    # sphere payload recompute (projection form, reference main.cpp:401-417)
    mx, my, mz = cx_ - ox_, cy_ - oy_, cz_ - oz_
    tp2 = mx * dx_ + my * dy_ + mz * dz_
    px_, py_, pz_ = mx - dx_ * tp2, my - dy_ * tp2, mz - dz_ * tp2
    dsq = px_ * px_ + py_ * py_ + pz_ * pz_
    xx = _safe_sqrt(r_ * r_ - dsq)
    tn = tp2 - xx
    inside = tn < F32_EPS
    tt = jnp.where(inside, tp2 + xx, tn)
    # sphere outward normal at the hit (area-scale r)
    nrx, nry, nrz = dx_ * tt - mx, dy_ * tt - my, dz_ * tt - mz

    if is_tri is not None:
        # triangle payload recompute (plane form): winner carries the
        # geometric normal n = e1 x e2 in the center slots and the plane
        # constant k = n.v0 in the radius slot; t = (k - n.o)/(n.d) is
        # algebraically Möller-Trumbore's t (ops/intersect_tri.tri_payload),
        # inside = backface (d.n > 0, reference main.cpp:456-458 rule)
        nd = dx_ * cx_ + dy_ * cy_ + dz_ * cz_
        no = ox_ * cx_ + oy_ * cy_ + oz_ * cz_
        t_t = (r_ - no) / jnp.where(nd == 0.0, 1.0, nd)
        tt = jnp.where(is_tri, t_t, tt)
        # mask algebra, not select_n: Mosaic rejects i1-valued select_n
        # ("Unsupported target bitwidth for truncation") when this chain is
        # inlined into the regen kernel's while-loop body; (a&p)|(~a&q) is
        # the identical boolean function and lowers everywhere.
        inside = (is_tri & (nd > 0.0)) | (jnp.logical_not(is_tri) & inside)
        nrx = jnp.where(is_tri, cx_, nrx)
        nry = jnp.where(is_tri, cy_, nry)
        nrz = jnp.where(is_tri, cz_, nrz)

    nox, noy, noz = ox_ + dx_ * tt, oy_ + dy_ * tt, oz_ + dz_ * tt

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


def _nrm3_fwd(x, y, z):
    """normalize_eps forward returning (yx,yy,yz, inv, ok) for reuse by the
    hand transpose."""
    lsq = x * x + y * y + z * z
    ok = lsq > F32_EPS
    inv = jax.lax.rsqrt(jnp.where(ok, lsq, 1.0))
    zero = jnp.zeros_like(x)
    return (jnp.where(ok, x * inv, zero), jnp.where(ok, y * inv, zero),
            jnp.where(ok, z * inv, zero), inv, ok)


def _nrm3_bwd(yx, yy, yz, inv, ok, gx, gy, gz):
    """Transpose of normalize_eps given its forward's (y, inv, ok):
    d_x = where(ok, inv * (g - y (y.g)), 0)."""
    s = yx * gx + yy * gy + yz * gz
    zero = jnp.zeros_like(gx)
    return (jnp.where(ok, (gx - yx * s) * inv, zero),
            jnp.where(ok, (gy - yy * s) * inv, zero),
            jnp.where(ok, (gz - yz * s) * inv, zero))


def _shade_vjp(st, winner, live, sky_mask, rand, use_sky: bool, g,
               is_tri=None):
    """Hand-written transpose of `_shade`: recompute the forward chain
    inline and push the cotangent g [16,BR] (rows 12-15 ignored: row 12 is
    the non-differentiable alive flag, rows 13-15 pass st through and their
    cotangent is g's) back to (d_st [16,BR], d_winner [16,BR]).

    Replaces the in-kernel jax.vjp of `_shade` in the segment backward
    (VERDICT r3 item 2): the linearize-then-transpose route materializes a
    residual for every nonlinear op before sweeping, where this fused form
    consumes each recomputed primal immediately — no residual stack, same
    math. Branch-free paths whose only consumer is a boolean (Schlick,
    sin_t, the `cant` test) have zero cotangent and are skipped outright.
    Verified against jax.vjp(_shade) to f32 exactness on randomized states
    (tests/test_regen_grad.py::test_shade_vjp_matches_autodiff)."""
    def ch(a, c):
        return a[c:c + 1, :]

    o0, o1, o2 = ch(st, 0), ch(st, 1), ch(st, 2)
    d0, d1, d2 = ch(st, 3), ch(st, 4), ch(st, 5)
    a0, a1, a2 = ch(st, 6), ch(st, 7), ch(st, 8)

    w0, w1, w2 = ch(winner, 0), ch(winner, 1), ch(winner, 2)
    r_ = ch(winner, 3)
    al0, al1, al2 = ch(winner, 4), ch(winner, 5), ch(winner, 6)
    spec = ch(winner, 10)
    ior = ch(winner, 11)

    zero = jnp.zeros_like(o0)

    # ---- forward recompute (primal values the transpose needs) ----
    # sphere payload
    m0, m1, m2 = w0 - o0, w1 - o1, w2 - o2
    tp2 = m0 * d0 + m1 * d1 + m2 * d2
    p0, p1, p2 = m0 - d0 * tp2, m1 - d1 * tp2, m2 - d2 * tp2
    dsq = p0 * p0 + p1 * p1 + p2 * p2
    qv = r_ * r_ - dsq
    qpos = qv > 0.0
    xx = jnp.where(qpos, jnp.sqrt(jnp.where(qpos, qv, 1.0)), 0.0)
    tn = tp2 - xx
    inside = tn < F32_EPS
    tt = jnp.where(inside, tp2 + xx, tn)
    nr0, nr1, nr2 = d0 * tt - m0, d1 * tt - m1, d2 * tt - m2
    if is_tri is not None:
        ndd = d0 * w0 + d1 * w1 + d2 * w2
        noo = o0 * w0 + o1 * w1 + o2 * w2
        den = jnp.where(ndd == 0.0, 1.0, ndd)
        t_t = (r_ - noo) / den
        tt = jnp.where(is_tri, t_t, tt)
        inside = (is_tri & (ndd > 0.0)) | (jnp.logical_not(is_tri) & inside)
        nr0 = jnp.where(is_tri, w0, nr0)
        nr1 = jnp.where(is_tri, w1, nr1)
        nr2 = jnp.where(is_tri, w2, nr2)
    # scatter chain primals
    nx, ny, nz, n_inv, n_ok = _nrm3_fwd(nr0, nr1, nr2)
    dn = d0 * nx + d1 * ny + d2 * nz
    pu0, pu1, pu2 = d0 - 2.0 * dn * nx, d1 - 2.0 * dn * ny, \
        d2 - 2.0 * dn * nz
    sgn = jnp.where(inside, -1.0, 1.0)
    t20, t21, t22 = sgn * nx, sgn * ny, sgn * nz
    r0, r1, r2, rrefl = rand
    ru0, ru1, ru2, _, _ = _nrm3_fwd(r0, r1, r2)
    rb0, rb1, rb2 = t20 + ru0, t21 + ru1, t22 + ru2
    omspec = 1.0 - spec
    mx0 = omspec * rb0 + spec * pu0
    mx1 = omspec * rb1 + spec * pu1
    mx2 = omspec * rb2 + spec * pu2
    ddx, ddy, ddz, dd_inv, dd_ok = _nrm3_fwd(mx0, mx1, mx2)
    is_diel = ior != 0.0
    ior_safe = jnp.where(is_diel, ior, 1.0)
    ri = jnp.where(inside, ior_safe, 1.0 / ior_safe)
    uu = -(d0 * t20 + d1 * t21 + d2 * t22)
    cos_t = jnp.minimum(uu, 1.0)
    sin_t_sq = 1.0 - cos_t * cos_t
    spos = sin_t_sq > 0.0
    sin_t = jnp.where(spos, jnp.sqrt(jnp.where(spos, sin_t_sq, 1.0)), 0.0)
    cant = ri * sin_t > 1.0
    pe0 = ri * (d0 + cos_t * t20)
    pe1 = ri * (d1 + cos_t * t21)
    pe2 = ri * (d2 + cos_t * t22)
    psq = pe0 * pe0 + pe1 * pe1 + pe2 * pe2
    wv = 1.0 - psq
    zv = jnp.abs(wv)
    zpos = zv > 0.0
    sq = jnp.where(zpos, jnp.sqrt(jnp.where(zpos, zv, 1.0)), 0.0)
    par = -sq
    pf0, pf1, pf2 = pe0 + par * t20, pe1 + par * t21, pe2 + par * t22
    rfx, rfy, rfz, rf_inv, rf_ok = _nrm3_fwd(pf0, pf1, pf2)
    sr0 = (1.0 - ri) / (1.0 + ri)
    sr0 = sr0 * sr0
    sr1 = 1.0 - cos_t
    sr1 = sr1 * sr1 * sr1 * sr1 * sr1
    schlick = sr0 + (1.0 - sr0) * sr1
    choose_reflect = (cant | (schlick > rrefl)) & ~inside

    # ---- transpose ----
    g_no0 = jnp.where(live, ch(g, 0), zero)
    g_no1 = jnp.where(live, ch(g, 1), zero)
    g_no2 = jnp.where(live, ch(g, 2), zero)
    g_nd0 = jnp.where(live, ch(g, 3), zero)
    g_nd1 = jnp.where(live, ch(g, 4), zero)
    g_nd2 = jnp.where(live, ch(g, 5), zero)
    g_a0, g_a1, g_a2 = ch(g, 6), ch(g, 7), ch(g, 8)
    g_c0, g_c1, g_c2 = ch(g, 9), ch(g, 10), ch(g, 11)

    d_o0 = jnp.where(live, zero, ch(g, 0))
    d_o1 = jnp.where(live, zero, ch(g, 1))
    d_o2 = jnp.where(live, zero, ch(g, 2))
    d_d0 = jnp.where(live, zero, ch(g, 3))
    d_d1 = jnp.where(live, zero, ch(g, 4))
    d_d2 = jnp.where(live, zero, ch(g, 5))

    # attenuation / emissive / albedo (forward: c' = c + em*a; a' = a*al)
    em0_, em1_, em2_ = ch(winner, 7), ch(winner, 8), ch(winner, 9)
    d_em0 = jnp.where(live, g_c0 * a0, zero)
    d_em1 = jnp.where(live, g_c1 * a1, zero)
    d_em2 = jnp.where(live, g_c2 * a2, zero)
    d_al0 = jnp.where(live, g_a0 * a0, zero)
    d_al1 = jnp.where(live, g_a1 * a1, zero)
    d_al2 = jnp.where(live, g_a2 * a2, zero)
    d_a0 = jnp.where(live, g_a0 * al0 + g_c0 * em0_, g_a0)
    d_a1 = jnp.where(live, g_a1 * al1 + g_c1 * em1_, g_a1)
    d_a2 = jnp.where(live, g_a2 * al2 + g_c2 * em2_, g_a2)
    if use_sky:
        sa = (d1 + 1.0) * 0.5
        d_a0 = d_a0 + jnp.where(sky_mask, (1.0 - 0.5 * sa) * g_c0, zero)
        d_a1 = d_a1 + jnp.where(sky_mask, (1.0 - 0.3 * sa) * g_c1, zero)
        d_a2 = d_a2 + jnp.where(sky_mask, g_c2, zero)
        d_d1 = d_d1 + jnp.where(
            sky_mask, -0.25 * a0 * g_c0 - 0.15 * a1 * g_c1, zero)

    # scatter transpose: ndir = where(is_diel, where(cr, pure, rf), dd)
    d_dl0 = jnp.where(is_diel, g_nd0, zero)
    d_dl1 = jnp.where(is_diel, g_nd1, zero)
    d_dl2 = jnp.where(is_diel, g_nd2, zero)
    g_dd0 = jnp.where(is_diel, zero, g_nd0)
    g_dd1 = jnp.where(is_diel, zero, g_nd1)
    g_dd2 = jnp.where(is_diel, zero, g_nd2)
    d_pu0 = jnp.where(choose_reflect, d_dl0, zero)
    d_pu1 = jnp.where(choose_reflect, d_dl1, zero)
    d_pu2 = jnp.where(choose_reflect, d_dl2, zero)
    g_rf0 = jnp.where(choose_reflect, zero, d_dl0)
    g_rf1 = jnp.where(choose_reflect, zero, d_dl1)
    g_rf2 = jnp.where(choose_reflect, zero, d_dl2)

    # rf = nrm(pf), pf = perp + par*n2
    d_pf0, d_pf1, d_pf2 = _nrm3_bwd(rfx, rfy, rfz, rf_inv, rf_ok,
                                    g_rf0, g_rf1, g_rf2)
    d_pe0, d_pe1, d_pe2 = d_pf0, d_pf1, d_pf2
    d_par = t20 * d_pf0 + t21 * d_pf1 + t22 * d_pf2
    d_t20 = par * d_pf0
    d_t21 = par * d_pf1
    d_t22 = par * d_pf2
    # par = -sqrt(|1 - psq|)
    d_z = jnp.where(zpos, -d_par / (2.0 * jnp.where(zpos, sq, 1.0)), zero)
    d_psq = -jnp.sign(wv) * d_z
    d_pe0 = d_pe0 + 2.0 * pe0 * d_psq
    d_pe1 = d_pe1 + 2.0 * pe1 * d_psq
    d_pe2 = d_pe2 + 2.0 * pe2 * d_psq
    # perp = ri*(d + cos_t*n2)
    d_ri = (d0 + cos_t * t20) * d_pe0 + (d1 + cos_t * t21) * d_pe1 \
        + (d2 + cos_t * t22) * d_pe2
    d_d0 = d_d0 + ri * d_pe0
    d_d1 = d_d1 + ri * d_pe1
    d_d2 = d_d2 + ri * d_pe2
    d_cos = ri * (t20 * d_pe0 + t21 * d_pe1 + t22 * d_pe2)
    d_t20 = d_t20 + ri * cos_t * d_pe0
    d_t21 = d_t21 + ri * cos_t * d_pe1
    d_t22 = d_t22 + ri * cos_t * d_pe2
    # cos_t = min(-(d.n2), 1)
    d_u = jnp.where(uu <= 1.0, d_cos, zero)
    d_d0 = d_d0 - t20 * d_u
    d_d1 = d_d1 - t21 * d_u
    d_d2 = d_d2 - t22 * d_u
    d_t20 = d_t20 - d0 * d_u
    d_t21 = d_t21 - d1 * d_u
    d_t22 = d_t22 - d2 * d_u
    # ri = where(inside, ior_safe, 1/ior_safe); ior_safe = where(diel, ior, 1)
    d_iorsafe = jnp.where(inside, d_ri,
                          -d_ri / (ior_safe * ior_safe))
    d_ior = jnp.where(is_diel, d_iorsafe, zero)
    # dd = nrm(mix), mix = omspec*rb + spec*pure
    d_mx0, d_mx1, d_mx2 = _nrm3_bwd(ddx, ddy, ddz, dd_inv, dd_ok,
                                    g_dd0, g_dd1, g_dd2)
    d_spec = (pu0 - rb0) * d_mx0 + (pu1 - rb1) * d_mx1 + (pu2 - rb2) * d_mx2
    d_t20 = d_t20 + omspec * d_mx0          # rb = n2 + ru (ru const)
    d_t21 = d_t21 + omspec * d_mx1
    d_t22 = d_t22 + omspec * d_mx2
    d_pu0 = d_pu0 + spec * d_mx0
    d_pu1 = d_pu1 + spec * d_mx1
    d_pu2 = d_pu2 + spec * d_mx2
    # pure = d - 2*dn*n
    d_d0 = d_d0 + d_pu0
    d_d1 = d_d1 + d_pu1
    d_d2 = d_d2 + d_pu2
    d_dn = -2.0 * (nx * d_pu0 + ny * d_pu1 + nz * d_pu2)
    d_nx = -2.0 * dn * d_pu0
    d_ny = -2.0 * dn * d_pu1
    d_nz = -2.0 * dn * d_pu2
    # n2 = sgn*n
    d_nx = d_nx + sgn * d_t20
    d_ny = d_ny + sgn * d_t21
    d_nz = d_nz + sgn * d_t22
    # dn = d.n
    d_d0 = d_d0 + nx * d_dn
    d_d1 = d_d1 + ny * d_dn
    d_d2 = d_d2 + nz * d_dn
    d_nx = d_nx + d0 * d_dn
    d_ny = d_ny + d1 * d_dn
    d_nz = d_nz + d2 * d_dn
    # n = nrm(nr)
    d_nr0, d_nr1, d_nr2 = _nrm3_bwd(nx, ny, nz, n_inv, n_ok,
                                    d_nx, d_ny, d_nz)

    # no = o + d*tt
    d_o0 = d_o0 + g_no0
    d_o1 = d_o1 + g_no1
    d_o2 = d_o2 + g_no2
    d_d0 = d_d0 + g_no0 * tt
    d_d1 = d_d1 + g_no1 * tt
    d_d2 = d_d2 + g_no2 * tt
    d_tt = d0 * g_no0 + d1 * g_no1 + d2 * g_no2

    d_w0 = zero
    d_w1 = zero
    d_w2 = zero
    d_r = zero
    if is_tri is not None:
        # nr/tt selects + plane recompute on tri lanes
        d_w0 = d_w0 + jnp.where(is_tri, d_nr0, zero)
        d_w1 = d_w1 + jnp.where(is_tri, d_nr1, zero)
        d_w2 = d_w2 + jnp.where(is_tri, d_nr2, zero)
        d_nr0 = jnp.where(is_tri, zero, d_nr0)
        d_nr1 = jnp.where(is_tri, zero, d_nr1)
        d_nr2 = jnp.where(is_tri, zero, d_nr2)
        d_tt_t = jnp.where(is_tri, d_tt, zero)
        d_tt = jnp.where(is_tri, zero, d_tt)
        # t_t = (r - o.n)/den, den = where(ndd==0, 1, ndd)
        d_r = d_r + d_tt_t / den
        d_noo = -d_tt_t / den
        d_den = -(r_ - noo) / (den * den) * d_tt_t
        d_ndd = jnp.where(ndd == 0.0, zero, d_den)
        d_o0 = d_o0 + d_noo * w0
        d_o1 = d_o1 + d_noo * w1
        d_o2 = d_o2 + d_noo * w2
        d_d0 = d_d0 + d_ndd * w0
        d_d1 = d_d1 + d_ndd * w1
        d_d2 = d_d2 + d_ndd * w2
        d_w0 = d_w0 + d_noo * o0 + d_ndd * d0
        d_w1 = d_w1 + d_noo * o1 + d_ndd * d1
        d_w2 = d_w2 + d_noo * o2 + d_ndd * d2

    # nr_s = d*tt - m
    d_d0 = d_d0 + d_nr0 * tt
    d_d1 = d_d1 + d_nr1 * tt
    d_d2 = d_d2 + d_nr2 * tt
    d_tt = d_tt + d0 * d_nr0 + d1 * d_nr1 + d2 * d_nr2
    d_m0 = -d_nr0
    d_m1 = -d_nr1
    d_m2 = -d_nr2
    # tt = where(inside, tp2+xx, tp2-xx)
    d_tp2 = d_tt
    d_xx = jnp.where(inside, d_tt, -d_tt)
    # xx = safe_sqrt(r^2 - |p|^2)
    d_q = jnp.where(qpos, d_xx / (2.0 * jnp.where(qpos, xx, 1.0)), zero)
    d_r = d_r + 2.0 * r_ * d_q
    d_p0 = -2.0 * p0 * d_q
    d_p1 = -2.0 * p1 * d_q
    d_p2 = -2.0 * p2 * d_q
    # p = m - d*tp2
    d_m0 = d_m0 + d_p0
    d_m1 = d_m1 + d_p1
    d_m2 = d_m2 + d_p2
    d_d0 = d_d0 - d_p0 * tp2
    d_d1 = d_d1 - d_p1 * tp2
    d_d2 = d_d2 - d_p2 * tp2
    d_tp2 = d_tp2 - (d0 * d_p0 + d1 * d_p1 + d2 * d_p2)
    # tp2 = m.d
    d_m0 = d_m0 + d0 * d_tp2
    d_m1 = d_m1 + d1 * d_tp2
    d_m2 = d_m2 + d2 * d_tp2
    d_d0 = d_d0 + m0 * d_tp2
    d_d1 = d_d1 + m1 * d_tp2
    d_d2 = d_d2 + m2 * d_tp2
    # m = cen - o
    d_w0 = d_w0 + d_m0
    d_w1 = d_w1 + d_m1
    d_w2 = d_w2 + d_m2
    d_o0 = d_o0 - d_m0
    d_o1 = d_o1 - d_m1
    d_o2 = d_o2 - d_m2

    d_st = jnp.concatenate([
        d_o0, d_o1, d_o2, d_d0, d_d1, d_d2, d_a0, d_a1, d_a2,
        g_c0, g_c1, g_c2, zero, g[13:16, :],
    ], axis=0)
    d_winner = jnp.concatenate([
        d_w0, d_w1, d_w2, d_r, d_al0, d_al1, d_al2,
        d_em0, d_em1, d_em2, d_spec, d_ior,
        zero, zero, zero, zero,
    ], axis=0)
    return d_st, d_winner


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _gather_winner(table_ref, idx, p_pad: int):
    """Winner gather as tiled EXACT 3-pass bf16 matmuls: the one-hot operand
    is bf16-representable (0/1) and the f32 table is pre-split into three
    bf16 chunks whose sum reconstructs it exactly (8+8+8 mantissa bits), so
    DEFAULT-precision passes with f32 accumulation equal the f32 gather.
    Tiled over <=_GATHER_TILE-wide primitive slices so the one-hot never
    exceeds ~2 MB of VMEM at any primitive count. idx [1,BR] i32; -1
    (miss/dead) selects no row -> all-zero winner column."""
    br = idx.shape[1]
    w48 = jnp.zeros((48, br), jnp.float32)
    last_oh = None
    for p0 in range(0, p_pad, _GATHER_TILE):
        pb = min(_GATHER_TILE, p_pad - p0)
        last_oh = _onehot_tile(idx, p0, pb)
        w48 = w48 + jnp.dot(table_ref[:, p0:p0 + pb], last_oh,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    winner = w48[0:16, :] + w48[16:32, :] + w48[32:48, :]
    # single-tile one-hot returned for reuse by the backward's transpose
    return winner, (last_oh if p_pad <= _GATHER_TILE else None)


def _onehot_tile(idx, p0: int, pb: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (pb, idx.shape[1]), 0) + p0
    return (rows == idx).astype(jnp.bfloat16)


def gather_table_rt(table48, n_gt: int):
    """Host-side re-layout of a [48,P] chunk table for LIST-driven winner
    gathers: zero-pad P to n_gt*_GATHER_TILE columns and stack the column
    tiles on the sublane axis -> [n_gt*48, _GATHER_TILE], so a kernel can
    slice tile ti with pl.ds(ti*48, 48) (sublane dynamic slices are the
    Mosaic-supported direction; lane-axis dynamic slices are not)."""
    p_pad = table48.shape[1]
    p_gt = n_gt * _GATHER_TILE
    if p_gt > p_pad:
        table48 = jnp.concatenate(
            [table48, jnp.zeros((48, p_gt - p_pad), table48.dtype)], axis=1)
    return (table48.reshape(48, n_gt, _GATHER_TILE)
            .swapaxes(0, 1).reshape(n_gt * 48, _GATHER_TILE))


def _gather_winner_list(t48r_ref, idx, cnt, tile_at):
    """`_gather_winner` folding ONLY the gather tiles in this block's
    record-derived list: winners can live only in tiles some record names,
    so the skipped tiles contribute zero columns by construction. t48r_ref
    [n_gt*48, GT] (gather_table_rt layout), cnt scalar i32, tile_at(k) ->
    tile id scalar (SMEM read). ~cnt/n_gt of the full gather's MXU+VPU
    work — the big-table term that made regen lose the trimesh gradient."""
    br = idx.shape[1]

    def body(k, w48):
        ti = tile_at(k)
        rows = t48r_ref[pl.ds(ti * 48, 48), :]
        oh = _onehot_tile(idx - ti * _GATHER_TILE, 0, _GATHER_TILE)
        return w48 + jnp.dot(rows, oh,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)

    w48 = jax.lax.fori_loop(0, cnt, body,
                            jnp.zeros((48, br), jnp.float32))
    return w48[0:16, :] + w48[16:32, :] + w48[32:48, :]


def _scatter_dtable_list(dtab_s, d_wn, idx, cnt, tile_at):
    """List-driven form of `_scatter_dtable`, accumulating into a VMEM
    scratch in the gather_table_rt SUBLANE-stacked layout [n_gt*16, GT]
    (host reassembles via dtable_rt_to_flat): only listed tiles pay the
    one-hot build + transpose matmul + accumulate."""
    c1, c2, c3 = _split3_bf16(
        d_wn, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    c = jnp.concatenate([c1, c2, c3], axis=0)              # [48,BR]

    def body(k, _):
        ti = tile_at(k)
        oh = _onehot_tile(idx - ti * _GATHER_TILE, 0, _GATHER_TILE)
        d48 = jax.lax.dot_general(
            c, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [48,GT]
        d16 = d48[0:16, :] + d48[16:32, :] + d48[32:48, :]
        dtab_s[pl.ds(ti * 16, 16), :] = dtab_s[pl.ds(ti * 16, 16), :] + d16
        return 0

    jax.lax.fori_loop(0, cnt, body, 0)


def dtable_rt_to_flat(d_rt, p_pad: int):
    """[n_gt*16, GT] sublane-stacked d_table partial -> [16, p_pad]."""
    n_gt = d_rt.shape[0] // 16
    return (d_rt.reshape(n_gt, 16, _GATHER_TILE).swapaxes(0, 1)
            .reshape(16, n_gt * _GATHER_TILE)[:, :p_pad])


def gather_tile_lists(recs, br_bwd: int, n_gt: int):
    """Per-(segment, backward ray block) compacted gather-tile lists from
    the saved winner records: tile ti is listed iff some record in that
    (segment, block) names a primitive in it. recs [n_seg, seg, R] i32
    (-1 = miss/dead). -> (cnt [n_seg, 1, B] i32, lst [n_seg, n_gt, B] i32,
    reachable tiles first, ascending id) — block-MINOR layout, because
    SMEM windows pad the minor dim to 128 lanes (a [B,1] table at B ~8k
    blocks compiles to 4 MB of SMEM and OOMs; [1,B] is 32 KB). The
    backward analogue of tri_block_lists, driven by RECORDS (exact
    winners) instead of geometry — sharper, and free: the records
    already exist."""
    n_seg, seg, r_pad = recs.shape
    n_b = r_pad // br_bwd
    tid = recs.reshape(n_seg, seg, n_b, br_bwd)
    tid = jnp.where(tid >= 0, tid // _GATHER_TILE, -1)
    pres = jnp.stack([(tid == t).any(axis=(1, 3))
                      for t in range(n_gt)], axis=-1)      # [n_seg,B,n_gt]
    cnt = pres.sum(-1).astype(jnp.int32)[:, None, :]       # [n_seg,1,B]
    lst = jnp.argsort(jnp.logical_not(pres),
                      axis=-1).astype(jnp.int32).swapaxes(1, 2)
    return cnt, lst


def _dtable_delta(d_wn, idx, p_pad: int, onehot=None):
    """Gather transpose on the MXU, same exact 3-chunk bf16 scheme, tiled
    like _gather_winner: -> this block's d_table contribution [16, P]
    (a VALUE, so callers can carry it in registers and keep their grid
    dimension parallel instead of serializing on a shared accumulator
    ref). onehot: pre-built single-tile one-hot to reuse
    (p_pad <= _GATHER_TILE; saves the second O(P) comparison sweep)."""
    c1, c2, c3 = _split3_bf16(
        d_wn, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    c = jnp.concatenate([c1, c2, c3], axis=0)              # [48,BR]
    parts = []
    for p0 in range(0, p_pad, _GATHER_TILE):
        pb = min(_GATHER_TILE, p_pad - p0)
        oh = onehot if onehot is not None else _onehot_tile(idx, p0, pb)
        d48 = jax.lax.dot_general(
            c, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [48,pb]
        parts.append(d48[0:16, :] + d48[16:32, :] + d48[32:48, :])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _scatter_dtable(dtable_ref, d_wn, idx, p_pad: int, onehot=None):
    """Ref-accumulating form of _dtable_delta: d_table += delta (callers
    whose grid is already sequential)."""
    dtable_ref[:] = dtable_ref[:] + _dtable_delta(d_wn, idx, p_pad, onehot)


def _sph_bk(st):
    """The [54,BR] K-stacked bf16-split ray-monomial matrix of the sphere
    search matmul ([o, d, o.d, |o|^2, 1] chunk-stacked) — depends only on
    the ray block, so list kernels hoist it out of their per-tile loop
    (the streamed kernel recomputes per grid step)."""
    o = st[0:3, :]
    d = st[3:6, :]
    oo = jnp.sum(o * o, axis=0, keepdims=True)       # [1,BR]
    od = jnp.sum(o * d, axis=0, keepdims=True)
    one = jnp.ones_like(oo)
    feats = jnp.concatenate([o, d, od, oo, one], axis=0)   # [9,BR]
    b1, b2, b3 = _split3_bf16(
        feats, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    return jnp.concatenate([b1, b2, b1, b3, b2, b1], axis=0)  # [54,BR]


def _tile_roots(st, stab_ref, block_n: int, bk=None):
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
    if bk is None:
        bk = _sph_bk(st)
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


def _tri_bk(st):
    """The [96,BR] K-stacked bf16-split ray-monomial matrix of the MT
    matmul — depends only on the ray block, so the list kernel hoists it
    out of its per-tile loop (the streamed kernel recomputes per grid
    step; there is no loop to hoist from)."""
    o = st[0:3, :]
    d = st[3:6, :]
    w = [o[j:j + 1, :] * d[k:k + 1, :] for j in range(3) for k in range(3)]
    one = jnp.ones_like(o[0:1, :])
    feats = jnp.concatenate([o, d, *w, one], axis=0)       # [16,BR]
    b1, b2, b3 = _split3_bf16(
        feats, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    return jnp.concatenate([b1, b2, b1, b3, b2, b1], axis=0)  # [96,BR]


def _tile_tri_t(st, tri_ref, block_m: int, bk=None):
    """Shifted Möller-Trumbore valid-t for ONE triangle tile, [bm,BR]
    (t - eps where valid, F32_MAX otherwise — F32_MAX orders as the miss
    sentinel in both carry modes). One K-stacked DEFAULT matmul computes
    det / t*det / u*det / v*det row-stacked against the ray monomials
    [o, d, o (x) d, 1] (kernels/tri_intersect._tri_t, same math)."""
    from tpu_ray.ops.intersect_tri import _DET_EPS
    if bk is None:
        bk = _tri_bk(st)
    tpq = jnp.dot(tri_ref[:], bk, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)     # [4bm,BR]
    det = tpq[0:block_m, :]
    t_d = tpq[block_m:2 * block_m, :]
    u_d = tpq[2 * block_m:3 * block_m, :]
    v_d = tpq[3 * block_m:4 * block_m, :]

    s = jnp.where(det >= 0.0, 1.0, -1.0)
    absdet = det * s
    us = u_d * s
    vs = v_d * s
    t = t_d * (1.0 / jnp.where(absdet > _DET_EPS, det, 1.0))
    valid = ((absdet > _DET_EPS) & (us >= 0.0) & (vs >= 0.0)
             & (us + vs <= absdet) & (t > F32_EPS))
    return jnp.where(valid, t - F32_EPS, F32_MAX)


# (Measured dead ends, r3, both bit-identical and both TPU losses:
#  per-tile @pl.when AABB gating of the streamed tri sweep — 128-lane
#  chunked 1.87x SLOWER, whole-block 1.08x slower; the always-true vs
#  always-false gate bracket ran at IDENTICAL speed, i.e. skipping the
#  guarded MT compute saved nothing because the per-tile cond breaks
#  Mosaic's grid-step pipelining and the streamed tile DMA happens either
#  way. Per-ray reachability pays only without per-tile conds — see
#  bounce_fwd_list: resident table + per-block compacted tile lists.)


def _pack_bits(p_pad: int):
    """Packed-argmin layout: index bits stolen from the t mantissa, plus
    the miss sentinel in sign-flipped-i32 space (F32_MAX bit pattern)."""
    idx_bits = max(1, (p_pad - 1).bit_length())
    low_mask = (1 << idx_bits) - 1
    miss_bits = int(np.float32(F32_MAX).view(np.uint32)) & (
        ~low_mask & 0xFFFFFFFF)
    miss_s = int(np.uint32(miss_bits ^ 0x80000000).astype(np.int32))
    return low_mask, miss_s


def _pack_tile(tb, row0, low_mask: int):
    """One tile's packed (t | global index) sublane min, [1,BR] i32
    (sign-flipped order: positive-f32 bits order like ints; negatives/NaN
    order above after flipping the sign bit). Winner selection compares t
    at ~2^-14 relative resolution, so near-exact ties can flip (a fwd
    accuracy/speed knob; exact mode and the jnp backend stay exact)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + row0
    bits = _u32(tb)
    packed = (bits & jnp.uint32(~low_mask & 0xFFFFFFFF)) | _u32(rows)
    return pltpu.bitcast(packed ^ jnp.uint32(0x80000000), jnp.int32)


def _unpack(pmin, low_mask: int, miss_s: int):
    """Packed carry -> (idx [1,BR] i32, hit [1,BR] bool)."""
    pminu = pltpu.bitcast(pmin, jnp.uint32) ^ jnp.uint32(0x80000000)
    idx = pltpu.bitcast(pminu & jnp.uint32(low_mask), jnp.int32)
    hit = pmin < jnp.int32(miss_s)
    return idx, hit


def _exact_tile(tb, row0, shift_valid: bool):
    """One tile's exact (tmin [1,BR] f32, idx [1,BR] i32) two-reduction;
    full-precision t comparison — the bit-stable verification mode.
    shift_valid: sphere tiles emit tb <= 0/NaN for invalid (validity = t>0);
    triangle tiles emit F32_MAX for invalid already."""
    if shift_valid:
        tv = jnp.where(tb > 0.0, tb, F32_MAX)
    else:
        tv = tb
    tmin = jnp.min(tv, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + row0
    cand = jnp.where(tv == tmin, rows, jnp.int32(_I32_MAX))
    idx = jnp.min(cand, axis=0, keepdims=True)
    return tmin, idx


def _fwd_kernel(*refs, n_pad: int, m_pad: int, p_pad: int, block_n: int,
                block_m: int, use_sky: bool, pack: bool, culled: bool):
    n_tiles_s = n_pad // block_n if n_pad else 0
    n_tiles_t = m_pad // block_m if m_pad else 0
    n_tiles = n_tiles_s + n_tiles_t
    k = 0
    b_ref = refs[k]; k += 1
    mask_ref = None
    if culled:
        mask_ref = refs[k]; k += 1
    state_ref = refs[k]; k += 1
    stab_ref = refs[k]; k += 1
    tri_ref = None
    if m_pad:
        tri_ref = refs[k]; k += 1
    table_ref, out_ref, idx_ref = refs[k:k + 3]
    scratch = refs[k + 3:]

    i = pl.program_id(0)
    j = pl.program_id(1)
    # Whole-block dead-ray skip: rays die in raster-coherent clumps (sky
    # pixels at bounce 1, absorbed paths later), so entire ray blocks go
    # dead as bounces progress — the dynamic early-out XLA's static graph
    # cannot express (the reference's per-pixel `break`, main.cpp:433-440,
    # reborn at block granularity).
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5
    # Sphere-tile / tri-tile culling (culled=True): each tile step is
    # guarded by the per-(ray block, tile) conservative reachability mask
    # (cull_mask) — a culled tile's matmul+chain never executes.
    # Output-invariant by construction: the mask is 1 whenever any ray in
    # the block could hit any primitive in the tile. This is the TPU
    # rebirth of the reference's sphere-group early-out (main.cpp:411,421)
    # at tile granularity. The mask is ONE flat [1, B*T] SMEM block shared
    # by every grid step.
    run = block_alive
    if culled:
        run = run & (mask_ref[0, i * n_tiles + j] > 0)

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

    if n_tiles_s:
        @pl.when(run & (j < n_tiles_s))
        def _():
            tb = _tile_roots(state_ref[:], stab_ref, block_n)
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
        @pl.when(run & (j >= n_tiles_s))
        def _():
            tb = _tile_tri_t(state_ref[:], tri_ref, block_m)
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
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    @pl.when((j == n_tiles - 1) & block_alive)
    def _():
        st = state_ref[:]
        if pack:
            idx, hit = _unpack(carry_s[:], low_mask, miss_s)
        else:
            idx = idxc_s[:]
            hit = tmin_s[:] < F32_MAX
        winner, _ = _gather_winner(table_ref, idx, p_pad)
        alive = st[12:13, :] > 0.5
        live = alive & hit
        sky_mask = alive & jnp.logical_not(hit)
        is_tri = (idx >= n_pad) if m_pad else None
        rand = _rand_draws(st, b_ref)
        out_ref[:] = _shade(st, winner, live, sky_mask, rand, use_sky,
                            is_tri)
        # the saved hit record: winner index for live rays, -1 otherwise
        idx_ref[:] = jnp.where(live, idx, jnp.int32(-1))


def _replay_kernel(b_ref, state_ref, idx_ref, table_ref, out_ref, *,
                   n_pad: int, p_pad: int, use_sky: bool):
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]

    @pl.when(block_alive)
    def _():
        st = state_ref[:]
        idx = idx_ref[:]
        winner, _ = _gather_winner(table_ref, idx, p_pad)
        live = idx >= 0                       # saved as -1 for miss AND dead
        alive = st[12:13, :] > 0.5
        sky_mask = alive & jnp.logical_not(live)
        is_tri = (idx >= n_pad) if p_pad > n_pad else None
        rand = _rand_draws(st, b_ref)
        out_ref[:] = _shade(st, winner, live, sky_mask, rand, use_sky,
                            is_tri)


def _bwd_kernel(b_ref, state_ref, idx_ref, table_ref, dout_ref,
                dstate_ref, dtable_ref, *, n_pad: int, p_pad: int,
                use_sky: bool):
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
        winner, onehot = _gather_winner(table_ref, idx, p_pad)
        live = idx >= 0
        alive = st[12:13, :] > 0.5
        sky_mask = alive & jnp.logical_not(live)
        is_tri = (idx >= n_pad) if p_pad > n_pad else None
        rand = _rand_draws(st, b_ref)

        # the whole linearization of the shading chain, traced in-kernel:
        # every residual stays in VMEM, nothing touches HBM
        _, vjp_fn = jax.vjp(
            lambda s_, w_: _shade(s_, w_, live, sky_mask, rand, use_sky,
                                  is_tri),
            st, winner)
        d_st, d_wn = vjp_fn(dout_ref[:])
        dstate_ref[:] = d_st
        _scatter_dtable(dtable_ref, d_wn, idx, p_pad, onehot)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def scene_table(scene: Scene):
    """[16, N] sphere shading constant table (see module docstring)."""
    c = scene.center.T                               # [3,N]
    r = scene.radius[None, :]
    zero = jnp.zeros_like(r)
    return jnp.concatenate([
        c, r, scene.albedo.T, scene.emissive.T, scene.specular[None, :],
        scene.ior[None, :], zero, zero, zero, zero], axis=0)


def prim_table(scene: Scene):
    """[16, P] winner table over the global primitive id space: sphere
    columns (scene_table) then triangle columns [n = e1 x e2 (3), k = n.v0,
    albedo (3), emissive (3), specular, ior] — the plane-form payload whose
    (n, k) occupy the sphere (center, radius) slots so `_shade`'s triangle
    branch is two selects, and through which vertex gradients flow
    (d_table -> cross/dot vjp -> v0/e1/e2). Padding triangles (e1 = e2 = 0)
    get all-zero columns and are never winners (det = 0 rejects them)."""
    sph = scene_table(scene)
    if scene.tris is None:
        return sph
    t = scene.tris
    n = jnp.cross(t.e1, t.e2)                        # [M,3]
    kplane = jnp.sum(n * t.v0, axis=1)[None, :]      # [1,M]
    zero = jnp.zeros_like(kplane)
    tri = jnp.concatenate([
        n.T, kplane, t.albedo.T, t.emissive.T, t.specular[None, :],
        t.ior[None, :], zero, zero, zero, zero], axis=0)
    return jnp.concatenate([sph, tri], axis=1)


def table_chunks(table):
    """f32 [16,P] -> bf16 [48,P]: three stacked bf16 chunks that sum to
    the f32 table EXACTLY (8+8+8 mantissa bits cover f32's 24) — the
    operand encoding for the exact 3-pass gathers (_gather_winner).
    Truncation-split (see _split3_bf16) so the residuals survive XLA's
    excess-precision simplifier when `table` is traced, not constant."""
    c1, c2, c3 = _split3_bf16(
        table,
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32),
        lambda u: jax.lax.bitcast_convert_type(u, jnp.float32))
    return jnp.concatenate([c1, c2, c3], axis=0)


BLOCK_N = 128   # spheres per cull tile (SPHERE_PAD multiple, so n_pad | it)
TRI_BLOCK_M = 128  # triangles per cull tile (TRI_PAD multiple)


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


def _morton_codes(c, valid):
    v3 = valid[:, None]
    lo = jnp.min(jnp.where(v3, c, F32_MAX), axis=0)
    hi = jnp.max(jnp.where(v3, c, -F32_MAX), axis=0)
    ext = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((c - lo) / ext * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << jnp.uint32(1))
            | (_spread3(q[:, 2]) << jnp.uint32(2)))
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


def morton_perm(scene: Scene):
    """Spatial (Morton/Z-order) sphere permutation -> [N] i32.

    Scene builders emit spheres in *generation* order (reference
    main.cpp:93-268), which scatters each cull tile across the whole
    world — every tile AABB then covers everything and cull_mask never
    fires. Sorting by the 30-bit Morton code of the quantized center makes
    tiles spatially compact. Padding spheres (radius <= 0) sort last,
    preserving the contiguous radius-0 tail. stop_gradient'd: a pure
    reindexing, applied symmetrically to all tables."""
    c = jax.lax.stop_gradient(scene.center)
    r = jax.lax.stop_gradient(scene.radius)
    return jnp.argsort(_morton_codes(c, r > 0.0)).astype(jnp.int32)


def tri_morton_perm(tris):
    """Morton permutation of a triangle soup by centroid; degenerate
    padding triangles (e1 = e2 = 0) sort last."""
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    valid = (jnp.sum(e1 * e1 + e2 * e2, axis=1)) > 0.0
    centroid = v0 + (e1 + e2) * (1.0 / 3.0)
    return jnp.argsort(_morton_codes(centroid, valid)).astype(jnp.int32)


def permute_spheres(scene: Scene, perm):
    """Scene with the per-sphere arrays reordered by perm (differentiable:
    the vjp scatters cotangents back through the gather)."""
    return dataclasses.replace(
        scene, center=scene.center[perm], radius=scene.radius[perm],
        albedo=scene.albedo[perm], emissive=scene.emissive[perm],
        specular=scene.specular[perm], ior=scene.ior[perm])


def permute_tris(tris, perm):
    return dataclasses.replace(
        tris, v0=tris.v0[perm], e1=tris.e1[perm], e2=tris.e2[perm],
        albedo=tris.albedo[perm], emissive=tris.emissive[perm],
        specular=tris.specular[perm], ior=tris.ior[perm])


def permute_scene(scene: Scene):
    """Morton-permute spheres (and the triangle soup, when present)."""
    scene = permute_spheres(scene, morton_perm(scene))
    if scene.tris is not None:
        scene = dataclasses.replace(
            scene, tris=permute_tris(scene.tris,
                                     tri_morton_perm(scene.tris)))
    return scene


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


def tri_tile_bounds(tris, block_m: int = TRI_BLOCK_M):
    """AABBs of the triangle tiles (vertex extremes over {v0, v0+e1,
    v0+e2}); degenerate padding triangles get empty boxes."""
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    valid = ((jnp.sum(e1 * e1 + e2 * e2, axis=1)) > 0.0)[:, None]
    v1, v2 = v0 + e1, v0 + e2
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    lo = jnp.where(valid, lo, F32_MAX)
    hi = jnp.where(valid, hi, -F32_MAX)
    n_t = max(1, v0.shape[0] // block_m)
    return (lo.reshape(n_t, block_m, 3).min(axis=1),
            hi.reshape(n_t, block_m, 3).max(axis=1))


def _inflated_boxes(lo, hi):
    """[T,6] box table with 1e-4 relative inflation: makes the 6-divide
    slab test conservatively safe against f32 rounding; empty boxes of
    all-padding tiles (lo > hi) are left empty so every block skips
    them."""
    span = jnp.maximum(hi - lo, 0.0)
    pad = 1e-4 * (span + jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + 1e-6)
    nonempty = lo[:, 0:1] <= hi[:, 0:1]
    lo = jnp.where(nonempty, lo - pad, lo)
    hi = jnp.where(nonempty, hi + pad, hi)
    return jnp.concatenate([lo, hi], axis=1)


def tri_tile_boxes(tris, block_m: int = TRI_BLOCK_M):
    """Inflated tri-tile AABBs as ONE [T, 6] f32 table (lo.xyz, hi.xyz)
    for the reachability-list builder (tri_block_lists)."""
    return _inflated_boxes(*tri_tile_bounds(tris, block_m))


# (No sphere analogue of tri_tile_boxes: the sphere reachability-list
#  sweep was built, verified bit-identical, and measured a LOSS at every
#  tile size on the TPU — see the dead-end note in kernels/regen.py.)


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
    """Conservative (ray block x primitive tile) reachability -> [B,T] i32.

    Interval relaxation: with o_k in [olo_k, ohi_k] and d_k in
    [dlo_k, dhi_k] independently, the reachable set on axis k at ray
    parameter t >= 0 is exactly [olo_k + t*dlo_k, ohi_k + t*dhi_k] — a
    superset of the true ray block (components decorrelated, |d|=1
    dropped), so a hit implies reachability. The tile box [tlo, thi] is
    reachable iff some common t >= 0 satisfies, per axis,
        olo_k + t*dlo_k <= thi_k   and   ohi_k + t*dhi_k >= tlo_k.
    Each constraint is linear in t -> a t-interval; the mask is 1 iff the
    six intervals and [0, inf) intersect. Any real intersection point
    o + t*d lies ON the winning primitive, hence inside the tile AABB, so
    culled tiles can never contain the nearest hit and masked rendering is
    BIT-IDENTICAL to unmasked."""
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


def _scene_tile_boxes(scene: Scene, block_n: int, block_m: int):
    tlo, thi = tile_bounds(scene, block_n)
    if scene.tris is not None:
        tl2, th2 = tri_tile_bounds(scene.tris, block_m)
        tlo = jnp.concatenate([tlo, tl2], axis=0)
        thi = jnp.concatenate([thi, th2], axis=0)
    return tlo, thi


def bounce_cull_mask(scene: Scene, state, block_r: int,
                     block_n: int = BLOCK_N, block_m: int = TRI_BLOCK_M):
    """Per-bounce cull mask [R/block_r, T] for bounce_fwd: sphere tiles
    first, then triangle tiles (when the scene has a soup)."""
    tlo, thi = _scene_tile_boxes(scene, block_n, block_m)
    return cull_mask(*ray_block_bounds(state, block_r), tlo, thi)


def octant_occupancy(state, block_r: int):
    """[B, 8] bool: does ray block b hold an ALIVE ray whose direction lies
    in sign-octant k? Octant id = (dx>=0) + 2*(dy>=0) + 4*(dz>=0)."""
    b = state.shape[1] // block_r
    sv = state.reshape(16, b, block_r)
    alive = sv[12] > 0.5                          # [B,br]
    oct_id = ((sv[3] >= 0.0).astype(jnp.int32)
              + 2 * (sv[4] >= 0.0).astype(jnp.int32)
              + 4 * (sv[5] >= 0.0).astype(jnp.int32))
    return jnp.stack(
        [jnp.any(alive & (oct_id == k), axis=1) for k in range(8)], axis=1)


def bounce_cull_mask_octant(scene: Scene, state, block_r: int,
                            block_n: int = BLOCK_N,
                            block_m: int = TRI_BLOCK_M):
    """Octant-split cull mask [R/block_r, T] — the SECONDARY-bounce mask.

    The plain per-block direction interval is useless after the first
    diffuse bounce: a block's scattered directions span ~[-1,1]^3, the
    interval relaxation admits every t, and cull_mask degenerates to 1
    (measured round 2: 1.000 tiles searched at bounces 1-4 on rtweekend).
    Splitting the block's alive rays by direction-sign OCTANT fixes the
    degeneracy structurally: within octant k every direction component has
    a fixed sign, so the per-axis feasible-t constraints become one-sided
    and tiles strictly behind the block on any occupied axis are culled.

    mask[b, t] = OR over octants k OCCUPIED by an alive ray of block b of
    cull_mask(o-bounds_b, d-bounds_b INTERSECT octant-box_k, tile t).
    Every alive ray lies in exactly one octant and inside both its block's
    d-interval and that octant's box, so each octant test is conservative
    for its rays and the OR is conservative for the block — culled
    rendering stays BIT-IDENTICAL (cull_mask's invariant). Cost: one
    8-way masked any() per block plus 8 tiny [B,3]x[T,3] interval tests;
    no extra per-ray reductions beyond ray_block_bounds."""
    tlo, thi = _scene_tile_boxes(scene, block_n, block_m)
    olo, ohi, dlo, dhi = ray_block_bounds(state, block_r)
    occ = octant_occupancy(state, block_r)         # [B,8]
    mask = jnp.zeros((olo.shape[0], tlo.shape[0]), jnp.int32)
    for k in range(8):
        box_lo = jnp.float32([0.0 if k & 1 else -1.0,
                              0.0 if k & 2 else -1.0,
                              0.0 if k & 4 else -1.0])
        box_hi = jnp.float32([1.0 if k & 1 else 0.0,
                              1.0 if k & 2 else 0.0,
                              1.0 if k & 4 else 0.0])
        dlo_k = jnp.maximum(dlo, box_lo)
        dhi_k = jnp.minimum(dhi, box_hi)
        mk = cull_mask(olo, ohi, dlo_k, dhi_k, tlo, thi)
        mask = jnp.maximum(mask, mk * occ[:, k:k + 1].astype(jnp.int32))
    return mask


def _interpret():
    return jax.default_backend() == "cpu"


def _smem_bounce(b):
    return jnp.asarray(b, jnp.int32).reshape(1, 1)


def _check_shapes(table48, state, block_r):
    p_pad = table48.shape[1]
    assert table48.shape[0] == 48 and table48.dtype == jnp.bfloat16, (
        "kernels take the bf16 chunk table (table_chunks(prim_table(s)))")
    r_tot = state.shape[1]
    assert r_tot % block_r == 0, (r_tot, block_r)
    return p_pad, r_tot


def _use_pack(p_pad: int, exact_argmin: bool) -> bool:
    # beyond _PACK_MAX_P the packed (t|idx) bits eat too much t mantissa
    # (wrong-winner flips on near-ties grow past ~2^-13 relative), so the
    # exact two-scratch carry takes over automatically
    return (not exact_argmin) and p_pad <= _PACK_MAX_P


@functools.partial(jax.jit, static_argnames=(
    "use_sky", "block_r", "block_n", "block_m", "exact_argmin"))
def bounce_fwd(table48, stab, state, bounce, mask=None, tri_tab=None, *,
               use_sky: bool, block_r: int = BLOCK_R,
               block_n: int = BLOCK_N, block_m: int = TRI_BLOCK_M,
               exact_argmin: bool = False):
    """One fused forward bounce over the (ray blocks x primitive tiles)
    grid. table48 [48,P] bf16 chunk table (prim_table), stab [2N,54] bf16
    tile-major sphere search table (search_table, laid out at THIS call's
    block_n), state [16,R] (R multiple of block_r), bounce [] i32, mask
    optional [R/block_r, T] i32 tile-cull mask (bounce_cull_mask), tri_tab
    optional [4M,96] bf16 triangle search table
    (kernels/tri_intersect.tri_search_tables at THIS call's block_m).
    mask=None compiles the UNCULLED kernel (no per-tile conds) and widens
    the sphere tile to min(n_pad, 1024) — the fast shape for incoherent
    bounces, where the mask never fires anyway.
    -> (new state [16,R], winner idx [R] i32, -1 = miss/dead; triangle ids
    offset by n_pad into the global primitive space)."""
    p_pad, r_tot = _check_shapes(table48, state, block_r)
    m_pad = 0 if tri_tab is None else tri_tab.shape[0] // 4
    n_pad = p_pad - m_pad
    n_blocks = r_tot // block_r
    culled = mask is not None
    if not culled:
        block_n = min(n_pad, _SPH_TILE_MAX)
        block_m = min(m_pad, _TRI_TILE) if m_pad else block_m
    assert n_pad % block_n == 0, (n_pad, block_n)
    assert m_pad % block_m == 0 if m_pad else True, (m_pad, block_m)
    n_tiles = n_pad // block_n + (m_pad // block_m if m_pad else 0)
    pack = _use_pack(p_pad, exact_argmin)
    n_tiles_s = n_pad // block_n

    mask_in, mask_spec = [], []
    if culled:
        mask_in = [mask.reshape(1, n_blocks * n_tiles)]
        mask_spec = [pl.BlockSpec((1, n_blocks * n_tiles),
                                  lambda i, j: (0, 0),
                                  memory_space=pltpu.SMEM)]
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

    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, n_pad=n_pad, m_pad=m_pad,
                          p_pad=p_pad, block_n=block_n, block_m=block_m,
                          use_sky=use_sky, pack=pack, culled=culled),
        grid=(n_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            *mask_spec,
            pl.BlockSpec((16, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_n, 54),
                         lambda i, j: (jnp.minimum(j, n_tiles_s - 1), 0),
                         memory_space=pltpu.VMEM),
            *tri_spec,
            pl.BlockSpec((48, p_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
            jax.ShapeDtypeStruct((1, r_tot), jnp.int32),
        ],
        scratch_shapes=scratch,
        # state updates in place (out is written once, at each block's
        # final tile step) — saves one [16,R] HBM copy per bounce when
        # XLA can prove the input dead (same win measured on regen_step)
        input_output_aliases={(2 if culled else 1): 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(_smem_bounce(bounce), *mask_in, state, stab, *tri_in, table48)
    return out, idx[0]


def _fwd_list_kernel(b_ref, cnt_ref, lst_ref, state_ref, stab_ref,
                     tri_ref, table_ref, out_ref, idx_ref, *, n_pad: int,
                     m_pad: int, p_pad: int, block_n: int, block_m: int,
                     use_sky: bool, pack: bool, group: int):
    """One full bounce for ONE ray block: static sphere-tile folds, then a
    dynamic-trip fori_loop over THIS block's compacted reachable-tri-tile
    list (tri_block_lists) slicing the RESIDENT tri table; shade inline.
    See bounce_fwd_list."""
    n_tiles_s = n_pad // block_n if n_pad else 0
    n_tiles_t = m_pad // block_m
    low_mask, miss_s = _pack_bits(p_pad)
    i = pl.program_id(0) // group          # list-group row of this block
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    @pl.when(block_alive)
    def _():
        st = state_ref[:]
        alive = st[12:13, :] > 0.5
        cnt = cnt_ref[i, 0]
        br = st.shape[1]

        def tri_rows(k):
            # double clamp: k past cnt re-folds the LAST listed tile —
            # min/strict-< folds are idempotent, so the 2x-unrolled loop
            # below needs no odd-tail handling
            tile = lst_ref[i, jnp.minimum(jnp.minimum(k, cnt - 1),
                                          n_tiles_t - 1)]
            return (tri_ref[pl.ds(tile * (4 * block_m), 4 * block_m), :],
                    n_pad + tile * block_m)

        bk = _tri_bk(st)        # hoisted out of the per-tile loop

        # (Early exit via a front-to-back sort + per-iteration carry-max
        # test was measured SLOWER on TPU — 1.91 vs 1.66 s/step on config
        # 4 — the vector reduce + scalar roundtrip per iteration costs
        # more than the tail tiles it skips. Removed; the list is plain
        # reachability order.)
        if pack:
            carry = jnp.full((1, br), miss_s, jnp.int32)
            for js in range(n_tiles_s):
                stab_js = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
                tb = _tile_roots(st, stab_js, block_n)
                carry = jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, js * block_n, low_mask),
                                   axis=0, keepdims=True))

            def w_body(k, carry):
                rows, row0 = tri_rows(k)
                tb = _tile_tri_t(st, rows, block_m, bk)
                return jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, row0, low_mask),
                                   axis=0, keepdims=True))

            # 2x unroll: the dynamic-trip fori pays a fixed cost per
            # iteration on Mosaic (measured on the regen twin: 8.77 ->
            # 9.16M rays/s on config 4; 4x is flat)
            def w_pair(j, carry):
                return w_body(2 * j + 1, w_body(2 * j, carry))

            carry = jax.lax.fori_loop(0, (cnt + 1) // 2, w_pair, carry)
            idx, hit = _unpack(carry, low_mask, miss_s)
        else:
            tmin = jnp.full((1, br), F32_MAX, jnp.float32)
            idxc = jnp.zeros((1, br), jnp.int32)
            for js in range(n_tiles_s):
                stab_js = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
                tb = _tile_roots(st, stab_js, block_n)
                tm, ic = _exact_tile(tb, js * block_n, shift_valid=True)
                better = tm < tmin
                idxc = jnp.where(better, ic, idxc)
                tmin = jnp.where(better, tm, tmin)

            def w_body(k, c):
                tmin, idxc = c
                rows, row0 = tri_rows(k)
                tb = _tile_tri_t(st, rows, block_m, bk)
                tm, ic = _exact_tile(tb, row0, shift_valid=False)
                # strict < + ascending-tile-id list order = the streamed
                # sweep's tie rule (first tile wins)
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

        winner, _ = _gather_winner(table_ref, idx, p_pad)
        live = alive & hit
        sky_mask = alive & jnp.logical_not(hit)
        is_tri = idx >= n_pad
        rand = _rand_draws(st, b_ref)
        out_ref[:] = _shade(st, winner, live, sky_mask, rand, use_sky,
                            is_tri)
        idx_ref[:] = jnp.where(live, idx, jnp.int32(-1))


_LIST_SMEM_TARGET = 256 * 1024


def list_group(n_blocks: int, n_tiles_t: int) -> int:
    """Ray-block group size G for tri_block_lists: one list per G
    consecutive ray blocks, sized so the [B/G, T] i32 SMEM table stays
    under ~256 KB (v5e SMEM is 1 MB/core with ~2.9x overhead per input
    table measured: 384 KB compiled to 1.13 MB used and OOM'd; the
    ungrouped 656 KB 1080p table was 1.99 MB). Grouping only coarsens
    the reachability OR — output-invariant; sharper (smaller-G) lists
    measured worth ~1% at 1080p."""
    g = -(-(n_blocks * n_tiles_t * 4) // _LIST_SMEM_TARGET)
    return min(max(1, g), n_blocks)


def tri_block_lists(boxes, state, block_r: int, group: int = 1):
    """Per-(ray-block group) compacted reachable-tri-tile lists.

    The per-RAY reachability the host-side interval masks cannot express:
    after one diffuse bounce a block's o/d component intervals decorrelate
    and cull_mask degenerates to all-1, but each lane still has one exact
    origin/direction whose slab test against a tile AABB is sharp
    (measured pass rate on trimesh: interval mask ~1.0, per-block any-lane
    slab 0.61). boxes [T,6] = tri_tile_boxes (inflated: conservative
    against f32 rounding + the MT accept band), state [16,R], group =
    list_group (G consecutive ray blocks OR their reachability into one
    list row to bound the SMEM table).

    -> (cnt [B/G,1] i32: reachable-tile count; lst [B/G,T] i32: reachable
    tile ids first, ASCENDING id — the same fold order and exact-mode tie
    rule as the streamed sweep). Conservativeness: any geometrically real
    nearest hit lies on a tile primitive inside the inflated AABB, so its
    tile is in every reaching lane's list and skipping the rest cannot
    change any winner. The residual divergence class vs the full sweep is
    Möller-Trumbore ACCEPTANCE FUZZ at grazing determinants (|det| near
    _DET_EPS): the kernel can accept a "hit" whose computed t places it
    far outside the triangle (and its box), which the full sweep folds
    but the list skips — measured on TPU at 1920x1080 trimesh: 1 pixel
    in 2.07M differs (interpret-mode CPU runs are bit-identical)."""
    T = boxes.shape[0]
    b = state.shape[1] // block_r
    sv = state.reshape(16, b, block_r)
    alive = sv[12] > 0.5                               # [B,br]
    big = jnp.float32(3.0e38)
    lo = boxes[:, 0:3]                                 # [T,3]
    hi = boxes[:, 3:6]
    tl = jnp.zeros((b, block_r, T), jnp.float32)
    th = jnp.full((b, block_r, T), big)
    for k in range(3):
        o = sv[k][:, :, None]                          # [B,br,1]
        d = sv[3 + k][:, :, None]
        lok = lo[None, None, :, k]                     # [1,1,T]
        hik = hi[None, None, :, k]
        dz = d == 0.0
        inv = 1.0 / jnp.where(dz, 1.0, d)
        a0 = (lok - o) * inv
        a1 = (hik - o) * inv
        inside = (o >= lok) & (o <= hik)
        tl = jnp.maximum(tl, jnp.where(
            dz, jnp.where(inside, -big, big), jnp.minimum(a0, a1)))
        th = jnp.minimum(th, jnp.where(
            dz, jnp.where(inside, big, -big), jnp.maximum(a0, a1)))
    feasible = alive[:, :, None] & (th >= tl) & (th >= 0.0)
    reach = jnp.any(feasible, axis=1)                  # [B,T]
    if group > 1:
        pad = (-b) % group
        if pad:
            reach = jnp.concatenate(
                [reach, jnp.zeros((pad, T), bool)], axis=0)
        reach = reach.reshape(-1, group, T).any(axis=1)
    cnt = jnp.sum(reach, axis=1).astype(jnp.int32)[:, None]
    # stable argsort of (not reach): reachable tiles first, ascending id
    lst = jnp.argsort(jnp.logical_not(reach), axis=1).astype(jnp.int32)
    return cnt, lst


_RESIDENT_VMEM_BUDGET = 10 * 1024 * 1024


def resident_tables_fit(n_pad: int, m_pad: int) -> bool:
    """Can bounce_fwd_list pin every search table in VMEM? (bf16 bytes:
    tri [4M,96] + sphere [2N,54] + payload [48,P], ~16 MB/core total
    VMEM, ~10 MB budget leaves room for state/carry/outputs.)"""
    p_pad = n_pad + m_pad
    return (n_pad <= _SPH_TILE_MAX and m_pad > 0 and
            (4 * m_pad * 96 + 2 * n_pad * 54 + 48 * p_pad) * 2
            < _RESIDENT_VMEM_BUDGET)


def bounce_fwd_list(table48, stab, state, bounce, tri_tab, lists, *,
                    use_sky: bool, block_r: int = BLOCK_R,
                    exact_argmin: bool = False, group: int = 1):
    """One fused forward bounce with the triangle sweep driven by
    per-ray-block compacted tile LISTS over a VMEM-RESIDENT tri table —
    the TPU shape of a BVH traversal step (one level, exact per-lane
    reachability), replacing the (ray block x tri tile) grid stream of
    bounce_fwd for triangle scenes that fit (resident_tables_fit).

    Why this shape (all r3 TPU measurements, BASELINE.md): the streamed
    grid re-DMAs every tri tile for every ray block and per-tile @pl.when
    gating makes it SLOWER (the cond breaks Mosaic's step pipelining;
    skipping the guarded compute saved ~nothing in an always-true vs
    always-false gate bracket). Here the grid is (ray blocks,) only: the
    tri table DMA's ONCE (constant index map), the per-block while_loop
    runs exactly cnt_b tile folds (pass rate 0.61 on trimesh) with NO
    per-tile cond, and the front-to-back sort + packed-space early exit
    ends the sweep at the first tile that cannot beat any alive lane's
    carry. Bit-identical to bounce_fwd (same folds, order-invariant min;
    skipped tiles provably cannot win — tri_block_lists docstring).

    stab: search_table at block_n = min(n_pad, _SPH_TILE_MAX) (resident).
    lists: (cnt [B/G,1] i32, lst [B/G,T] i32) from tri_block_lists at
    group=G (SMEM is 1 MB/core; list_group sizes the table under it).
    -> (new state [16,R], winner idx [R] i32)."""
    p_pad, r_tot = _check_shapes(table48, state, block_r)
    m_pad = tri_tab.shape[0] // 4
    n_pad = p_pad - m_pad
    block_m = _TRI_TILE
    n_tiles_t = m_pad // block_m
    block_n = min(n_pad, _SPH_TILE_MAX)
    assert n_pad % block_n == 0, (n_pad, block_n)
    pack = _use_pack(p_pad, exact_argmin)
    cnt, lst = lists
    n_blocks = r_tot // block_r
    n_groups = -(-n_blocks // group)
    assert cnt.shape == (n_groups, 1), (cnt.shape, n_groups)
    assert lst.shape == (n_groups, n_tiles_t), (lst.shape, n_tiles_t)
    assert lst.dtype == jnp.int32, lst.dtype

    out, idx = pl.pallas_call(
        functools.partial(_fwd_list_kernel, n_pad=n_pad, m_pad=m_pad,
                          p_pad=p_pad, block_n=block_n, block_m=block_m,
                          use_sky=use_sky, pack=pack, group=group),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_groups, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_groups, n_tiles_t), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n_pad, 54), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * m_pad, 96), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, p_pad), lambda i: (0, 0),
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
        input_output_aliases={3: 0},     # state updates in place
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(_smem_bounce(bounce), cnt, lst, state, stab, tri_tab, table48)
    return out, idx[0]


@functools.partial(jax.jit, static_argnames=("n_pad", "use_sky", "block_r"))
def bounce_replay(table48, state, idx, bounce, *, use_sky: bool,
                  block_r: int = BLOCK_R, n_pad: int | None = None):
    """Search-free forward bounce from the saved winner idx [R] i32.
    n_pad: sphere count of the global id split (defaults to all-spheres)."""
    p_pad, r_tot = _check_shapes(table48, state, block_r)
    if n_pad is None:
        n_pad = p_pad
    return pl.pallas_call(
        functools.partial(_replay_kernel, n_pad=n_pad, p_pad=p_pad,
                          use_sky=use_sky),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(_smem_bounce(bounce), state, idx.reshape(1, r_tot), table48)


@functools.partial(jax.jit, static_argnames=("n_pad", "use_sky", "block_r"))
def bounce_bwd(table48, state, idx, bounce, d_out, *, use_sky: bool,
               block_r: int = BLOCK_R, n_pad: int | None = None):
    """Reverse of one bounce: (state_in, saved idx, d_state_out)
    -> (d_state_in [16,R], d_table [16,P])."""
    p_pad, r_tot = _check_shapes(table48, state, block_r)
    if n_pad is None:
        n_pad = p_pad
    d_state, d_table = pl.pallas_call(
        functools.partial(_bwd_kernel, n_pad=n_pad, p_pad=p_pad,
                          use_sky=use_sky),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # d_table is revisited by every grid step (accumulation), which
            # requires the sequential ("arbitrary") grid below
            pl.BlockSpec((16, p_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
            jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
        ],
        input_output_aliases={4: 0},     # d_out -> d_state in place
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


def _fused_tables(scene: Scene, block_n_cull: int = BLOCK_N,
                  block_m_cull: int = TRI_BLOCK_M):
    """All per-trace constant tables for the fused path. -> dict with
    t48 [48,P], stab_full / stab_tiled, tri_full / tri_tiled (or None),
    n_pad, m_pad (the kernels' m_pad = soup n_pad: both TRI_PAD=128 and
    _TRI_TILE divide it)."""
    t48 = table_chunks(prim_table(scene))
    n_pad = scene.n_pad
    out = dict(t48=t48, n_pad=n_pad, m_pad=0, tri_full=None, tri_tiled=None,
               tri_boxes=None,
               stab_full=search_table(scene, min(n_pad, _SPH_TILE_MAX)),
               stab_tiled=search_table(scene, block_n_cull))
    if scene.tris is not None:
        from tpu_ray.kernels.tri_intersect import tri_search_tables
        m_pad = scene.tris.n_pad
        assert m_pad % _TRI_TILE == 0, (
            "soup padding (TRI_PAD) must be a tri-tile multiple", m_pad)
        tri = tri_search_tables(scene.tris, _TRI_TILE)
        assert tri.shape[0] == 4 * m_pad, (tri.shape, m_pad)
        assert t48.shape[1] == n_pad + m_pad
        out.update(m_pad=m_pad, tri_full=tri, tri_tiled=tri,
                   tri_boxes=jax.lax.stop_gradient(
                       tri_tile_boxes(scene.tris, _TRI_TILE)))
    return out


def trace_rays_fused(scene: Scene, origins, directions, stream_base,
                     max_bounces: int, block_r: int = BLOCK_R,
                     exact_argmin: bool = False, cull: bool = True,
                     cull_secondary: bool = False, tri_list: bool = True):
    """Forward-only fused trace: drop-in for trace_rays (path shading),
    spheres AND triangle soups.

    -> (color [R,3], rays_cast [R] u32). rays_cast accumulates sum(alive)
    at the top of each bounce, matching the reference counter
    (main.cpp:390). For the differentiable path use `make_fused_sample`.

    cull=True tile-culls the PRIMARY bounce (bit-identical output; see
    cull_mask): camera-ray blocks are direction-coherent narrow frusta that
    skip reachability-masked primitive tiles (~25% of sphere tiles on
    rtweekend; nearly all mesh tiles for off-mesh pixels on config 4), but
    diffuse-bounce blocks span all directions, so their plain interval mask
    never fires (measured: 1.000 tiles searched at bounces 1-4, rtweekend)
    — by default those bounces run the uncalled wide-tile kernel instead
    of paying per-tile cond overhead. cull_secondary=True applies the
    octant-split mask (bounce_cull_mask_octant) to bounces 1.. as well —
    still bit-identical; whether the skipped tiles beat the per-tile cond
    overhead is scene-dependent (a TPU measurement knob).
    """
    if cull:
        scene = permute_scene(scene)
    tb = _fused_tables(scene)
    use_list = (tri_list and tb["m_pad"] > 0
                and resident_tables_fit(tb["n_pad"], tb["m_pad"]))
    st, r, r_pad = _init_state(origins, directions, stream_base, block_r)
    rays = jnp.zeros((r_pad,), jnp.uint32)
    b_start = 1 if (cull and max_bounces > 0 and not use_list) else 0

    grp = list_group(r_pad // block_r, tb["m_pad"] // _TRI_TILE) \
        if use_list else 1

    def bounce_list(st, b):
        lists = tri_block_lists(tb["tri_boxes"], st, block_r, grp)
        return bounce_fwd_list(tb["t48"], tb["stab_full"], st, b,
                               tb["tri_full"], lists,
                               use_sky=scene.use_sky, block_r=block_r,
                               exact_argmin=exact_argmin, group=grp)

    if b_start:
        rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
        mask = bounce_cull_mask(scene, st, block_r)
        st, _ = bounce_fwd(tb["t48"], tb["stab_tiled"], st, jnp.int32(0),
                           mask, tb["tri_tiled"], use_sky=scene.use_sky,
                           block_r=block_r, exact_argmin=exact_argmin)

    def bounce(carry, b):
        st, rays = carry
        rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
        if use_list:
            st, _ = bounce_list(st, b)
        elif cull and cull_secondary:
            mask = bounce_cull_mask_octant(scene, st, block_r)
            st, _ = bounce_fwd(tb["t48"], tb["stab_tiled"], st, b, mask,
                               tb["tri_tiled"], use_sky=scene.use_sky,
                               block_r=block_r, exact_argmin=exact_argmin)
        else:
            st, _ = bounce_fwd(tb["t48"], tb["stab_full"], st, b, None,
                               tb["tri_full"], use_sky=scene.use_sky,
                               block_r=block_r, exact_argmin=exact_argmin)
        return (st, rays), None

    (st, rays), _ = jax.lax.scan(
        bounce, (st, rays),
        jnp.arange(b_start, max_bounces, dtype=jnp.int32))
    return st[9:12, :r].T, rays[:r]


def measured_tri_reach(scene: Scene, origins, directions, stream_base,
                       max_bounces: int, block_r: int = BLOCK_R) -> float:
    """Measured reachable-tile fraction of the triangle list sweep.

    Runs the same bounce loop as trace_rays_fused's list path on the given
    (sub-sampled) wavefront and returns the mean reachable-tile fraction
    per LIVE block-group step,

        (tile folds actually performed) / (live block-group steps * n_tiles)

    i.e. the fraction of the full tri-tile stream a processed lane pays for
    — the per-block pass rate the speed-of-light floor's tri term scales
    with (all lanes in a group do its cnt folds; under the regen default
    processed ~= cast). This replaces the hard-coded single-scene
    TRI_REACH constant so vs_baseline stays honest for arbitrary meshes
    (obj scenes, other tessellations). Approximation: the 5-bounce
    per-sample sweep stands in for regen's mixed (bounced + regenerated)
    wavefront — the regenerated primaries are a subset of the bounce-0
    population this sweep also visits."""
    scene = permute_scene(scene)
    tb = _fused_tables(scene)
    assert tb["m_pad"] > 0, "sphere-only scene has no tri reach"
    st, r, r_pad = _init_state(origins, directions, stream_base, block_r)
    n_tiles = tb["m_pad"] // _TRI_TILE
    grp = list_group(r_pad // block_r, n_tiles)

    @jax.jit
    def sweep(st):
        folds = jnp.zeros((), jnp.float32)
        gsteps = jnp.zeros((), jnp.float32)

        def body(carry, b):
            st, folds, gsteps = carry
            lists = tri_block_lists(tb["tri_boxes"], st, block_r, grp)
            folds = folds + jnp.sum(lists[0].astype(jnp.float32))
            alive_b = jnp.any((st[12] > 0.5).reshape(-1, block_r), axis=1)
            pad = (-alive_b.shape[0]) % grp
            if pad:
                alive_b = jnp.concatenate(
                    [alive_b, jnp.zeros((pad,), bool)])
            alive_g = alive_b.reshape(-1, grp).any(axis=1)
            gsteps = gsteps + jnp.sum(alive_g.astype(jnp.float32))
            st, _ = bounce_fwd_list(
                tb["t48"], tb["stab_full"], st, b, tb["tri_full"], lists,
                use_sky=scene.use_sky, block_r=block_r, group=grp)
            return (st, folds, gsteps), None

        (st, folds, gsteps), _ = jax.lax.scan(
            body, (st, folds, gsteps),
            jnp.arange(max_bounces, dtype=jnp.int32))
        return folds, gsteps

    folds, gsteps = sweep(st)
    return float(folds) / (max(float(gsteps), 1.0) * n_tiles)


@functools.lru_cache(maxsize=None)
def make_fused_sample(width: int, height: int, seed: int, max_bounces: int,
                      block_r: int = BLOCK_R, exact_argmin: bool = False,
                      cull_secondary: bool = False, tri_list: bool = True):
    """Differentiable fused sample: (scene, camera, pixel, s)
    -> (color_sum [R,3], rays_cast [R] u32), with a custom VJP.

    The forward runs raygen (XLA) + the fused bounce scan, saving ONLY the
    [B, R_pad] i16 winner-index stack (3 B/ray/bounce with the mask folded
    in as -1 — the 'save_hits' residual budget). The backward re-derives
    rays from the camera, replays the per-bounce input states with the
    search-free kernel, then runs the reverse bounce sweep, accumulating
    d_table on the MXU; scene cotangents (sphere params, triangle vertices
    via the plane-form table, materials) flow through prim_table's vjp,
    camera cotangents through raygen's VJP in XLA.
    """
    from tpu_ray.ops.raygen import camera_rays

    def _forward(scene, camera, pixel, s):
        o, d, base = camera_rays(camera, width, height, pixel, s, seed)
        scene = permute_scene(scene)
        tb = _fused_tables(scene)
        use_list = (tri_list and tb["m_pad"] > 0
                    and resident_tables_fit(tb["n_pad"], tb["m_pad"]))
        assert tb["n_pad"] + tb["m_pad"] < 2 ** 15, (
            "saved hit records are i16", tb["n_pad"], tb["m_pad"])
        st, r, r_pad = _init_state(o, d, base, block_r)
        rays = jnp.zeros((r_pad,), jnp.uint32)
        b_start = 1 if (max_bounces > 0 and not use_list) else 0

        grp = list_group(r_pad // block_r, tb["m_pad"] // _TRI_TILE) \
            if use_list else 1

        def bounce_list(st, b):
            lists = tri_block_lists(tb["tri_boxes"], st, block_r, grp)
            return bounce_fwd_list(tb["t48"], tb["stab_full"], st, b,
                                   tb["tri_full"], lists,
                                   use_sky=scene.use_sky, block_r=block_r,
                                   exact_argmin=exact_argmin, group=grp)

        idx0 = []
        if b_start:
            # primary bounce: tile-culled (camera-ray blocks are coherent
            # frusta; later diffuse bounces never cull — see
            # trace_rays_fused docstring)
            rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
            mask = bounce_cull_mask(scene, st, block_r)
            st, i0 = bounce_fwd(tb["t48"], tb["stab_tiled"], st,
                                jnp.int32(0), mask, tb["tri_tiled"],
                                use_sky=scene.use_sky,
                                block_r=block_r, exact_argmin=exact_argmin)
            idx0 = [i0.astype(jnp.int16)[None]]

        def body(carry, b):
            st, rays = carry
            rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
            if use_list:
                st, idx = bounce_list(st, b)
            elif cull_secondary:
                mask = bounce_cull_mask_octant(scene, st, block_r)
                st, idx = bounce_fwd(
                    tb["t48"], tb["stab_tiled"], st, b, mask,
                    tb["tri_tiled"], use_sky=scene.use_sky,
                    block_r=block_r, exact_argmin=exact_argmin)
            else:
                st, idx = bounce_fwd(
                    tb["t48"], tb["stab_full"], st, b, None,
                    tb["tri_full"], use_sky=scene.use_sky,
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
        table, table_vjp = jax.vjp(
            lambda sc: prim_table(permute_scene(sc)), scene)
        n_pad = scene.n_pad
        t48 = table_chunks(table)
        st0, r, r_pad = _init_state(o, d, base, block_r)
        bounces = jnp.arange(max_bounces, dtype=jnp.int32)
        idx_stack = idx_stack.astype(jnp.int32)

        # replay: per-bounce INPUT states, stacked [B,16,R_pad] (transient —
        # only live inside this sample's backward)
        def rbody(st, binfo):
            b, idx = binfo
            st2 = bounce_replay(t48, st, idx, b, use_sky=scene.use_sky,
                                block_r=block_r, n_pad=n_pad)
            return st2, st

        _, states = jax.lax.scan(rbody, st0, (bounces, idx_stack))

        d_st = jnp.zeros((16, r_pad), jnp.float32)
        d_st = d_st.at[9:12, :r].set(d_color.T)

        # Large soups: the bwd kernel's one-hot gather/scatter tiles are
        # [_GATHER_TILE, block_r] bf16 x ceil(P/_GATHER_TILE) unrolled
        # iterations, and Mosaic does not reuse their stack slots across
        # the gather AND scatter of one kernel — at p_pad ~10k and
        # block_r 1024 that is a 22.8 MB scoped-vmem OOM (measured,
        # config 4 at 1080p). A narrower ray block shrinks every one-hot
        # proportionally; the bwd grid just takes 4x more steps.
        block_r_bwd = block_r if t48.shape[1] <= 4096 \
            else min(block_r, 256)

        def bbody(carry, binfo):
            d_st, d_table = carry
            b, idx, st_in = binfo
            d_in, d_tab = bounce_bwd(t48, st_in, idx, b, d_st,
                                     use_sky=scene.use_sky,
                                     block_r=block_r_bwd, n_pad=n_pad)
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
