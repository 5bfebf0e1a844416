"""Fused bounce mega-kernel: search + winner gather + shading in one pass.

The forward render's cost splits ~2:1 between the O(R*N) search and O(R)
per-bounce work (payload gathers, scatter math, RNG) — the latter is slow in
XLA because every elementwise step round-trips the wavefront through HBM and
the winner gathers are row-granular. This kernel keeps one ray block
entirely in VMEM for a whole bounce:

  1. search: rays on sublanes x spheres on lanes (the Pallas nearest-hit,
     same math as kernels/sphere_intersect.py), one shot for N <= 1024;
  2. winner "gather" as an MXU matmul: table_T [16,N] @ one_hot [N,BR]
     -> winner_T [16,BR] — runs on the MXU concurrently with VPU work, and
     the one-hot operand is fused (never materialized in HBM);
  3. payload recompute + shading + counter RNG, channel-major: the ray
     state lives as [16, R] so every per-ray op is a [1, BR] lane-packed
     vector op (rays on the 128-lane axis).

This is the TPU translation of the reference's whole RenderTile inner loop
(reference main.cpp:387-482) as ONE kernel per bounce. Forward-only: the
gradient path keeps the jnp probe (the kernel is opaque to autodiff by
design — SURVEY.md §7's recompute-based backward never needs it).

State channel layout [16, R] (f32; ch 13 is u32 bitcast):
   0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 color,
   12 alive (0/1), 13 rng stream base, 14-15 unused.
Table layout [16, N]:
   0-2 center, 3 radius, 4-6 albedo, 7-9 emissive, 10 specular, 11 ior,
   12 |c|^2 - r^2 (search constant), 13-15 unused.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX, Scene

BLOCK_R = 1024  # swept 128-1024: per-block overhead beats finer dead-block skip
_I32_MAX = 2**31 - 1


def _u32(x):
    return pltpu.bitcast(x, jnp.uint32)


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


def _draw(base, bounce_term, slot_mix, lo, hi):
    u = _pcg_hash(base + bounce_term + jnp.uint32(slot_mix))
    scale = jnp.float32((hi - lo) * (1.0 / 4294967296.0))
    return _u32_to_f32(u) * scale + jnp.float32(lo)


def _normalize_eps3(x, y, z):
    lsq = x * x + y * y + z * z
    ok = lsq > F32_EPS
    inv = jax.lax.rsqrt(jnp.where(ok, lsq, 1.0))
    zero = jnp.zeros_like(x)
    return (jnp.where(ok, x * inv, zero), jnp.where(ok, y * inv, zero),
            jnp.where(ok, z * inv, zero))


def _kernel(b_ref, rays8_ref, state_ref, table_ref, out_ref, *,
            n_pad: int, use_sky: bool):
    f32 = jnp.float32

    # Whole-block dead-ray skip: rays die in raster-coherent clumps (sky
    # pixels at bounce 1, absorbed paths later), so entire 512-ray blocks go
    # dead as bounces progress — the dynamic early-out XLA's static graph
    # cannot express (the reference's per-pixel `break`, main.cpp:433-440,
    # reborn at block granularity).
    block_alive = jnp.max(state_ref[12:13, :]) > 0.5

    @pl.when(jnp.logical_not(block_alive))
    def _():
        out_ref[:] = state_ref[:]

    @pl.when(block_alive)
    def _():
        _kernel_body(b_ref, rays8_ref, state_ref, table_ref, out_ref,
                     n_pad=n_pad, use_sky=use_sky)


def _kernel_body(b_ref, rays8_ref, state_ref, table_ref, out_ref, *,
                 n_pad: int, use_sky: bool):
    f32 = jnp.float32

    # ---- phase 1: nearest-hit search (rays sublanes x spheres lanes) ----
    o_blk = rays8_ref[:, 0:3]
    oo = rays8_ref[:, 3:4]
    d_blk = rays8_ref[:, 4:7]
    od = rays8_ref[:, 7:8]
    ct = table_ref[0:3, :]                     # [3,N]
    ccmr = table_ref[12:13, :]                 # [1,N]

    dc = jnp.dot(d_blk, ct, preferred_element_type=f32,
                 precision=jax.lax.Precision.HIGHEST)
    oc = jnp.dot(o_blk, ct, preferred_element_type=f32,
                 precision=jax.lax.Precision.HIGHEST)
    tp = dc - od
    q = ccmr - 2.0 * oc + oo
    disc = tp * tp - q
    x = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = tp - x
    t = jnp.where(t_near < F32_EPS, tp + x, t_near)
    valid = (disc > 0.0) & (t > F32_EPS)
    tvals = jnp.where(valid, t, F32_MAX)

    # Packed single-reduction argmin: positive-f32 bit patterns order like
    # ints, so stuffing the column index into the low ceil(log2 N) mantissa
    # bits makes ONE min-reduce return both winner t (truncated) and index —
    # 1.26x over the min + masked-index-min pair. Cost: winner selection
    # compares t at ~2^-14 relative resolution, so near-exact ties can flip
    # (a fwd-only accuracy/speed knob; the jnp backend stays exact).
    idx_bits = max(1, (tvals.shape[1] - 1).bit_length())
    low_mask = (1 << idx_bits) - 1
    bits = pltpu.bitcast(tvals, jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, tvals.shape, 1)
    packed = (bits & jnp.int32(~low_mask)) | cols
    pmin = jnp.min(packed, axis=1, keepdims=True)              # [BR,1]
    idx = pmin & jnp.int32(low_mask)
    tmin = pltpu.bitcast(pmin & jnp.int32(~low_mask), jnp.float32)

    # ---- phase 2: winner extraction via MXU one-hot matmul ----
    # transpose the two tiny per-ray columns to lane orientation
    idx_t = idx.reshape(1, idx.shape[0])                       # [1,BR]
    tmin_t = tmin.reshape(1, tmin.shape[0])                    # [1,BR]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, idx.shape[0]), 0)
    onehot = (rows == idx_t).astype(f32)                       # [N,BR]
    winner = jnp.dot(table_ref[:], onehot, preferred_element_type=f32,
                     precision=jax.lax.Precision.HIGHEST)      # [16,BR]

    # ---- phase 3: shading, channel-major ([1,BR] lane-packed ops) ----
    def ch(ref_or_arr, c):
        return ref_or_arr[c:c + 1, :]

    st = state_ref[:]
    ox_, oy_, oz_ = ch(st, 0), ch(st, 1), ch(st, 2)
    dx_, dy_, dz_ = ch(st, 3), ch(st, 4), ch(st, 5)
    ax_, ay_, az_ = ch(st, 6), ch(st, 7), ch(st, 8)
    cr_, cg_, cb_ = ch(st, 9), ch(st, 10), ch(st, 11)
    alive = ch(st, 12) > 0.5
    base = _u32(ch(st, 13))

    cx_, cy_, cz_ = ch(winner, 0), ch(winner, 1), ch(winner, 2)
    alr, alg, alb = ch(winner, 4), ch(winner, 5), ch(winner, 6)
    emr, emg, emb = ch(winner, 7), ch(winner, 8), ch(winner, 9)
    spec = ch(winner, 10)
    ior = ch(winner, 11)

    # miss sentinel: F32_MAX with its low index bits zeroed compares below
    # F32_MAX, so test against the masked sentinel value
    import numpy as _np
    miss_val = _np.int32(_np.float32(F32_MAX).view(_np.int32) & ~low_mask
                         ).view(_np.float32)
    hit = tmin_t < miss_val
    live = alive & hit

    # sky emission for dying rays (reference main.cpp:433-440)
    if use_sky:
        a = (dy_ + 1.0) * 0.5
        sky_mask = alive & ~hit
        cr_ = cr_ + jnp.where(sky_mask, ((1.0 - a) + a * 0.5) * ax_, 0.0)
        cg_ = cg_ + jnp.where(sky_mask, ((1.0 - a) + a * 0.7) * ay_, 0.0)
        cb_ = cb_ + jnp.where(sky_mask, ((1.0 - a) + a * 1.0) * az_, 0.0)

    # payload recompute (projection form, reference main.cpp:401-417)
    mx, my, mz = cx_ - ox_, cy_ - oy_, cz_ - oz_
    tp2 = mx * dx_ + my * dy_ + mz * dz_
    px_, py_, pz_ = mx - dx_ * tp2, my - dy_ * tp2, mz - dz_ * tp2
    dsq = px_ * px_ + py_ * py_ + pz_ * pz_
    r_ = ch(winner, 3)
    rr2 = r_ * r_ - dsq
    xx = jnp.sqrt(jnp.maximum(rr2, 0.0))
    tn = tp2 - xx
    inside = tn < F32_EPS
    tt = jnp.where(inside, tp2 + xx, tn)

    nox, noy, noz = ox_ + dx_ * tt, oy_ + dy_ * tt, oz_ + dz_ * tt
    nrx, nry, nrz = dx_ * tt - mx, dy_ * tt - my, dz_ * tt - mz

    # emissive add + albedo attenuation
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

    bterm = b_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x632BE59B)
    r0 = _draw(base, bterm, 0 * 0xC2B2AE35 & 0xFFFFFFFF, -1.0, 1.0)
    r1 = _draw(base, bterm, 1 * 0xC2B2AE35 & 0xFFFFFFFF, -1.0, 1.0)
    r2 = _draw(base, bterm, 2 * 0xC2B2AE35 & 0xFFFFFFFF, -1.0, 1.0)
    rrefl = _draw(base, bterm, 3 * 0xC2B2AE35 & 0xFFFFFFFF, 0.0, 1.0)

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
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cant = ri * sin_t > 1.0
    perpx = ri * (dx_ + cos_t * n2x)
    perpy = ri * (dy_ + cos_t * n2y)
    perpz = ri * (dz_ + cos_t * n2z)
    k = 1.0 - (perpx * perpx + perpy * perpy + perpz * perpz)
    par = -jnp.sqrt(jnp.abs(k))
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

    out_ref[0:1, :] = jnp.where(live, nox, ox_)
    out_ref[1:2, :] = jnp.where(live, noy, oy_)
    out_ref[2:3, :] = jnp.where(live, noz, oz_)
    out_ref[3:4, :] = jnp.where(live, ndx, dx_)
    out_ref[4:5, :] = jnp.where(live, ndy, dy_)
    out_ref[5:6, :] = jnp.where(live, ndz, dz_)
    out_ref[6:7, :] = ax_
    out_ref[7:8, :] = ay_
    out_ref[8:9, :] = az_
    out_ref[9:10, :] = cr_
    out_ref[10:11, :] = cg_
    out_ref[11:12, :] = cb_
    out_ref[12:13, :] = jnp.where(live, 1.0, 0.0)
    out_ref[13:14, :] = ch(st, 13)
    out_ref[14:15, :] = ch(st, 14)
    out_ref[15:16, :] = ch(st, 15)


def scene_table(scene: Scene):
    """[16, N] search+shade constant table (see module docstring)."""
    c = scene.center.T                               # [3,N]
    r = scene.radius[None, :]
    ccmr = jnp.sum(c * c, axis=0, keepdims=True) - r * r
    zero = jnp.zeros_like(r)
    return jnp.concatenate([
        c, r, scene.albedo.T, scene.emissive.T, scene.specular[None, :],
        scene.ior[None, :], ccmr, zero, zero, zero], axis=0)


@functools.partial(jax.jit, static_argnames=("use_sky", "block_r"))
def bounce_step_pallas(table, state, bounce, *, use_sky: bool,
                       block_r: int = BLOCK_R):
    """One fused bounce over the whole wavefront.

    table [16,N] (scene_table), state [16,R] (R a multiple of block_r),
    bounce [] i32 -> new state [16,R].
    """
    n_pad = table.shape[1]
    r_tot = state.shape[1]
    assert r_tot % block_r == 0, (r_tot, block_r)
    assert n_pad <= 1024, "single-shot search; use the jnp path beyond 1k"

    # per-ray search operands in sublane orientation: [R,8] = o, |o|2, d, o.d
    o = state[0:3, :].T
    d = state[3:6, :].T
    oo = jnp.sum(o * o, axis=1, keepdims=True)
    od = jnp.sum(o * d, axis=1, keepdims=True)
    rays8 = jnp.concatenate([o, oo, d, od], axis=1)

    return pl.pallas_call(
        functools.partial(_kernel, n_pad=n_pad, use_sky=use_sky),
        grid=(r_tot // block_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_r), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, r_tot), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(bounce, jnp.int32).reshape(1, 1), rays8, state, table)


def trace_rays_fused(scene: Scene, origins, directions, stream_base,
                     max_bounces: int, block_r: int = BLOCK_R):
    """Forward-only fused trace: drop-in for trace_rays (path shading).

    -> (color [R,3], rays_cast [R] u32). Requires a sphere-only scene with
    n_pad <= 1024. rays_cast accumulates sum(alive) at the top of each
    bounce, matching the reference counter (main.cpp:390).
    """
    assert scene.tris is None, "fused path is sphere-only; use backend='jnp'"
    r = origins.shape[0]
    r_pad = -(-r // block_r) * block_r
    pad = r_pad - r

    table = scene_table(scene)
    st = jnp.zeros((16, r_pad), jnp.float32)
    st = st.at[0:3, :r].set(origins.T)
    st = st.at[3:6, :r].set(directions.T)
    st = st.at[6:9, :r].set(1.0)
    st = st.at[12, :r].set(1.0)
    st = st.at[13, :r].set(jax.lax.bitcast_convert_type(
        stream_base, jnp.float32))
    del pad

    def bounce(carry, b):
        st, rays = carry
        rays = rays + (st[12, :] > 0.5).astype(jnp.uint32)
        st = bounce_step_pallas(table, st, b, use_sky=scene.use_sky,
                                block_r=block_r)
        return (st, rays), None

    (st, rays), _ = jax.lax.scan(
        bounce, (st, jnp.zeros((r_pad,), jnp.uint32)),
        jnp.arange(max_bounces, dtype=jnp.int32))
    return st[9:12, :r].T, rays[:r]
