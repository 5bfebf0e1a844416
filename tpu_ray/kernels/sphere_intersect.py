"""Pallas nearest-hit search, [N, BLOCK_R] oriented: spheres on sublanes,
rays on the 128-lane axis, sphere axis tiled through VMEM.

The TPU-first redesign of the reference's hot loop (reference
main.cpp:398-443: per-ray loop over SIMD sphere groups with masked running
min + horizontal reduction). v2 lessons (this file's round-1 version lost to
XLA 79M vs 122M rays/s — BASELINE.md):

- Orientation flip: the round-1 kernel put rays on sublanes and spheres on
  lanes, making the argmin a cross-LANE reduction (slow: lane shuffles) and
  forcing a [R,8] ray-major operand prep in XLA. Spheres-on-sublanes makes
  the reduction a cheap sublane min and the MXU operands ([N,3] @ [3,BR])
  come straight from [3,R] transposed inputs.
- Arithmetic rejection instead of masks: sqrt(disc<0) -> NaN and
  t <= eps -> negative (after an eps shift) both order ABOVE every real hit
  under the sign-flipped-bits integer order, deleting the
  valid-mask/select chain (~3 of ~15 VPU ops/pair).
- Packed single-reduction argmin (t bits | sphere index in the low
  ceil(log2 N) bits): ONE running min carries both winner t and index
  across sphere tiles — a single i32 VMEM carry instead of the round-1
  (t, idx) pair with compare+two-select per tile. Auto-falls back to the
  exact two-reduction carry when the index bits would eat too much
  mantissa (n_pad > _PACK_MAX_N) or on request (exact=True), where the
  tie rule (lowest index, FindFirstIndex x64_math.h:585-592) is preserved
  by min-reducing candidate indices.

Gradients: none flow through the search by design — `t` is stop_gradient
and `idx` is integer; the differentiable payload is recomputed O(R) from the
winner (tpu_ray.ops.intersect.hit_payload), so this kernel needs no VJP.
In packed mode the reported t carries ~2^-14 relative truncation (its only
consumer is the t < F32_MAX miss test); exact=True reports full-precision t.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX
from tpu_ray.kernels.bounce_step import _split3_bf16, _u32
from tpu_ray.ops.intersect import Hit

BLOCK_R = 2048   # rays per grid step (lane-major)
BLOCK_N = 1024   # spheres per VMEM tile (sublane-major)
_PACK_MAX_N = 2048   # beyond this the packed index bits cost >2^-13 of t
_I32_MAX = 2**31 - 1


def _roots(o, d, stab_ref, block_n: int):
    """Shifted root chain: [bn,BR] t - eps with NaN/negative on any invalid
    root (see module docstring). o/d are [3,BR] state slices. The whole
    quadratic setup is ONE K-stacked DEFAULT-precision matmul — coefficient
    rows 0:bn give tp, rows bn:2bn give q against the ray monomials
    [o, d, o.d, |o|^2, 1], with the 6 significant bf16-chunk cross products
    of the exact 3-chunk split stacked ALONG K (9 -> 54, still under one
    128 pad) instead of run as HIGHEST's 6 separate passes — identical
    error class at 1/6 the MXU cost (kernels/bounce_step._tile_roots)."""
    oo = jnp.sum(o * o, axis=0, keepdims=True)
    od = jnp.sum(o * d, axis=0, keepdims=True)
    one = jnp.ones_like(oo)
    feats = jnp.concatenate([o, d, od, oo, one], axis=0)   # [9,BR]
    b1, b2, b3 = _split3_bf16(
        feats, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    bk = jnp.concatenate([b1, b2, b1, b3, b2, b1], axis=0)  # [54,BR]
    tpq = jnp.dot(stab_ref[:], bk,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    tp = tpq[0:block_n, :]
    q = tpq[block_n:2 * block_n, :]
    disc = tp * tp - q
    x = jnp.sqrt(disc)                  # NaN when disc < 0
    tn = tp - x
    t = jnp.where(tn < F32_EPS, tp + x, tn)   # inside-sphere far root
    return t - F32_EPS


def _kernel_packed(ot_ref, dt_ref, stab_ref, t_out, idx_out, carry_s, *,
                   n_tiles: int, block_n: int, idx_bits: int):
    j = pl.program_id(1)
    tb = _roots(ot_ref[:], dt_ref[:], stab_ref, block_n)
    low_mask = (1 << idx_bits) - 1
    rows = (jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + j * block_n)
    bits = pltpu.bitcast(tb, jnp.uint32)
    packed = (bits & jnp.uint32(~low_mask & 0xFFFFFFFF)) | pltpu.bitcast(
        rows, jnp.uint32)
    ps = pltpu.bitcast(packed ^ jnp.uint32(0x80000000), jnp.int32)
    pmin = jnp.min(ps, axis=0, keepdims=True)           # [1,BR]

    @pl.when(j == 0)
    def _():
        carry_s[:] = pmin

    @pl.when(j > 0)
    def _():
        carry_s[:] = jnp.minimum(carry_s[:], pmin)

    @pl.when(j == n_tiles - 1)
    def _():
        pminu = pltpu.bitcast(carry_s[:], jnp.uint32) ^ jnp.uint32(0x80000000)
        idx = pltpu.bitcast(pminu & jnp.uint32(low_mask), jnp.int32)
        tb_min = pltpu.bitcast(
            pminu & jnp.uint32(~low_mask & 0xFFFFFFFF), jnp.float32)
        miss_bits = int(np.float32(F32_MAX).view(np.uint32)) & (
            ~low_mask & 0xFFFFFFFF)
        miss_s = np.uint32(miss_bits ^ 0x80000000).astype(np.int32)
        hit = carry_s[:] < jnp.int32(miss_s)
        t_out[:] = jnp.where(hit, tb_min + F32_EPS, F32_MAX)
        idx_out[:] = jnp.where(hit, idx, 0)


def _kernel_exact(ot_ref, dt_ref, stab_ref, t_out, idx_out, tmin_s, idx_s, *,
                  n_tiles: int, block_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tmin_s[:] = jnp.full_like(tmin_s, F32_MAX)
        idx_s[:] = jnp.zeros_like(idx_s)

    tb = _roots(ot_ref[:], dt_ref[:], stab_ref, block_n)
    tv = jnp.where(tb > 0.0, tb + F32_EPS, F32_MAX)     # un-shift valid t
    tile_tmin = jnp.min(tv, axis=0, keepdims=True)      # [1,BR]
    rows = (jax.lax.broadcasted_iota(jnp.int32, tv.shape, 0) + j * block_n)
    cand = jnp.where(tv == tile_tmin, rows, jnp.int32(_I32_MAX))
    tile_idx = jnp.min(cand, axis=0, keepdims=True)

    # strict < keeps the earlier (lower-index) tile on ties, matching
    # jnp.argmin / reference FindFirstIndex
    better = tile_tmin < tmin_s[:]
    idx_s[:] = jnp.where(better, tile_idx, idx_s[:])
    tmin_s[:] = jnp.where(better, tile_tmin, tmin_s[:])

    @pl.when(j == n_tiles - 1)
    def _():
        t_out[:] = tmin_s[:]
        idx_out[:] = idx_s[:]


@functools.partial(jax.jit, static_argnames=("block_r", "block_n", "exact"))
def nearest_hit_pallas(center, radius, origin, direction,
                       block_r: int = BLOCK_R,
                       block_n: int = BLOCK_N,
                       exact: bool = False) -> Hit:
    """Drop-in Pallas replacement for nearest_hit_jnp.

    center [N,3], radius [N], origin [R,3], direction [R,3] -> Hit([R]).
    """
    center = jax.lax.stop_gradient(center)
    radius = jax.lax.stop_gradient(radius)
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)

    n = center.shape[0]
    r = origin.shape[0]
    block_n = min(block_n, max(8, -(-n // 8) * 8))
    n_pad = -(-n // block_n) * block_n
    r_pad = -(-r // block_r) * block_r

    # scene side: stacked tp/q coefficient rows per sphere TILE, laid out
    # [n_tiles, 2*block_n, 54] -> [2*n_pad, 54] so each grid step's block
    # (2*block_n rows) is [tp rows; q rows] for its tile; columns are the
    # K-stacked bf16 chunk groups [a1 a1 a2 a1 a2 a3] (see _roots)
    c = jnp.pad(center, ((0, n_pad - n), (0, 0)))
    rad = jnp.pad(radius, (0, n_pad - n))
    ccmr = (jnp.sum(c * c, axis=1) - rad * rad)[:, None]
    one = jnp.ones_like(ccmr)
    zero = jnp.zeros_like(ccmr)
    z3 = jnp.zeros_like(c)
    tp_rows = jnp.concatenate([z3, c, -one, zero, zero], axis=1)
    q_rows = jnp.concatenate([-2.0 * c, z3, zero, one, ccmr], axis=1)
    n_t = n_pad // block_n
    rows = jnp.concatenate([tp_rows.reshape(n_t, block_n, 9),
                            q_rows.reshape(n_t, block_n, 9)],
                           axis=1).reshape(2 * n_pad, 9)
    a1, a2, a3 = _split3_bf16(
        rows,
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32),
        lambda u: jax.lax.bitcast_convert_type(u, jnp.float32))
    stab = jnp.concatenate([a1, a1, a2, a1, a2, a3], axis=1)  # [2n_pad,54]

    # ray side: [3,R] channel-major (one transpose each, fused by XLA)
    ot = jnp.pad(origin, ((0, r_pad - r), (0, 0))).T
    dt = jnp.pad(direction, ((0, r_pad - r), (0, 0))).T

    n_ray_blocks = r_pad // block_r
    n_tiles = n_pad // block_n
    use_packed = (not exact) and n_pad <= _PACK_MAX_N

    if use_packed:
        idx_bits = max(1, (n_pad - 1).bit_length())
        kernel = functools.partial(_kernel_packed, n_tiles=n_tiles,
                                   block_n=block_n, idx_bits=idx_bits)
        scratch = [pltpu.VMEM((1, block_r), jnp.int32)]
    else:
        kernel = functools.partial(_kernel_exact, n_tiles=n_tiles,
                                   block_n=block_n)
        scratch = [pltpu.VMEM((1, block_r), jnp.float32),
                   pltpu.VMEM((1, block_r), jnp.int32)]

    t, idx = pl.pallas_call(
        kernel,
        grid=(n_ray_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((3, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * block_n, 54), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        # CPU (tests / virtual meshes): run the same kernel interpreted —
        # the Pallas analogue of the reference's debug asserts posture.
        interpret=jax.default_backend() == "cpu",
    )(ot, dt, stab)

    return Hit(t=t[0, :r], idx=idx[0, :r])
