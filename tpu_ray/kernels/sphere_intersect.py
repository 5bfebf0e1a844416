"""Pallas nearest-hit search over a (ray_block x sphere_block) VMEM grid.

The TPU-first redesign of the reference's hot loop (reference
main.cpp:398-443: per-ray loop over SIMD sphere groups with masked running
min + horizontal reduction). Differences that make it a TPU program, not a
translation (SURVEY.md §2 parallelism note — we vectorize over *rays* and
tile over *spheres*, the transpose of the reference's lane choice):

- The ray axis is the sublane/grid-parallel axis (millions of rays), the
  sphere axis is the 128-lane minor axis, tiled BN at a time through VMEM.
- The two O(R*N) dot products are algebraically refactored onto the MXU:
      t_proj[i,j] = d_i . c_j - d_i . o_i          (D @ C^T)
      |m|^2[i,j]  = |c_j|^2 - 2 o_i . c_j + |o_i|^2 (O @ (-2 C^T))
  leaving ~15 VPU ops/pair for the root selection + masked argmin, instead
  of ~25 all-VPU. Per-ray scalars (|o|^2, o.d) ride in a packed [R, 8] input.
- The running (min_t, argmin) carry lives in VMEM scratch across sphere
  tiles (grid's inner sequential dimension), exactly the role of the
  reference's `MinT`/payload blend registers (main.cpp:419-429); the
  first-lane tie rule of FindFirstIndex (x64_math.h:585-592) is preserved
  by min-reducing candidate indices.

Numerics: the quadratic-form discriminant (t_proj^2 - (|m|^2 - r^2)) is
algebraically equal to the reference's projection form (r^2 - dist_sq) but
rounds differently in f32; t agrees to ~1e-6 relative and near-tie winners
can flip between backends (tested statistically, see tests/test_pallas.py).

Gradients: none flow through the search by design — `t` is stop_gradient
and `idx` is integer; the differentiable payload is recomputed O(R) from the
winner (tpu_ray.ops.intersect.hit_payload), so this kernel needs no VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX
from tpu_ray.ops.intersect import Hit

BLOCK_R = 512    # rays per grid step (sublane-major)
BLOCK_N = 512    # spheres per VMEM tile (lane-minor)
_I32_MAX = 2**31 - 1  # python int: jnp scalars become captured consts in kernels


def _kernel(rays_ref, ct_ref, ctm2_ref, ccmr_ref, t_out, idx_out,
            tmin_s, idx_s, *, n_sphere_tiles: int, block_n: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tmin_s[:] = jnp.full_like(tmin_s, F32_MAX)
        idx_s[:] = jnp.zeros_like(idx_s)

    o_blk = rays_ref[:, 0:3]     # [BR,3] origin
    oo = rays_ref[:, 3:4]        # [BR,1] |o|^2
    d_blk = rays_ref[:, 4:7]     # [BR,3] direction
    od = rays_ref[:, 7:8]        # [BR,1] o.d

    # MXU: the only O(R*N) dot products. Precision HIGHEST (bf16x6 passes)
    # is required: default single-pass bf16 loses ~3 decimal digits on q,
    # which is larger than r^2 for the small grid spheres (r^2 ~ 1.6e-4)
    # and silently turns hits into misses. K=3 keeps the MXU cost trivial.
    dc = jnp.dot(d_blk, ct_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    om2c = jnp.dot(o_blk, ctm2_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    tp = dc - od                              # t_proj
    q = ccmr_ref[:] + om2c + oo               # |m|^2 - r^2
    disc = tp * tp - q                        # x^2 = r^2 - dist_sq
    x = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = tp - x
    # inside-sphere far-root rule (reference main.cpp:413-417)
    t = jnp.where(t_near < F32_EPS, tp + x, t_near)
    valid = (disc > 0.0) & (t > F32_EPS)
    tvals = jnp.where(valid, t, F32_MAX)

    tile_tmin = jnp.min(tvals, axis=1, keepdims=True)          # [BR,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, tvals.shape, 1) + j * block_n
    cand = jnp.where(tvals == tile_tmin, cols, jnp.full_like(cols, _I32_MAX))
    tile_idx = jnp.min(cand, axis=1, keepdims=True)            # [BR,1]

    # cross-tile running min; strict < keeps the earlier (lower-index) tile
    # on ties, matching jnp.argmin / reference FindFirstIndex
    better = tile_tmin < tmin_s[:]
    idx_s[:] = jnp.where(better, tile_idx, idx_s[:])
    tmin_s[:] = jnp.where(better, tile_tmin, tmin_s[:])

    @pl.when(j == n_sphere_tiles - 1)
    def _():
        t_out[:] = tmin_s[:]
        idx_out[:] = idx_s[:]


@functools.partial(jax.jit, static_argnames=("block_r", "block_n"))
def nearest_hit_pallas(center, radius, origin, direction,
                       block_r: int = BLOCK_R,
                       block_n: int = BLOCK_N) -> Hit:
    """Drop-in Pallas replacement for nearest_hit_jnp.

    center [N,3], radius [N], origin [R,3], direction [R,3] -> Hit([R]).
    """
    center = jax.lax.stop_gradient(center)
    radius = jax.lax.stop_gradient(radius)
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)

    n = center.shape[0]
    r = origin.shape[0]
    block_n = min(block_n, max(128, n))
    n_pad = -(-n // block_n) * block_n
    r_pad = -(-r // block_r) * block_r

    # scene side: [3,N] transposed SoA + fused constants
    ct = jnp.pad(center, ((0, n_pad - n), (0, 0))).T          # [3,Np]
    rad = jnp.pad(radius, (0, n_pad - n))
    ccmr = (jnp.sum(ct * ct, axis=0) - rad * rad)[None, :]    # [1,Np] |c|^2-r^2
    ctm2 = -2.0 * ct

    # ray side: packed [R,8] = [o, |o|^2, d, o.d]
    oo = jnp.sum(origin * origin, axis=-1, keepdims=True)
    od = jnp.sum(origin * direction, axis=-1, keepdims=True)
    rays = jnp.concatenate([origin, oo, direction, od], axis=-1)
    rays = jnp.pad(rays, ((0, r_pad - r), (0, 0)))

    n_ray_blocks = r_pad // block_r
    n_sphere_tiles = n_pad // block_n

    t, idx = pl.pallas_call(
        functools.partial(_kernel, n_sphere_tiles=n_sphere_tiles,
                          block_n=block_n),
        grid=(n_ray_blocks, n_sphere_tiles),
        in_specs=[
            pl.BlockSpec((block_r, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_r, 1), jnp.float32),
            pltpu.VMEM((block_r, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        # CPU (tests / virtual meshes): run the same kernel interpreted —
        # the Pallas analogue of the reference's debug asserts posture.
        interpret=jax.default_backend() == "cpu",
    )(rays, ct, ctm2, ccmr)

    return Hit(t=t[:r, 0], idx=idx[:r, 0])
