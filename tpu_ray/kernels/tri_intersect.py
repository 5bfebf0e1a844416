"""Pallas Möller–Trumbore nearest-hit, recast as MXU bilinear forms.

BASELINE config 4 ("Möller–Trumbore in Pallas, ~10k tris, 1080p"). The
standard formulation (ops/intersect_tri.py, Möller–Trumbore 1997) spends
~40 VPU ops per (triangle, ray) pair on two cross products and three dot
products. On TPU almost all of that moves to the MXU: by Cramer's rule the
four scalars of the test are TRILINEAR in (o - v0, d, edges), and with the
triangle fixed each is an affine function of the per-ray monomials
[o, d, o⊗d, 1] — a 16-vector:

    det   = -n.d                      n = e1 x e2
    t*det =  n.o - n.v0
    u*det =  sum_jk (E2x)_kj o_j d_k - (e2 x v0).d      E2x = [e2]_x
    v*det = -sum_jk (E1x)_kj o_j d_k - (v0 x e1).d

so ONE row-stacked coefficient table [4M, 96] and ONE K-stacked MXU
matmul against the in-VMEM feature block replace all pairwise cross
products: the four scalars stack along the output rows, and f32-class
precision comes from stacking the 6 significant bf16-chunk cross
products of the exact 3-chunk split ALONG K (16 -> 96, still under one
128 pad) instead of HIGHEST's 6 separate passes — 24 MXU passes -> 1
per (tile, ray block), identical error class (the K-stack scheme of
kernels/bounce_step._tile_roots). The VPU keeps only the sign-folded
barycentric tests, one reciprocal, and the packed argmin
(~19 ops/pair). Orientation and argmin
machinery are shared with the sphere search (kernels/sphere_intersect.py):
triangles on sublanes, rays on lanes, sublane min-reduce, packed
(t | index) carry across triangle tiles with the exact two-reduction
fallback for large M.

Numerics: u*det / v*det are differences of O(|o||e|) terms instead of the
reference's pre-subtracted (o - v0), so barycentrics near edges carry
~1e-4 relative error at world scale — near-edge winners can flip vs the
jnp path (tested statistically, like the sphere backends); the
differentiable payload is still recomputed exactly from the winner
(ops/intersect_tri.tri_payload), so gradients are unaffected.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX
from tpu_ray.core.trimesh import Triangles
from tpu_ray.kernels.bounce_step import _split3_bf16, _u32
from tpu_ray.ops.intersect import Hit
from tpu_ray.ops.intersect_tri import _DET_EPS

# Block sizes bound the kernel's scoped-VMEM working set: the stacked
# matmul output (det, t*det, u*det, v*det) is [4*BLOCK_M, BLOCK_R] f32
# plus the valid/t intermediates, and Mosaic's scoped-vmem budget is
# 16 MB — (512, 1024) keeps the live set ~11 MB ((1024, 2048) OOMs the
# TPU compile with a 42.9 MB stack allocation).
BLOCK_R = 1024   # rays per grid step (lane-major)
BLOCK_M = 512    # triangles per VMEM tile (sublane-major)
_PACK_MAX_M = 2048
_I32_MAX = 2**31 - 1


def _cross_mat(a):
    """[M,3] -> [M,3,3] cross-product matrices [a]_x with (a x b) = A @ b."""
    z = jnp.zeros_like(a[:, 0])
    return jnp.stack([
        jnp.stack([z, -a[:, 2], a[:, 1]], axis=1),
        jnp.stack([a[:, 2], z, -a[:, 0]], axis=1),
        jnp.stack([-a[:, 1], a[:, 0], z], axis=1),
    ], axis=1)


def tri_search_tables(tris: Triangles, block_m: int):
    """-> [4*m_pad, 96] bf16 tile-major coefficient table: each block_m
    tile's rows are [det; t*det; u*det; v*det] coefficient groups against
    the ray features [o, d, o (x) d (j-major), 1]; columns are the
    K-stacked bf16 chunk groups [a1 a1 a2 a1 a2 a3] of the exact 3-chunk
    split (one DEFAULT matmul per tile — see module docstring). m_pad is
    the block_m round-up; padding triangles get all-zero rows => det = 0
    => rejected."""
    v0 = jax.lax.stop_gradient(tris.v0)
    e1 = jax.lax.stop_gradient(tris.e1)
    e2 = jax.lax.stop_gradient(tris.e2)
    m = v0.shape[0]
    m_pad = -(-m // block_m) * block_m
    n = jnp.cross(e1, e2)
    z3 = jnp.zeros((m, 3), jnp.float32)
    z9 = jnp.zeros((m, 9), jnp.float32)
    z1 = jnp.zeros((m, 1), jnp.float32)

    def block(o_c, d_c, w_c, k_c):
        return jnp.pad(jnp.concatenate([o_c, d_c, w_c, k_c], axis=1),
                       ((0, m_pad - m), (0, 0)))          # [m_pad,16]

    # coef(w_jk) = (E2x)_kj  -> flatten j-major: w index = 3*j + k
    e2x_t = jnp.transpose(_cross_mat(e2), (0, 2, 1)).reshape(m, 9)
    e1x_t = jnp.transpose(_cross_mat(e1), (0, 2, 1)).reshape(m, 9)

    det_t = block(z3, -n, z9, z1)
    t_t = block(n, z3, z9, -jnp.sum(n * v0, axis=1, keepdims=True))
    u_t = block(z3, -jnp.cross(e2, v0), e2x_t, z1)
    v_t = block(z3, -jnp.cross(v0, e1), -e1x_t, z1)
    n_t = m_pad // block_m
    rows = jnp.concatenate(
        [x.reshape(n_t, block_m, 16) for x in (det_t, t_t, u_t, v_t)],
        axis=1).reshape(4 * m_pad, 16)
    a1, a2, a3 = _split3_bf16(
        rows,
        lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32),
        lambda u: jax.lax.bitcast_convert_type(u, jnp.float32))
    return jnp.concatenate([a1, a1, a2, a1, a2, a3], axis=1)  # [4m_pad,96]


def _features(o, d):
    """[3,BR] o/d slices -> [96,BR] K-stacked bf16 feature block: the
    monomials [o, d, o(x)d j-major, 1] bit-split into exact bf16 chunks
    and stacked [b1; b2; b1; b3; b2; b1] against the table's column
    groups (kernels/bounce_step._tile_roots scheme)."""
    w = [o[j:j + 1, :] * d[k:k + 1, :] for j in range(3) for k in range(3)]
    one = jnp.ones_like(o[0:1, :])
    feats = jnp.concatenate([o, d, *w, one], axis=0)       # [16,BR]
    b1, b2, b3 = _split3_bf16(
        feats, _u32, lambda u: pltpu.bitcast(u, jnp.float32))
    return jnp.concatenate([b1, b2, b1, b3, b2, b1], axis=0)


def _tri_t(tab_ref, feats):
    """[4Mt,96] coefficient tile x [96,BR] features -> shifted valid-t
    [Mt,BR] (t - eps; <= 0 or F32_MAX-shifted where invalid). ONE
    K-stacked DEFAULT matmul computes all four scalars row-stacked."""
    bm = tab_ref.shape[0] // 4
    tpq = jnp.dot(tab_ref[:], feats, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)     # [4bm,BR]
    det = tpq[0:bm, :]
    t_d = tpq[bm:2 * bm, :]
    u_d = tpq[2 * bm:3 * bm, :]
    v_d = tpq[3 * bm:4 * bm, :]

    s = jnp.where(det >= 0.0, 1.0, -1.0)
    absdet = det * s
    us = u_d * s
    vs = v_d * s
    t = t_d * (1.0 / jnp.where(absdet > _DET_EPS, det, 1.0))
    valid = ((absdet > _DET_EPS) & (us >= 0.0) & (vs >= 0.0)
             & (us + vs <= absdet) & (t > F32_EPS))
    return jnp.where(valid, t - F32_EPS, F32_MAX)


def _kernel_packed(ot_ref, dt_ref, tab_ref, t_out, idx_out, carry_s, *,
                   n_tiles: int, block_m: int, idx_bits: int):
    j = pl.program_id(1)
    tb = _tri_t(tab_ref, _features(ot_ref[:], dt_ref[:]))
    low_mask = (1 << idx_bits) - 1
    rows = (jax.lax.broadcasted_iota(jnp.int32, tb.shape, 0) + j * block_m)
    bits = pltpu.bitcast(tb, jnp.uint32)
    packed = (bits & jnp.uint32(~low_mask & 0xFFFFFFFF)) | pltpu.bitcast(
        rows, jnp.uint32)
    ps = pltpu.bitcast(packed ^ jnp.uint32(0x80000000), jnp.int32)
    pmin = jnp.min(ps, axis=0, keepdims=True)

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


def _kernel_exact(ot_ref, dt_ref, tab_ref, t_out, idx_out, tmin_s, idx_s, *,
                  n_tiles: int, block_m: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tmin_s[:] = jnp.full_like(tmin_s, F32_MAX)
        idx_s[:] = jnp.zeros_like(idx_s)

    tb = _tri_t(tab_ref, _features(ot_ref[:], dt_ref[:]))
    tv = jnp.where(tb < F32_MAX, tb + F32_EPS, F32_MAX)
    tile_tmin = jnp.min(tv, axis=0, keepdims=True)
    rows = (jax.lax.broadcasted_iota(jnp.int32, tv.shape, 0) + j * block_m)
    cand = jnp.where(tv == tile_tmin, rows, jnp.int32(_I32_MAX))
    tile_idx = jnp.min(cand, axis=0, keepdims=True)

    better = tile_tmin < tmin_s[:]
    idx_s[:] = jnp.where(better, tile_idx, idx_s[:])
    tmin_s[:] = jnp.where(better, tile_tmin, tmin_s[:])

    @pl.when(j == n_tiles - 1)
    def _():
        t_out[:] = tmin_s[:]
        idx_out[:] = idx_s[:]


def _kernel_stream(cnt_ref, lst_ref, ot_ref, dt_ref, tab_hbm, t_out,
                   idx_out, buf, sem, *, block_m: int, group: int):
    """List-driven HBM-streaming nearest hit for soups past the resident
    cliff (~13k tris, bounce_step.resident_tables_fit): grid over ray
    blocks only; this block group's compacted reachable-tile list
    (tri_block_lists — exact per-lane slab tests) drives double-buffered
    async DMA of ONLY reachable [4*block_m, 96] coefficient tiles from
    HBM, overlapped with the MT fold of the previous tile. The streamed
    full sweep this replaces re-DMAs every tile for every ray block
    (O(B*M) bandwidth — 100k tris at 1080p is ~150 GB per bounce); this
    pays O(B * reach * M), and primary-bounce reach for a framed mesh is
    a few percent. Fold order is ascending tile id with the exact
    two-reduction carry — bit-identical to the full exact sweep (skipped
    tiles provably cannot win, tri_block_lists docstring)."""
    i = pl.program_id(0)
    g = i // group
    cnt = cnt_ref[g, 0]
    # K padded 96 -> 128: HBM slices must be 128-lane aligned; the zero
    # feature rows cancel the table's zero pad columns exactly
    feats = jnp.concatenate(
        [_features(ot_ref[:], dt_ref[:]),
         jnp.zeros((32, ot_ref.shape[1]), jnp.bfloat16)], axis=0)

    def get_dma(slot, k):
        tile = lst_ref[g, k]
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(tile * (4 * block_m), 4 * block_m), :],
            buf.at[slot], sem.at[slot])

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, carry):
        tmin, idx = carry
        slot = k % 2

        @pl.when(k + 1 < cnt)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        tile = lst_ref[g, k]
        tb = _tri_t(buf[slot], feats)
        tv = jnp.where(tb < F32_MAX, tb + F32_EPS, F32_MAX)
        tile_tmin = jnp.min(tv, axis=0, keepdims=True)
        rows = (jax.lax.broadcasted_iota(jnp.int32, tv.shape, 0)
                + tile * block_m)
        cand = jnp.where(tv == tile_tmin, rows, jnp.int32(_I32_MAX))
        tile_idx = jnp.min(cand, axis=0, keepdims=True)
        better = tile_tmin < tmin
        return (jnp.where(better, tile_tmin, tmin),
                jnp.where(better, tile_idx, idx))

    br = ot_ref.shape[1]
    tmin, idx = jax.lax.fori_loop(
        0, cnt, body, (jnp.full((1, br), F32_MAX, jnp.float32),
                       jnp.zeros((1, br), jnp.int32)))
    t_out[:] = tmin
    idx_out[:] = idx


@functools.partial(jax.jit, static_argnames=("block_r", "block_m"))
def nearest_hit_tri_stream(tris: Triangles, origin, direction,
                           block_r: int = BLOCK_R,
                           block_m: int = 128, alive=None) -> Hit:
    """Nearest triangle hit for soups too big for any VMEM residency:
    per-ray-block reachable-tile lists + double-buffered HBM DMA
    (_kernel_stream). Drop-in for nearest_hit_tri_jnp — and the only
    practical route past ~13k tris: the jnp path materializes [R, M]
    (17 GB at one 43k-ray chunk x 100k tris) and the fused/resident
    paths need the whole table in VMEM.

    alive [R] bool (optional): lanes whose search result is consumed.
    Dead lanes are excluded from the reachability lists, so blocks the
    sorted-bounce wavefront has packed all-dead stream ZERO tiles —
    without this the lists keep serving a dead lane's last direction
    forever. Dead lanes' returned (t, idx) are then meaningless
    (they miss); callers already mask every consumer by aliveness."""
    from tpu_ray.kernels.bounce_step import (list_group, tri_block_lists,
                                             tri_tile_boxes)
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    m = tris.v0.shape[0]
    r = origin.shape[0]
    m_pad = -(-m // block_m) * block_m
    r_pad = -(-r // block_r) * block_r
    n_blocks = r_pad // block_r
    n_tiles = m_pad // block_m

    tab = tri_search_tables(tris, block_m)                # [4*m_pad,96]
    tab = jnp.pad(tab, ((0, 0), (0, 32)))                 # K 96 -> 128
    boxes = jax.lax.stop_gradient(tri_tile_boxes(tris, block_m))

    ot = jnp.pad(origin, ((0, r_pad - r), (0, 0))).T
    dt = jnp.pad(direction, ((0, r_pad - r), (0, 0))).T
    live_row = (jnp.ones((r,), jnp.float32) if alive is None
                else jax.lax.stop_gradient(alive).astype(jnp.float32))
    st = jnp.zeros((16, r_pad), jnp.float32)
    st = st.at[0:3].set(ot).at[3:6].set(dt).at[12, :r].set(live_row)
    grp = list_group(n_blocks, n_tiles)
    cnt, lst = tri_block_lists(boxes, st, block_r, grp)
    n_groups = cnt.shape[0]

    t, idx = pl.pallas_call(
        functools.partial(_kernel_stream, block_m=block_m, group=grp),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_groups, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_groups, n_tiles), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),            # table in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_r), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4 * block_m, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=jax.default_backend() == "cpu",
    )(cnt, lst, ot, dt, tab)

    return Hit(t=t[0, :r], idx=idx[0, :r])


@functools.partial(jax.jit, static_argnames=("block_r", "block_m", "exact"))
def nearest_hit_tri_pallas(tris: Triangles, origin, direction,
                           block_r: int = BLOCK_R,
                           block_m: int = BLOCK_M,
                           exact: bool = False) -> Hit:
    """Drop-in Pallas replacement for nearest_hit_tri_jnp.

    origin/direction [R,3] -> Hit([R]) over tris.n_pad triangles.
    """
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)

    m = tris.v0.shape[0]
    r = origin.shape[0]
    block_m = min(block_m, max(8, -(-m // 8) * 8))
    m_pad = -(-m // block_m) * block_m
    r_pad = -(-r // block_r) * block_r

    tab = tri_search_tables(tris, block_m)            # [4*m_pad,96]

    ot = jnp.pad(origin, ((0, r_pad - r), (0, 0))).T
    dt = jnp.pad(direction, ((0, r_pad - r), (0, 0))).T

    n_ray_blocks = r_pad // block_r
    n_tiles = m_pad // block_m
    use_packed = (not exact) and m_pad <= _PACK_MAX_M

    if use_packed:
        idx_bits = max(1, (m_pad - 1).bit_length())
        kernel = functools.partial(_kernel_packed, n_tiles=n_tiles,
                                   block_m=block_m, idx_bits=idx_bits)
        scratch = [pltpu.VMEM((1, block_r), jnp.int32)]
    else:
        kernel = functools.partial(_kernel_exact, n_tiles=n_tiles,
                                   block_m=block_m)
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
            pl.BlockSpec((4 * block_m, 96), lambda i, j: (j, 0),
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
        interpret=jax.default_backend() == "cpu",
    )(ot, dt, tab)

    return Hit(t=t[0, :r], idx=idx[0, :r])
