"""Fused non-path estimator kernels: flat and Lambert + shadow rays.

BASELINE configs 1-2 run the simple estimators (ops/shading_modes.py:
primary visibility; Lambertian direct lighting with one nearest-hit
shadow probe per light). Until r4 they had only the jnp/pallas PROBE
backends — search kernel + XLA payload gathers/masks — measured at 0.19
of their op-mix floor (BASELINE config 2 row: the gap is probe-path
glue). This kernel is the promised fused route (VERDICT r3 item 5): one
Pallas launch per ray block does in-kernel raygen (the regen replay,
bit-identical to ops/raygen.camera_rays), the K-stacked search fold, the
exact 3-pass bf16 winner gather, and the estimator's shading — including
the SHADOW search for lambert (a second fold from the hit point toward
each light; visibility = the nearest hit IS the light, exactly
ops/shading_modes.trace_lambert_shadow's rule, which generalizes the
reference's emissive-accumulation term, main.cpp:433-440).

spp samples accumulate inside the kernel (the estimators have no bounce
loop, so every lane does exactly spp * (1 + L-shadow-probes-on-hit) rays
— no occupancy problem, no while loop, no state round-trips).

Parity class vs the probe backends: the fused search evaluates the same
quadratic through a different f32 op sequence (K-stacked coefficient
matmul vs the probe's projection form), so rare borderline/near-tie
winners can differ — the same statistical-parity contract as the fused
path backend (tests/test_shading_modes.py:72-178; goldens pin the fused route
separately, as for path mode).

Gradients: the host wrapper carries a custom VJP whose backward re-runs
the PROBE-path estimator (O(R) recompute, differentiable through
hit_payload/gather_rows) and transposes that — the estimators are
1-probe-deep, so recompute is cheap and no residuals are saved. Forward
values and backward linearization can differ on the near-tie class above
(documented; the probe path remains the exact-gradient route).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ray.core.scene import F32_EPS, F32_MAX, Scene
from tpu_ray.kernels.bounce_step import (
    BLOCK_R, _TRI_TILE, _exact_tile, _fused_tables, _gather_winner,
    _interpret, _pack_bits, _pack_tile, _sph_bk, _tile_roots, _tile_tri_t,
    _tri_bk, _u32, _unpack, _use_pack, morton_perm, permute_spheres,
    resident_tables_fit)
from tpu_ray.kernels.regen import _cam13, _lane_rays


def _fold(o3, d3, stab_ref, tri_ref=None, *, n_tiles: int, block_n: int,
          pack: bool, low_mask: int, miss_s: int, n_pad: int = 0,
          m_tiles: int = 0, tri_list=None):
    """Nearest-hit search fold over the resident tile-major sphere table
    (+ optional resident triangle table, r5) for rays (o3, d3) [3,BR]
    each. -> (idx [1,BR] i32 GLOBAL primitive id, -1 on miss; hit [1,BR]
    bool). Identical folds and tie rules to the regen/bounce kernels:
    spheres first, then ascending triangle tiles with strict <, global
    tri ids offset by n_pad. tri_list (cnt scalar, lst_ref row) — the
    PRIMARY fold's per-block frustum-reachable tile list (r5): folds
    only cnt listed tiles via a dynamic-trip loop (ascending id, so the
    tie rule is unchanged and skipped tiles provably cannot win —
    cull_mask conservativeness)."""
    st6 = jnp.concatenate([o3, d3], axis=0)
    bk = _sph_bk(st6)
    tbk = _tri_bk(st6) if m_tiles else None
    br = o3.shape[1]

    def tri_rows(tile):
        return tri_ref[pl.ds(tile * 4 * _TRI_TILE, 4 * _TRI_TILE), :]

    if pack:
        carry = jnp.full((1, br), miss_s, jnp.int32)
        for js in range(n_tiles):
            rows = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
            tb = _tile_roots(st6, rows, block_n, bk)
            carry = jnp.minimum(
                carry, jnp.min(_pack_tile(tb, js * block_n, low_mask),
                               axis=0, keepdims=True))
        if tri_list is not None:
            cnt, tile_at = tri_list

            def w_body(k, carry):
                tile = tile_at(k)
                tb = _tile_tri_t(st6, tri_rows(tile), _TRI_TILE, tbk)
                return jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, n_pad + tile * _TRI_TILE,
                                              low_mask),
                                   axis=0, keepdims=True))

            # 2x unroll: same dynamic-trip fixed-cost finding as the
            # path kernels' list folds
            def w_pair(j, carry):
                return w_body(2 * j + 1, w_body(2 * j, carry))

            carry = jax.lax.fori_loop(0, cnt // 2, w_pair, carry)
            carry = jax.lax.fori_loop(cnt // 2 * 2, cnt, w_body, carry)
        else:
            for jt in range(m_tiles):
                tb = _tile_tri_t(st6, tri_rows(jt), _TRI_TILE, tbk)
                carry = jnp.minimum(
                    carry, jnp.min(_pack_tile(tb, n_pad + jt * _TRI_TILE,
                                              low_mask),
                                   axis=0, keepdims=True))
        return _unpack(carry, low_mask, miss_s)
    tmin = jnp.full((1, br), F32_MAX, jnp.float32)
    idxc = jnp.zeros((1, br), jnp.int32)
    for js in range(n_tiles):
        rows = stab_ref[pl.ds(js * 2 * block_n, 2 * block_n), :]
        tb = _tile_roots(st6, rows, block_n, bk)
        tm, ic = _exact_tile(tb, js * block_n, shift_valid=True)
        better = tm < tmin
        idxc = jnp.where(better, ic, idxc)
        tmin = jnp.where(better, tm, tmin)
    if m_tiles and tri_list is not None:
        cnt, tile_at = tri_list

        def e_body(k, c):
            tmin, idxc = c
            tile = tile_at(k)
            tb = _tile_tri_t(st6, tri_rows(tile), _TRI_TILE, tbk)
            tm, ic = _exact_tile(tb, n_pad + tile * _TRI_TILE,
                                 shift_valid=False)
            better = tm < tmin
            return (jnp.where(better, tm, tmin),
                    jnp.where(better, ic, idxc))

        def e_pair(j, c):
            return e_body(2 * j + 1, e_body(2 * j, c))

        tmin, idxc = jax.lax.fori_loop(0, cnt // 2, e_pair, (tmin, idxc))
        tmin, idxc = jax.lax.fori_loop(cnt // 2 * 2, cnt, e_body,
                                       (tmin, idxc))
    else:
        for jt in range(m_tiles):
            tb = _tile_tri_t(st6, tri_rows(jt), _TRI_TILE, tbk)
            tm, ic = _exact_tile(tb, n_pad + jt * _TRI_TILE,
                                 shift_valid=False)
            better = tm < tmin
            idxc = jnp.where(better, ic, idxc)
            tmin = jnp.where(better, tm, tmin)
    hit = tmin < F32_MAX
    return jnp.where(hit, idxc, jnp.int32(-1)), hit


def _sky3(d3):
    """ops/shade.sky_color rows: (1-a) * white + a * (0.5, 0.7, 1.0)."""
    a = (d3[1:2, :] + 1.0) * 0.5
    one = 1.0 - a
    return jnp.concatenate(
        [one + a * 0.5, one + a * 0.7, one + a * 1.0], axis=0)


def _nrm3(v3):
    """ops/vec.normalize_eps on [3,BR] rows (same 1/sqrt form)."""
    lsq = jnp.sum(v3 * v3, axis=0, keepdims=True)
    ok = lsq > F32_EPS
    inv = 1.0 / jnp.sqrt(jnp.where(ok, lsq, 1.0))
    return jnp.where(ok, v3 * inv, 0.0)


def _simple_kernel(cam_ref, *refs, n_pad: int, m_pad: int, block_n: int,
                   spp: int, n_lights: int, use_sky: bool, pack: bool,
                   width: int, height: int, film_w: float, film_h: float,
                   group: int = 1):
    """spp samples of the flat (n_lights < 0) or lambert_shadow estimator
    for one ray block. Output rows: 0:3 color sum over spp, 3 rays cast
    (exact small f32). m_pad > 0 (r5): a VMEM-resident triangle table
    joins every fold (primary AND shadow — triangles occlude) and the
    lambert payload recomputes the winner via the plane form (_shade's
    triangle branch recipe)."""
    flat = n_lights < 0
    k = 0
    if not flat:
        lidx_ref = refs[k]; k += 1
        ldat_ref = refs[k]; k += 1
    tri_ref = cnt_ref = lst_ref = scnt_ref = slst_ref = None
    if m_pad:
        tri_ref = refs[k]; k += 1
        cnt_ref = refs[k]; k += 1    # [1,G] SMEM: primary list lengths
        lst_ref = refs[k]; k += 1    # [T,G] SMEM: primary tile lists
        if not flat:
            scnt_ref = refs[k]; k += 1   # shadow-fold lists (see wrapper)
            slst_ref = refs[k]; k += 1
    in_ref, stab_ref, table_ref, out_ref = refs[k:k + 4]
    n_tiles = n_pad // block_n
    m_tiles = m_pad // _TRI_TILE
    low_mask, miss_s = _pack_bits(n_pad + m_pad)
    br = in_ref.shape[1]
    ax = in_ref[0:1, :]
    ay = in_ref[1:2, :]
    h1 = _u32(in_ref[2:3, :])
    s0 = cam_ref[0, 12].astype(jnp.int32)

    fold = functools.partial(_fold, n_tiles=n_tiles, block_n=block_n,
                             pack=pack, low_mask=low_mask, miss_s=miss_s,
                             n_pad=n_pad, m_tiles=m_tiles)
    # the primary fold's frustum list covers every spp sample (jitter
    # inflation baked in host-side); shadow folds sweep all tiles.
    # lists are per GROUP of `group` consecutive ray blocks (SMEM budget)
    shadow_list = None
    if m_pad:
        g = pl.program_id(0) // group
        prim_list = (cnt_ref[0, g], lambda k: lst_ref[k, g])
        if not flat:
            shadow_list = (scnt_ref[0, g], lambda k: slst_ref[k, g])
    else:
        prim_list = None

    def sample(s, carry):
        acc, rays = carry
        s_next = jnp.full((1, br), s0 + s, jnp.int32)
        o3, d3, _ = _lane_rays(cam_ref, ax, ay, h1, s_next,
                               width, height, film_w, film_h)
        idx, hit = fold(o3, d3, stab_ref, tri_ref, tri_list=prim_list)
        winner, _ = _gather_winner(table_ref, idx, n_pad + m_pad)
        alb = winner[4:7, :]
        emis = winner[7:10, :]
        hit3 = jnp.broadcast_to(hit, (3, br))
        miss3 = _sky3(d3) if use_sky else jnp.zeros((3, br), jnp.float32)
        rays = rays + 1.0
        if flat:
            return acc + jnp.where(hit3, alb + emis, miss3), rays

        # ops/intersect.hit_payload math from the gathered winner
        c3 = winner[0:3, :]
        r1 = winner[3:4, :]
        m3 = c3 - o3
        t_proj = jnp.sum(m3 * d3, axis=0, keepdims=True)
        p3 = m3 - d3 * t_proj
        dsq = jnp.sum(p3 * p3, axis=0, keepdims=True)
        disc = r1 * r1 - dsq
        pos = disc > 0.0
        x = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
        t_near = t_proj - x
        inside = t_near < F32_EPS
        t = jnp.where(inside, t_proj + x, t_near)
        n3 = _nrm3(o3 + d3 * t - c3)           # outward sphere normal
        if m_pad:
            # triangle winner: plane form (n, k) sits in the (center,
            # radius) slots — t = (k - n.o)/(n.d), normal = n, backface
            # (n.d > 0) flips (ops/intersect_tri.tri_payload rule,
            # identical to kernels/bounce_step._shade's triangle branch)
            is_tri = idx >= n_pad
            is_tri3 = jnp.broadcast_to(is_tri, (3, br))
            nd = jnp.sum(d3 * c3, axis=0, keepdims=True)
            no = jnp.sum(o3 * c3, axis=0, keepdims=True)
            t_t = (r1 - no) / jnp.where(nd == 0.0, 1.0, nd)
            t = jnp.where(is_tri, t_t, t)
            # logical form, not where-on-bool: Mosaic rejects i1 selects
            # ("unsupported target bitwidth for truncation"); same form
            # as bounce_step._shade's triangle branch
            inside = ((is_tri & (nd > 0.0))
                      | (jnp.logical_not(is_tri) & inside))
            n3 = jnp.where(is_tri3, _nrm3(c3), n3)
        no3 = o3 + d3 * t                      # next_origin
        n3 = jnp.where(jnp.broadcast_to(inside, (3, br)), -n3, n3)

        color = emis
        for j in range(n_lights):
            li = lidx_ref[0, j]
            lc = jnp.stack([ldat_ref[j, 0], ldat_ref[j, 1],
                            ldat_ref[j, 2]]).reshape(3, 1)
            lem = jnp.stack([ldat_ref[j, 3], ldat_ref[j, 4],
                             ldat_ref[j, 5]]).reshape(3, 1)
            ld3 = _nrm3(lc - no3)
            sidx, shit = fold(no3, ld3, stab_ref, tri_ref,
                              tri_list=shadow_list)
            visible = shit & (sidx == li) & hit
            lam = jnp.maximum(jnp.sum(n3 * ld3, axis=0, keepdims=True),
                              0.0)
            color = color + jnp.where(
                jnp.broadcast_to(visible, (3, br)), alb * lem * lam, 0.0)
            rays = rays + jnp.where(hit, 1.0, 0.0)
        return acc + jnp.where(hit3, color, miss3), rays

    carry = (jnp.zeros((3, br), jnp.float32),
             jnp.zeros((1, br), jnp.float32))
    if spp <= 8:
        # full unroll: the dynamic-trip fori costs a real fixed overhead
        # per iteration on Mosaic (same finding as regen_seg_bwd's 8x
        # unroll); BASELINE configs run 1-4 spp
        for s in range(spp):
            carry = sample(jnp.int32(s), carry)
        acc, rays = carry
    else:
        acc, rays = jax.lax.fori_loop(0, spp, sample, carry)
    out_ref[0:3, :] = acc
    out_ref[3:4, :] = rays
    out_ref[4:8, :] = jnp.zeros((4, br), jnp.float32)


@functools.lru_cache(maxsize=None)
def make_simple_trace(width: int, height: int, seed: int, spp: int,
                      mode: str, lights: tuple = (),
                      block_r: int = BLOCK_R, exact_argmin: bool = False):
    """Differentiable fused estimator trace: (scene, camera, pixel, s0)
    -> (color_sum [R,3] over spp, rays_cast [] u32). mode 'flat' or
    'lambert_shadow' (lights = static GLOBAL sphere indices of emissive
    spheres, as scene_light_indices returns). Custom VJP: backward
    re-runs the probe-path estimator (module docstring)."""
    from tpu_ray.core import rng
    from tpu_ray.core.camera import film_extent
    from tpu_ray.ops.raygen import camera_rays
    from tpu_ray.ops.shading_modes import (scene_light_data, trace_flat,
                                           trace_lambert_shadow)
    assert mode in ("flat", "lambert_shadow"), mode
    film_w, film_h = film_extent(width, height)
    n_lights = -1 if mode == "flat" else len(lights)

    def kernel_run(scene: Scene, camera, pixel, s0):
        perm = morton_perm(scene)
        scene_p = permute_spheres(scene, perm)
        tb = _fused_tables(scene_p)
        n_pad, m_pad = tb["n_pad"], tb["m_pad"]
        assert m_pad == 0 or resident_tables_fit(n_pad, m_pad), \
            "fused estimators need VMEM-resident tables (the router warns" \
            " and falls back to the probe path past the cliff)"
        block_n = min(n_pad, 1024)     # stab_full's tile height
        pack = _use_pack(n_pad + m_pad, exact_argmin)

        r = pixel.shape[0]
        r_pad = -(-r // block_r) * block_r
        ax = (pixel % width).astype(jnp.float32)
        ay = (pixel // width).astype(jnp.float32)
        h1 = rng.pcg_hash(pixel.astype(jnp.uint32)
                          * jnp.uint32(0x9E3779B1)
                          ^ jnp.uint32(int(seed) & 0xFFFFFFFF), jnp)
        rows = jnp.zeros((8, r_pad), jnp.float32)
        rows = rows.at[0, :r].set(ax)
        rows = rows.at[1, :r].set(ay)
        rows = rows.at[2, :r].set(
            jax.lax.bitcast_convert_type(h1, jnp.float32))
        cam13 = _cam13(camera, jnp.asarray(s0, jnp.float32))

        extra_in, extra_specs = [], []
        if n_lights >= 0:
            # lights are GLOBAL indices; the kernel compares against the
            # PERMUTED winner id. Pad the SMEM blocks to >= 1 row (a
            # no-light lambert scene still compiles; the kernel's light
            # loop trips n_lights times so pads are never read).
            lp = max(1, n_lights)
            li = jnp.full((lp,), -2, jnp.int32)
            ld = jnp.zeros((lp, 6), jnp.float32)
            if n_lights:
                lg = jnp.asarray(list(lights), jnp.int32).reshape(-1)
                li = li.at[:n_lights].set(jnp.argmax(
                    perm[None, :] == lg[:, None], axis=1).astype(jnp.int32))
                lc, lem = scene_light_data(scene, lights)
                ld = ld.at[:n_lights].set(
                    jnp.concatenate([lc, lem], axis=1))
            extra_in = [li.reshape(1, lp), ld]
            extra_specs = [
                pl.BlockSpec((1, lp), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((lp, 6), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
        if m_pad:
            # VMEM-resident MT coefficient table, DMA'd once (constant
            # index map) — the resident-sweep shape of the path kernels
            extra_in.append(tb["tri_full"])
            extra_specs.append(
                pl.BlockSpec((4 * m_pad, 96), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
            # per-block frustum-reachable tile lists for the PRIMARY
            # fold (r5): the block's rays over ALL spp samples lie in
            # the pixel-rect frustum from the camera position — jitter
            # inflates the film interval by +-0.5 px — and the slab
            # feasibility test is scale-invariant in d, so the
            # UNNORMALIZED direction interval feeds cull_mask directly.
            # Conservative: skipped tiles cannot hold any sample's
            # nearest hit (cull_mask docstring; inflated boxes absorb
            # the MT accept band like tri_block_lists).
            from tpu_ray.kernels.bounce_step import (cull_mask,
                                                     tri_tile_boxes)
            n_blocks = r_pad // block_r
            cam_x, cam_y, _, film_center = camera.basis()
            pos = camera.position
            big = jnp.float32(3.0e38)
            axp = jnp.full((r_pad,), big).at[:r].set(ax)
            ayp = jnp.full((r_pad,), big).at[:r].set(ay)
            axn = jnp.full((r_pad,), -big).at[:r].set(ax)
            ayn = jnp.full((r_pad,), -big).at[:r].set(ay)
            xlo = axp.reshape(n_blocks, block_r).min(axis=1) - 0.5
            xhi = axn.reshape(n_blocks, block_r).max(axis=1) + 0.5
            ylo = ayp.reshape(n_blocks, block_r).min(axis=1) - 0.5
            yhi = ayn.reshape(n_blocks, block_r).max(axis=1) + 0.5

            def film(v, n, ext):    # raygen film map, monotone in v
                return (-1.0 + v * 2.0 / n) * (ext * 0.5)

            eps = jnp.float32(1e-5)
            fxl = film(xlo, width, float(film_w)) - eps
            fxh = film(xhi, width, float(film_w)) + eps
            fyl = film(ylo, height, float(film_h)) - eps
            fyh = film(yhi, height, float(film_h)) + eps

            def axis_terms(flo, fhi, basis):
                a = flo[:, None] * basis[None, :]
                b = fhi[:, None] * basis[None, :]
                return jnp.minimum(a, b), jnp.maximum(a, b)

            xl, xh = axis_terms(fxl, fxh, cam_x)
            yl, yh = axis_terms(fyl, fyh, cam_y)
            base = (film_center - pos)[None, :]
            dlo = base + xl + yl                        # [B,3]
            dhi = base + xh + yh
            # all-padding blocks produce inverted (+big) bounds -> the
            # le_interval constraints go infeasible -> empty lists
            olo = jnp.broadcast_to(pos[None, :], dlo.shape)
            boxes = jax.lax.stop_gradient(
                tri_tile_boxes(scene_p.tris, _TRI_TILE))
            mask = cull_mask(olo, olo, jax.lax.stop_gradient(dlo),
                             jax.lax.stop_gradient(dhi),
                             boxes[:, 0:3], boxes[:, 3:6])   # [B,T]
            m_tiles = m_pad // _TRI_TILE
            # group G consecutive blocks per list row (OR of reach) so
            # the SMEM table stays under budget, and keep it BLOCK-MINOR
            # — [B,1]-major SMEM windows pad the minor dim to 128 lanes
            # (both r4 lessons, kernels/bounce_step.list_group)
            from tpu_ray.kernels.bounce_step import list_group
            grp = list_group(n_blocks, m_tiles)
            pad_b = (-n_blocks) % grp
            if pad_b:
                mask = jnp.concatenate(
                    [mask, jnp.zeros((pad_b, m_tiles), mask.dtype)],
                    axis=0)
            gmask = mask.reshape(-1, grp, m_tiles).max(axis=1)
            cnt = jnp.sum(gmask, axis=1).astype(jnp.int32)[None, :]
            lst = jnp.argsort(1 - gmask, axis=1,
                              stable=True).astype(jnp.int32).T
            n_groups = gmask.shape[0]
            extra_in += [cnt, lst]
            extra_specs += [
                pl.BlockSpec((1, n_groups), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((m_tiles, n_groups), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
            if n_lights > 0:
                # SHADOW-fold lists (r5): every shadow origin is a hit
                # point, which lies inside some primary-reached inflated
                # tile box (tri winner) or reached sphere tile box, and
                # every shadow ray points from there toward a light
                # center — so cull_mask over (per-group origin box,
                # light-box minus origin-box direction interval) is
                # conservative for ALL lights' probes. One list per
                # group serves every light (direction interval unions
                # the light centers).
                from tpu_ray.kernels.bounce_step import tile_bounds
                slo, shi = tile_bounds(scene_p, min(n_pad, 1024))
                inf = jnp.float32(3.0e38)

                def reached_box(m, lo, hi):
                    # [G,T] mask x [T,3] boxes -> per-group AABB union
                    mm = m[:, :, None].astype(jnp.float32)
                    glo = jnp.min(jnp.where(mm > 0, lo[None], inf),
                                  axis=1)
                    ghi = jnp.max(jnp.where(mm > 0, hi[None], -inf),
                                  axis=1)
                    return glo, ghi
                # sphere tiles reachable from the same primary frustum
                pdlo = jnp.concatenate(
                    [dlo, jnp.zeros((pad_b, 3), dlo.dtype)], axis=0) \
                    if pad_b else dlo
                pdhi = jnp.concatenate(
                    [dhi, jnp.zeros((pad_b, 3), dhi.dtype)], axis=0) \
                    if pad_b else dhi
                gdlo = pdlo.reshape(-1, grp, 3).min(axis=1)
                gdhi = pdhi.reshape(-1, grp, 3).max(axis=1)
                golo = jnp.broadcast_to(pos[None, :], gdlo.shape)
                smask_s = cull_mask(golo, golo, gdlo, gdhi, slo, shi)
                t_lo, t_hi = reached_box(gmask, boxes[:, 0:3],
                                         boxes[:, 3:6])
                s_lo, s_hi = reached_box(smask_s, slo, shi)
                olo_g = jnp.minimum(t_lo, s_lo)
                ohi_g = jnp.maximum(t_hi, s_hi)
                lc, _ = scene_light_data(scene, lights)
                lmin = jax.lax.stop_gradient(jnp.min(lc, axis=0))
                lmax = jax.lax.stop_gradient(jnp.max(lc, axis=0))
                sdlo = lmin[None, :] - ohi_g
                sdhi = lmax[None, :] - olo_g
                smask = cull_mask(olo_g, ohi_g, sdlo, sdhi,
                                  boxes[:, 0:3], boxes[:, 3:6])  # [G,T]
                scnt = jnp.sum(smask, axis=1).astype(jnp.int32)[None, :]
                slst = jnp.argsort(1 - smask, axis=1,
                                   stable=True).astype(jnp.int32).T
                extra_in += [scnt, slst]
                extra_specs += [
                    pl.BlockSpec((1, n_groups), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((m_tiles, n_groups), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]

        out = pl.pallas_call(
            functools.partial(
                _simple_kernel, n_pad=n_pad, m_pad=m_pad, block_n=block_n,
                spp=spp, n_lights=n_lights, use_sky=scene_p.use_sky,
                pack=pack, width=width, height=height,
                film_w=float(film_w), film_h=float(film_h),
                group=grp if m_pad else 1),
            grid=(r_pad // block_r,),
            in_specs=[
                pl.BlockSpec((1, 13), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                *extra_specs,
                pl.BlockSpec((8, block_r), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * n_pad, 54), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((48, n_pad + m_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, block_r), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, r_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(cam13, *extra_in, rows, tb["stab_full"], tb["t48"])
        color = out[0:3, :r].T
        rays = jnp.sum(out[3, :r].astype(jnp.uint32))
        return color, rays

    def probe_run(scene: Scene, camera, pixel, s0):
        """The XLA probe-path estimator (exact-gradient reference route,
        models/path_tracer's jnp backend) — the custom VJP's backward."""
        from tpu_ray.models.path_tracer import probe_jnp as probe_fn
        light_data = (scene_light_data(scene, lights)
                      if mode == "lambert_shadow" else None)

        def sample_body(carry, s):
            color_sum, rays = carry
            o, d, _ = camera_rays(camera, width, height, pixel, s, seed)
            if mode == "flat":
                color, rc = trace_flat(scene, o, d, probe_fn)
            else:
                color, rc = trace_lambert_shadow(scene, o, d, probe_fn,
                                                 lights, light_data)
            return (color_sum + color, rays + jnp.sum(rc)), None

        init = (jnp.zeros((pixel.shape[0], 3), jnp.float32),
                jnp.zeros((), jnp.uint32))
        samples = (jnp.asarray(s0, jnp.uint32)
                   + jnp.arange(spp, dtype=jnp.uint32))
        (color_sum, rays), _ = jax.lax.scan(sample_body, init, samples)
        return color_sum, rays

    @jax.custom_vjp
    def trace(scene, camera, pixel, s0):
        return kernel_run(scene, camera, pixel, s0)

    def fwd(scene, camera, pixel, s0):
        return trace(scene, camera, pixel, s0), (scene, camera, pixel, s0)

    def bwd(res, cts):
        scene, camera, pixel, s0 = res
        _, vjp = jax.vjp(
            lambda sc, cam: probe_run(sc, cam, pixel, s0), scene, camera)
        d_scene, d_camera = vjp(cts)
        return d_scene, d_camera, None, None

    trace.defvjp(fwd, bwd)
    return trace
