"""Ray-sphere intersection: nearest-hit selection + differentiable payload.

Architecture (SURVEY.md §7): the O(R*N) brute-force search returns ONLY the
integer nearest-hit index per ray (plus a non-differentiable t for miss
detection) — the discrete selection is wrapped in stop_gradient. The
differentiable quantities (t, hit point, normal, inside flag) are then
*recomputed* per ray from the gathered winning sphere in `hit_payload`, an
O(R) step. Gradients therefore never traverse the [R, N] search, which is
exactly the "recompute instead of save" backward design the 1080p/64spp
memory budget demands, and it means the Pallas search kernel needs no custom
VJP at all.

The geometric test mirrors the reference SIMD kernel (reference
main.cpp:401-429): project the center onto the ray, compare squared distance
to radius^2, near root T-X, far root T+X when the near root is behind the
origin (inside-sphere rule, main.cpp:415-417), and reject t <= 1e-4.
Padding spheres have radius 0 and can never pass `dsq < r^2`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.core.scene import F32_EPS, F32_MAX, Scene
from tpu_ray.ops.vec import dot, safe_sqrt


class Hit(NamedTuple):
    t: jax.Array    # [R] f32, F32_MAX on miss (non-differentiable)
    idx: jax.Array  # [R] i32, winning sphere index (0 when miss; check t)


def nearest_hit_jnp(center, radius, origin, direction) -> Hit:
    """Brute-force nearest-hit over all spheres. jnp backend (the
    correctness anchor — the `EnableSIMD=off` analogue, reference main.cpp:853).

    center [N,3], radius [N], origin [R,3], direction [R,3] -> Hit([R]).
    """
    # Per-component broadcasting keeps every temporary at [R, N] so XLA can
    # fuse the whole test into the min/argmin reductions.
    cx, cy, cz = (center[None, :, 0], center[None, :, 1], center[None, :, 2])
    ox, oy, oz = (origin[:, 0:1], origin[:, 1:2], origin[:, 2:3])
    dx, dy, dz = (direction[:, 0:1], direction[:, 1:2], direction[:, 2:3])

    mx, my, mz = cx - ox, cy - oy, cz - oz          # center relative to origin
    t_proj = mx * dx + my * dy + mz * dz            # projection onto ray
    px, py, pz = mx - dx * t_proj, my - dy * t_proj, mz - dz * t_proj
    dsq = px * px + py * py + pz * pz
    r2 = (radius * radius)[None, :]
    hit = dsq < r2                                   # radius-0 padding never hits
    x = safe_sqrt(r2 - dsq)
    t_near = t_proj - x
    t = jnp.where(t_near < F32_EPS, t_proj + x, t_near)
    valid = hit & (t > F32_EPS)
    tvals = jnp.where(valid, t, F32_MAX)
    idx = jnp.argmin(tvals, axis=1).astype(jnp.int32)
    tmin = jnp.min(tvals, axis=1)
    return Hit(t=jax.lax.stop_gradient(tmin), idx=idx)


@jax.custom_vjp
def gather_rows(table, idx):
    """table[idx] with a matmul-transpose VJP.

    XLA lowers the transpose of a gather to scatter-add, which is serialized
    and catastrophically slow on TPU (profiled at ~80% of the whole
    forward+backward step). The cotangent w.r.t. the table is instead
    computed as one_hot(idx)^T @ g on the MXU — the one-hot is fused into
    the matmul operand so the [R,N] matrix never materializes.
    """
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(res, g):
    idx, n = res
    onehot = (idx[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (idx.shape[0], n), 1)).astype(g.dtype)
    dtable = jax.lax.dot_general(
        onehot, g, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return dtable, np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


class Payload(NamedTuple):
    hit: jax.Array          # [R] bool, False = miss
    idx: jax.Array          # [R] i32 winning sphere index (non-diff)
    t: jax.Array            # [R] f32 recomputed (differentiable)
    next_origin: jax.Array  # [R,3]
    normal_raw: jax.Array   # [R,3] unnormalized (hit point - center)
    inside: jax.Array       # [R] bool, ray started inside the sphere
    albedo: jax.Array       # [R,3]
    emissive: jax.Array     # [R,3]
    specular: jax.Array     # [R]
    ior: jax.Array          # [R]


def payload_tables(scene: Scene):
    """ONE combined [N,12] gather table (center|radius|albedo|emissive|
    specular|ior); built ONCE per render call (outside the bounce/sample
    scans). A single combined gather halves both the forward gather fusions
    and their matmul transposes vs separate geometry/material tables
    (profiled at 1080p: the pair of gathers was ~20% of the whole
    fwd+bwd step)."""
    return jnp.concatenate([scene.center, scene.radius[:, None],
                            scene.albedo, scene.emissive,
                            scene.specular[:, None], scene.ior[:, None]],
                           axis=1)


def hit_payload(scene: Scene, origin, direction, hit: Hit,
                tables=None, hit_mask=None) -> Payload:
    """Recompute differentiable hit attributes from the winning sphere.

    O(R) gathers + arithmetic; this is the ONLY path gradients flow through
    w.r.t. scene geometry. Mirrors reference main.cpp:413-429 (t roots,
    inside flag) and main.cpp:443-455 (payload extraction).

    Perf note: TPU gathers are row-granular and expensive, so the 8 scene
    fields are packed into ONE combined [N,12] gather table
    (payload_tables) instead of 8 per-field gathers — measured 2.8x on the
    whole render step going to two tables, then another ~1.2x folding those
    into one (BASELINE.md optimization (e)). The concatenate is O(N),
    loop-invariant, and hoisted out of the bounce/sample scans by XLA;
    gradients flow through the concat transpose (slice) unchanged.
    """
    idx = jax.lax.stop_gradient(hit.idx)
    table = payload_tables(scene) if tables is None else tables
    g = gather_rows(table, idx)    # [R,12]
    c = g[:, 0:3]                  # [R,3]
    r = g[:, 3]                    # [R]

    m = c - origin
    t_proj = dot(m, direction)
    p = m - direction * t_proj[..., None]
    dsq = dot(p, p)
    x = safe_sqrt(r * r - dsq)
    t_near = t_proj - x
    inside = t_near < F32_EPS
    t = jnp.where(inside, t_proj + x, t_near)

    point = direction * t[..., None]       # hit point relative to origin
    next_origin = origin + point
    normal_raw = point - m                 # = hit point - center

    return Payload(
        hit=(hit.t < F32_MAX) if hit_mask is None else hit_mask,
        idx=idx,
        t=t,
        next_origin=next_origin,
        normal_raw=normal_raw,
        inside=inside,
        albedo=g[:, 4:7],
        emissive=g[:, 7:10],
        specular=g[:, 10],
        ior=g[:, 11],
    )
