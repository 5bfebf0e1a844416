"""Möller-Trumbore ray-triangle nearest hit + differentiable payload.

Same architecture as the sphere path (tpu_ray.ops.intersect): the O(R*M)
search returns only (t, index) with t stop-gradient'd; the differentiable
attributes are recomputed O(R) from the winning triangle, so gradients flow
to vertex positions (v0/e1/e2) and materials without traversing the search.

The test is the standard Möller-Trumbore (1997) formulation, no backface
culling (|det| > eps), written per-component so every temporary stays [R,M]
for XLA to fuse into the min/argmin reductions. Degenerate padding triangles
have e1 = e2 = 0 => det = 0 => rejected.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ray.core.scene import F32_EPS, F32_MAX
from tpu_ray.core.trimesh import Triangles
from tpu_ray.ops.intersect import Hit, Payload, gather_rows
from tpu_ray.ops.vec import dot

_DET_EPS = 1e-9


def nearest_hit_tri_jnp(tris: Triangles, origin, direction) -> Hit:
    """Brute-force nearest triangle hit. origin/direction [R,3] -> Hit([R])."""
    v0x, v0y, v0z = tris.v0[None, :, 0], tris.v0[None, :, 1], tris.v0[None, :, 2]
    e1x, e1y, e1z = tris.e1[None, :, 0], tris.e1[None, :, 1], tris.e1[None, :, 2]
    e2x, e2y, e2z = tris.e2[None, :, 0], tris.e2[None, :, 1], tris.e2[None, :, 2]
    ox, oy, oz = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    dx, dy, dz = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)

    # tvec = o - v0
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv

    valid = ((jnp.abs(det) > _DET_EPS) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > F32_EPS))
    tvals = jnp.where(valid, t, F32_MAX)
    idx = jnp.argmin(tvals, axis=1).astype(jnp.int32)
    tmin = jnp.min(tvals, axis=1)
    return Hit(t=jax.lax.stop_gradient(tmin), idx=idx)


def tri_payload_tables(tris: Triangles):
    """ONE combined [M,17] gather table (v0|e1|e2|albedo|emissive|specular|
    ior); built once per render call (same single-gather rationale as
    intersect.payload_tables)."""
    return jnp.concatenate([tris.v0, tris.e1, tris.e2, tris.albedo,
                            tris.emissive, tris.specular[:, None],
                            tris.ior[:, None]], axis=1)


def tri_payload(tris: Triangles, origin, direction, hit: Hit,
                tables=None, hit_mask=None) -> Payload:
    """Differentiable payload recompute from the winning triangle (O(R))."""
    idx = jax.lax.stop_gradient(hit.idx)
    table = tri_payload_tables(tris) if tables is None else tables
    g = gather_rows(table, idx)    # [R,17]
    v0, e1, e2 = g[:, 0:3], g[:, 3:6], g[:, 6:9]

    pvec = jnp.cross(direction, e2)
    det = dot(e1, pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)
    tvec = origin - v0
    qvec = jnp.cross(tvec, e1)
    t = dot(e2, qvec) * inv

    normal_raw = jnp.cross(e1, e2)          # geometric normal (area-scaled)
    # a ray hitting the backface (d . n > 0) is "inside" for the shading
    # model's normal flip / dielectric rules (reference main.cpp:456-458)
    inside = dot(direction, normal_raw) > 0.0
    next_origin = origin + direction * t[..., None]

    return Payload(
        hit=(hit.t < F32_MAX) if hit_mask is None else hit_mask,
        idx=idx,
        t=t,
        next_origin=next_origin,
        normal_raw=normal_raw,
        inside=inside,
        albedo=g[:, 9:12],
        emissive=g[:, 12:15],
        specular=g[:, 15],
        ior=g[:, 16],
    )


def merge_payloads(sphere_p: Payload, tri_p: Payload, n_spheres: int) -> Payload:
    """Select per-ray winner between sphere and triangle payloads.

    Triangle indices are offset by n_spheres so `idx` is a single global
    primitive id (spheres first, then triangles).
    """
    st = jnp.where(sphere_p.hit, sphere_p.t, F32_MAX)
    tt = jnp.where(tri_p.hit, tri_p.t, F32_MAX)
    # strict <: sphere wins ties (arbitrary but fixed)
    tri_wins = tt < st

    def sel(a, b):
        w = tri_wins
        if a.ndim > 1:
            w = tri_wins[..., None]
        return jnp.where(w, b, a)

    merged = Payload(*[sel(a, b) for a, b in zip(sphere_p, tri_p)])
    return merged._replace(
        hit=sphere_p.hit | tri_p.hit,
        idx=jnp.where(tri_wins, tri_p.idx + n_spheres, sphere_p.idx),
    )
