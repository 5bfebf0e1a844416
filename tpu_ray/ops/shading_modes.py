"""Non-path shading modes: flat and Lambertian + shadow rays.

These cover BASELINE.json configs 1 and 2 ("single-sphere + ground, flat
shading"; "16-sphere scene, Lambertian shading + shadow rays"). The
reference has only the full path tracer; these are the standard simpler
estimators sharing the same probe/payload machinery, so every backend
(jnp / pallas / sphere-sharded) gets them for free.

Lambert+shadow: for each emissive sphere (a "light"), one shadow probe from
the hit point toward the light center; the point is lit by that light iff
the nearest hit along the shadow ray IS the light sphere. Contribution =
albedo * emissive_light * max(0, n . l_hat) * visibility, plus the surface's
own emissive term.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.core.scene import Scene
from tpu_ray.ops.shade import sky_color
from tpu_ray.ops.vec import dot, normalize_eps


def scene_light_indices(scene: Scene) -> Tuple[int, ...]:
    """Host-side: indices of emissive (light) spheres, for shadow rays."""
    em = np.asarray(scene.emissive)
    return tuple(int(i) for i in np.nonzero(em.any(axis=1))[0])


def trace_flat(scene: Scene, origins, directions, probe_fn):
    """Primary-visibility shading: albedo + emissive of the first hit.

    -> (color [R,3], rays_cast [R] u32): exactly 1 ray per sample.
    """
    p = probe_fn(scene, origins, directions)
    miss = sky_color(directions) if scene.use_sky else jnp.zeros_like(origins)
    color = jnp.where(p.hit[..., None], p.albedo + p.emissive, miss)
    return color, jnp.ones(origins.shape[:1], jnp.uint32)


def scene_light_data(scene: Scene, lights: Tuple[int, ...]):
    """(light_centers [L,3], light_emissives [L,3]) from the GLOBAL scene.

    Must be computed before any sphere-axis sharding: inside a sphere shard
    the light's row may live on another device, so light data rides into the
    shard as an explicitly replicated argument.
    """
    idx = jnp.asarray(list(lights), jnp.int32).reshape(-1)
    return scene.center[idx], scene.emissive[idx]


def trace_lambert_shadow(scene: Scene, origins, directions, probe_fn,
                         lights: Tuple[int, ...], light_data=None):
    """Lambertian direct lighting with one shadow ray per light.

    -> (color [R,3], rays_cast [R] u32): 1 primary + len(lights) shadow rays
    per sample that hits a surface (misses cast only the primary).
    `light_data` is (centers [L,3], emissives [L,3]) from scene_light_data;
    None (single-chip) derives it from `scene` directly.
    """
    if light_data is None:
        light_data = scene_light_data(scene, lights)
    light_centers, light_emissives = light_data

    p = probe_fn(scene, origins, directions)
    hit = p.hit
    n = normalize_eps(p.normal_raw)
    n = jnp.where(p.inside[..., None], -n, n)

    color = p.emissive
    rays = jnp.ones(origins.shape[:1], jnp.uint32)
    for k, li in enumerate(lights):
        to_light = light_centers[k][None, :] - p.next_origin
        ldir = normalize_eps(to_light)
        sp = probe_fn(scene, p.next_origin, ldir)
        visible = sp.hit & (sp.idx == li)
        lam = jnp.maximum(dot(n, ldir), 0.0)
        contrib = p.albedo * light_emissives[k][None, :] * lam[..., None]
        color = color + jnp.where((visible & hit)[..., None], contrib, 0.0)
        rays = rays + hit.astype(jnp.uint32)

    miss = sky_color(directions) if scene.use_sky else jnp.zeros_like(origins)
    color = jnp.where(hit[..., None], color, miss)
    return color, rays
