"""Per-bounce scatter/shading math.

Mirrors the reference bounce shading (reference main.cpp:446-481 SIMD path,
main.cpp:590-626 scalar path): emissive add + albedo attenuation, then either
a Lambertian-ish random bounce mixed with specular reflection, or dielectric
refract/reflect with Schlick reflectance (Reflectance, main.cpp:292-300).

All branches are computed for all rays and selected with `where` (TPU has no
per-ray branches); every untaken branch is numerically safe (no NaN/inf) so
reverse-mode autodiff stays clean.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpu_ray.ops.vec import dot, normalize_eps, reflect, safe_sqrt


def schlick_reflectance(cos_theta, refraction_index):
    """Schlick approximation (reference main.cpp:292-300)."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    r1 = 1.0 - cos_theta
    r1 = r1 * r1 * r1 * r1 * r1
    return r0 + (1.0 - r0) * r1


def sky_color(direction):
    """Vertical sky gradient (reference main.cpp:434-438)."""
    a = (direction[..., 1] + 1.0) * 0.5
    white = jnp.array([1.0, 1.0, 1.0], jnp.float32)
    blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
    return (1.0 - a)[..., None] * white + a[..., None] * blue


def scatter_direction(direction, normal_raw, inside, specular, ior,
                      rand3, rand_reflect):
    """New ray direction after a hit.

    direction [R,3] (unit), normal_raw [R,3] (unnormalized hit normal),
    inside [R] bool, specular [R], ior [R] (0 => diffuse/specular path),
    rand3 [R,3] uniform in [-1,1], rand_reflect [R] uniform in [0,1].
    """
    normal = normalize_eps(normal_raw)
    # PureBounce uses the *unflipped* normal (reference main.cpp:453 computes
    # it before the inside-sphere flip at main.cpp:456-458).
    pure = reflect(direction, normal)
    n2 = jnp.where(inside[..., None], -normal, normal)

    # --- diffuse / specular mix (reference main.cpp:460-464) ---
    rand_unit = normalize_eps(rand3)
    random_bounce = n2 + rand_unit
    spec = specular[..., None]
    d_diffuse = normalize_eps((1.0 - spec) * random_bounce + spec * pure)

    # --- dielectric (reference main.cpp:465-481) ---
    ior_safe = jnp.where(ior == 0.0, 1.0, ior)
    ri = jnp.where(inside, ior_safe, 1.0 / ior_safe)
    cos_theta = jnp.minimum(dot(-direction, n2), 1.0)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    cant_refract = ri * sin_theta > 1.0
    perp = ri[..., None] * (direction + cos_theta[..., None] * n2)
    par = -safe_sqrt(jnp.abs(1.0 - dot(perp, perp)))[..., None] * n2
    refracted = normalize_eps(perp + par)
    choose_reflect = (
        cant_refract | (schlick_reflectance(cos_theta, ri) > rand_reflect)
    ) & ~inside
    d_dielectric = jnp.where(choose_reflect[..., None], pure, refracted)

    return jnp.where((ior == 0.0)[..., None], d_diffuse, d_dielectric)
