"""Per-pixel jittered primary-ray generation.

Mirrors reference main.cpp:378-385: film coords in [-1,1] with a per-sample
jitter in [-0.5, 0.5] drawn from the counter-based RNG (stream slots 4/5 at
bounce 0 — see tpu_ray.core.rng).
"""
from __future__ import annotations

import jax.numpy as jnp

from tpu_ray.core.camera import Camera, film_extent
from tpu_ray.core import rng
from tpu_ray.ops.vec import normalize_eps

JITTER_SLOT_X = 4
JITTER_SLOT_Y = 5


def camera_rays(camera: Camera, width: int, height: int, pixel_idx,
                sample_idx, seed: int):
    """-> (origins [R,3], directions [R,3], stream_base [R] u32).

    pixel_idx [R] i32 flat pixel indices (row-major, y*width + x; y=0 is the
    film bottom exactly as in the reference's GL-convention framebuffer).
    """
    base = rng.ray_base(seed, pixel_idx.astype(jnp.uint32),
                        jnp.uint32(sample_idx), jnp)
    jx = rng.draw_uniform(base, 0, JITTER_SLOT_X, -0.5, 0.5, jnp)
    jy = rng.draw_uniform(base, 0, JITTER_SLOT_Y, -0.5, 0.5, jnp)

    x = (pixel_idx % width).astype(jnp.float32)
    y = (pixel_idx // width).astype(jnp.float32)
    film_x = -1.0 + ((x + jx) * 2.0) / jnp.float32(width)
    film_y = -1.0 + ((y + jy) * 2.0) / jnp.float32(height)

    film_w, film_h = film_extent(width, height)
    cam_x, cam_y, _, film_center = camera.basis()
    film_p = (
        film_center
        + (film_x * film_w * 0.5)[..., None] * cam_x
        + (film_y * film_h * 0.5)[..., None] * cam_y
    )
    origins = jnp.broadcast_to(camera.position, film_p.shape)
    directions = normalize_eps(film_p - origins)
    return origins, directions, base
