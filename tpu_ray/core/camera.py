"""Orbit camera as a differentiable pytree.

Reproduces the reference camera model (reference main.cpp:730-781, 811-822):
orbit parameters (distance-from-look-at, x-angle, y-height) -> position;
basis Z = normalize(pos - look_at), X = normalize(cross(up, Z)),
Y = normalize(cross(Z, X)); film plane centered at pos - Z with
aspect-corrected extents. Camera pose is an ordinary pytree so pixel
gradients w.r.t. pose fall out of autodiff.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.core.scene import Scene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jax.Array  # [3] f32
    look_at: jax.Array   # [3] f32

    def basis(self):
        """-> (cam_x, cam_y, cam_z, film_center). Reference main.cpp:811-814."""
        up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
        z = _normalize(self.position - self.look_at)
        x = _normalize(jnp.cross(up, z))
        y = _normalize(jnp.cross(z, x))
        film_center = self.position - z
        return x, y, z, film_center


def _normalize(v):
    # exact sqrt+divide, matching reference v3::Normalize (x64_math.h:234-245)
    return v / jnp.sqrt(jnp.sum(v * v))


def film_extent(width: int, height: int):
    """Aspect-corrected film extents (reference main.cpp:816-822)."""
    film_w = film_h = 1.0
    if width > height:
        film_h = float(height) / float(width)
    else:
        film_w = float(width) / float(height)
    return np.float32(film_w), np.float32(film_h)


def orbit_camera(look_at, distance, x_angle, y_height) -> Camera:
    """Orbit pose -> Camera (reference main.cpp:776-781)."""
    look_at = jnp.asarray(look_at, jnp.float32)
    x_angle = jnp.asarray(x_angle, jnp.float32)
    xy = jnp.stack([jnp.cos(x_angle), jnp.sin(x_angle)]) * distance
    position = jnp.stack([xy[0], jnp.asarray(y_height, jnp.float32), xy[1]])
    return Camera(position=position + look_at, look_at=look_at)


def default_camera(scene: Scene) -> Camera:
    """Scene's default orbit pose (reference main.cpp:722-725)."""
    return orbit_camera(
        scene.look_at,
        scene.default_distance,
        scene.default_x_angle,
        scene.default_y_height,
    )
