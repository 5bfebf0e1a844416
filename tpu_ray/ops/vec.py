"""Small vector helpers over trailing dim-3 axes (grad-safe).

These replace the reference's v3 scalar-vector class (reference base.h:341-410,
x64_math.h:180-264). The epsilon-zeroing rule of v3::Normalize
(x64_math.h:234-245: result is 0 when |v|^2 <= 1e-4) is preserved because the
render math relies on it, and every sqrt/rsqrt is guarded so reverse-mode
autodiff never sees sqrt(0) or 0/0 on untaken `where` branches.
"""
from __future__ import annotations

import jax.numpy as jnp

from tpu_ray.core.scene import F32_EPS


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def safe_sqrt(x):
    """sqrt with zero (not NaN/inf) value & gradient for x <= 0."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def normalize_eps(v):
    """Reference v3::Normalize: v/|v|, but 0 when |v|^2 <= F32Epsilon."""
    lsq = dot(v, v)[..., None]
    ok = lsq > F32_EPS
    inv = 1.0 / jnp.sqrt(jnp.where(ok, lsq, 1.0))
    return jnp.where(ok, v * inv, 0.0)


def reflect(d, n):
    """Mirror reflection (reference main.cpp:453)."""
    return d - 2.0 * dot(d, n)[..., None] * n
