"""Tone mapping and 8-bit output packing.

Reference LinearToSRGB (main.cpp:312-329) deliberately approximates the sRGB
gamma curve with sqrt ("bad but fast code"); the exact curve exists behind
`#if 0`. We expose both, default sqrt, for parity. Packing matches
ColorFromV4 (main.cpp:340-346): saturate * 255 with C float->u8 truncation.
"""
from __future__ import annotations

import jax.numpy as jnp

SRGB_CUTOFF = 0.0031308


def linear_to_srgb(linear, exact: bool = False):
    l = jnp.clip(linear, 0.0, 1.0)
    if exact:
        high = 1.055 * jnp.power(jnp.maximum(l, SRGB_CUTOFF), 1.0 / 2.4) - 0.055
    else:
        high = jnp.sqrt(jnp.maximum(l, SRGB_CUTOFF))  # max() keeps grads finite
    return jnp.where(l < SRGB_CUTOFF, l * 12.92, high)


def pack_rgba8(srgb):
    """[..., 3] f32 in [0,1] -> [..., 4] u8 (alpha=255), truncating like C."""
    rgb = (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)
