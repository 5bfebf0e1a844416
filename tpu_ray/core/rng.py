"""Counter-based per-ray RNG — the shardable replacement for the reference's
per-thread sequential PCG (reference main.cpp:350, 667-678).

The reference's RNG stream depends on thread scheduling order, which is
unreproducible under resharding (SURVEY.md §7 "RNG parity"). We instead derive
every random draw as a pure function of
(seed, pixel_index, sample_index, bounce, slot), using the single-u32 PCG
output permutation (same family as reference base.h:916-921) applied as a
stateless hash. This makes every draw order-independent: the CPU oracle, the
jnp backend, the Pallas kernels, and any sharding of the ray axis all see
bit-identical uint32 draws.

All functions are written against a module handle `xp` (numpy or jax.numpy)
so the oracle and the TPU path share one definition.

Draw-slot convention per ray (bounce field, slot field):
  bounce 0, slot 4,5    : pixel jitter x, y (primary ray only)
  bounce b, slot 0,1,2  : diffuse scatter direction x, y, z
  bounce b, slot 3      : dielectric reflectance test
"""
from __future__ import annotations

import numpy as np

_U32 = np.uint32

# Large odd constants for counter mixing (Weyl / Murmur-style).
_MIX_PIXEL = 0x9E3779B1
_MIX_SAMPLE = 0x85EBCA6B
_MIX_BOUNCE = 0x632BE59B
_MIX_SLOT = 0xC2B2AE35


def pcg_hash(x, xp):
    """One-round PCG output permutation as a stateless u32->u32 hash.

    state = x * 747796405 + 2891336453
    word  = ((state >> ((state >> 28) + 4)) ^ state) * 277803737
    out   = (word >> 22) ^ word
    (permutation family of reference base.h:916-921)
    """
    x = x.astype(_U32) if hasattr(x, "astype") else _U32(x)
    with np.errstate(over="ignore"):  # u32 wraparound is the point
        state = x * _U32(747796405) + _U32(2891336453)
        shift = (state >> _U32(28)) + _U32(4)
        word = ((state >> shift) ^ state) * _U32(277803737)
        return (word >> _U32(22)) ^ word


def ray_base(seed, pixel, sample, xp):
    """Per-(pixel, sample) stream base; hoisted out of the bounce loop.

    `pixel` and `sample` must be array values (jnp arrays/tracers, or numpy
    0-d arrays in the oracle); `seed` is a Python int.
    """
    with np.errstate(over="ignore"):
        h = pcg_hash(pixel.astype(_U32) * _U32(_MIX_PIXEL)
                     ^ _U32(int(seed) & 0xFFFFFFFF), xp)
        return pcg_hash(h + sample.astype(_U32) * _U32(_MIX_SAMPLE), xp)


def draw_u32(base, bounce, slot, xp):
    """One u32 draw for (stream base, bounce, slot).

    `slot` is always a Python int; `bounce` may be a Python int (oracle) or a
    traced/array value (jnp). Scalar mixing products are reduced mod 2^32 in
    Python to keep NumPy's scalar-overflow warnings out of the oracle.
    """
    slot_term = _U32((int(slot) * _MIX_SLOT) & 0xFFFFFFFF)
    if isinstance(bounce, (int, np.integer)):
        bounce_term = _U32((int(bounce) * _MIX_BOUNCE) & 0xFFFFFFFF)
    else:
        bounce_term = bounce.astype(_U32) * _U32(_MIX_BOUNCE)
    with np.errstate(over="ignore"):
        return pcg_hash(base + bounce_term + slot_term, xp)


_INV_2_32 = np.float32(1.0 / 4294967296.0)


def u32_to_uniform(u, lo, hi, xp):
    """u32 -> f32 uniform in [lo, hi): f32(u) * ((hi-lo)/2^32) + lo."""
    scale = np.float32(hi - lo) * _INV_2_32
    return u.astype(np.float32) * scale + np.float32(lo)


def draw_uniform(base, bounce, slot, lo, hi, xp):
    return u32_to_uniform(draw_u32(base, bounce, slot, xp), lo, hi, xp)
