"""Counter-based RNG: numpy/jnp bit-equality, determinism, distribution."""
import jax.numpy as jnp
import numpy as np

from tpu_ray.core import rng
from tpu_ray.core.refpcg import RefPcg32


def test_pcg_hash_numpy_jnp_bit_equal():
    xs = np.arange(0, 1 << 20, 7919, dtype=np.uint32)
    h_np = rng.pcg_hash(xs, np)
    h_jnp = np.asarray(rng.pcg_hash(jnp.asarray(xs), jnp))
    np.testing.assert_array_equal(h_np, h_jnp)


def test_draws_numpy_jnp_bit_equal():
    pixel = np.arange(4096, dtype=np.uint32)
    sample = np.full(4096, 3, np.uint32)
    b_np = rng.ray_base(123, pixel, sample, np)
    b_jnp = np.asarray(rng.ray_base(123, jnp.asarray(pixel), jnp.asarray(sample), jnp))
    np.testing.assert_array_equal(b_np, b_jnp)
    for bounce in range(5):
        for slot in range(6):
            d_np = rng.draw_u32(b_np, bounce, slot, np)
            d_jnp = np.asarray(rng.draw_u32(jnp.asarray(b_jnp), bounce, slot, jnp))
            np.testing.assert_array_equal(d_np, d_jnp)


def test_uniform_range_and_distribution():
    pixel = np.arange(1 << 16, dtype=np.uint32)
    base = rng.ray_base(0, pixel, np.zeros_like(pixel), np)
    u = rng.draw_uniform(base, 1, 0, -1.0, 1.0, np)
    assert u.dtype == np.float32
    assert u.min() >= -1.0 and u.max() < 1.0
    assert abs(float(u.mean())) < 0.02
    assert abs(float(u.var()) - 1.0 / 3.0) < 0.02


def test_slots_and_bounces_decorrelated():
    pixel = np.arange(8192, dtype=np.uint32)
    base = rng.ray_base(0, pixel, np.zeros_like(pixel), np)
    a = rng.draw_uniform(base, 0, 0, 0.0, 1.0, np)
    b = rng.draw_uniform(base, 0, 1, 0.0, 1.0, np)
    c = rng.draw_uniform(base, 1, 0, 0.0, 1.0, np)
    assert abs(float(np.corrcoef(a, b)[0, 1])) < 0.05
    assert abs(float(np.corrcoef(a, c)[0, 1])) < 0.05


def test_refpcg_reproducible_and_wellformed():
    a = RefPcg32(0x29D7A0A514F22432)
    b = RefPcg32(0x29D7A0A514F22432)
    seq_a = [a.random_int() for _ in range(100)]
    seq_b = [b.random_int() for _ in range(100)]
    assert seq_a == seq_b
    assert all(0 <= v <= 0xFFFFFFFF for v in seq_a)
    c = RefPcg32(1)
    vals = np.array([float(c.random_float(0.0, 1.0)) for _ in range(2000)])
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    assert abs(vals.mean() - 0.5) < 0.05
