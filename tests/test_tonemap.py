"""Tone map + packing semantics (reference main.cpp:312-346)."""
import numpy as np

from tpu_ray.ops.tonemap import linear_to_srgb, pack_rgba8


def test_srgb_sqrt_approximation():
    x = np.float32([0.0, 0.001, 0.0031307, 0.0031309, 0.25, 1.0, 2.0, -1.0])
    y = np.asarray(linear_to_srgb(x))
    # linear segment below cutoff
    np.testing.assert_allclose(y[1], 0.001 * 12.92, rtol=1e-6)
    # sqrt segment above cutoff ("bad but fast", main.cpp:324)
    np.testing.assert_allclose(y[4], 0.5, rtol=1e-6)
    np.testing.assert_allclose(y[5], 1.0, rtol=1e-6)
    # saturate clamps out-of-range inputs first (main.cpp:315)
    assert y[6] == 1.0 and y[7] == 0.0


def test_srgb_exact_curve():
    x = np.float32([0.25])
    y = np.asarray(linear_to_srgb(x, exact=True))
    np.testing.assert_allclose(y[0], 1.055 * 0.25 ** (1 / 2.4) - 0.055, rtol=1e-5)


def test_pack_rgba8_truncates_like_c():
    srgb = np.float32([[0.0, 0.5, 1.0]])
    out = np.asarray(pack_rgba8(srgb))
    assert out.dtype == np.uint8
    assert out.shape == (1, 4)
    assert list(out[0]) == [0, 127, 255, 255]  # 0.5*255=127.5 -> truncates to 127
