"""Scene builders: determinism, shapes, padding, reference-matching structure."""
import numpy as np

from tpu_ray.core.scene import (
    WORLD_SCALE, make_rgb_scene, make_randomized_scene, make_rtweekend_scene,
    make_scene,
)


def test_rgb_scene_exact():
    s = make_rgb_scene()
    assert s.n_real == 5
    c = np.asarray(s.center)
    np.testing.assert_allclose(c[0], np.float32([0, -258, -15]) * WORLD_SCALE)
    np.testing.assert_allclose(c[1], np.float32([0, 0, -10]) * WORLD_SCALE)
    np.testing.assert_allclose(np.asarray(s.radius)[:5],
                               np.float32([256, 2, 1.5, 1.5, 1.5]) * WORLD_SCALE)
    assert np.asarray(s.ior)[1] == np.float32(1.5)
    np.testing.assert_allclose(np.asarray(s.emissive)[2], [8, 0, 0])
    np.testing.assert_allclose(np.asarray(s.emissive)[3], [0, 8, 0])
    np.testing.assert_allclose(np.asarray(s.emissive)[4], [0, 0, 8])
    np.testing.assert_allclose(np.asarray(s.look_at), c[1])
    assert not s.use_sky


def test_padding_never_hit():
    for name in ("rgb", "randomized", "rtweekend"):
        s = make_scene(name)
        r = np.asarray(s.radius)
        assert s.n_pad % 128 == 0
        assert (r[s.n_real:] == 0).all(), name
        assert (r[:s.n_real] > 0).all(), name


def test_randomized_scene_structure():
    s = make_randomized_scene()
    assert s.n_real == 256
    c = np.asarray(s.center)
    # anchors (main.cpp:135-137), world-scaled afterwards (main.cpp:156-162)
    np.testing.assert_allclose(c[0], np.float32([1, 0, 0]) * WORLD_SCALE, atol=1e-7)
    np.testing.assert_allclose(c[1], np.float32([8, -1, 8]) * WORLD_SCALE, atol=1e-7)
    r = np.asarray(s.radius)[:3]
    assert r[0] == r[1] == r[2]  # shared radius draw (main.cpp:133)
    # deterministic across builds
    s2 = make_randomized_scene()
    np.testing.assert_array_equal(np.asarray(s.center), np.asarray(s2.center))
    np.testing.assert_array_equal(np.asarray(s.emissive), np.asarray(s2.emissive))


def test_rtweekend_scene_structure():
    s = make_rtweekend_scene()
    # reference declares 482 (main.cpp:193); overflow spheres are not rendered
    assert s.n_real == 482
    assert s.use_sky
    c, r = np.asarray(s.center), np.asarray(s.radius)
    np.testing.assert_allclose(c[0], np.float32([0, -1000, 0]) * WORLD_SCALE)
    np.testing.assert_allclose(r[0], 1000 * WORLD_SCALE)
    assert np.asarray(s.ior)[1] == np.float32(1.5)
    assert np.asarray(s.specular)[3] == np.float32(1.0)
    # grid spheres: radius 0.2*ws, placed clear of the three anchors
    grid_c, grid_r = c[4:482], r[4:482]
    np.testing.assert_allclose(grid_r, 0.2 * WORLD_SCALE, rtol=1e-6)
    for a in ([4, 0.2, 0], [0, 0.2, 0], [-4, 0.2, 0]):
        d = np.linalg.norm(grid_c / WORLD_SCALE - np.float32(a), axis=1)
        assert (d > 0.9).all()
    # deterministic
    s2 = make_rtweekend_scene()
    np.testing.assert_array_equal(c, np.asarray(s2.center))
