"""Pallas kernel parity vs the jnp backend (interpret mode on CPU).

The jnp/pallas pair is this framework's EnableSIMD A/B oracle (reference
main.cpp:853): same search, two implementations. The Pallas kernel uses the
quadratic-form discriminant (see kernels/sphere_intersect.py docstring) so t
agrees to float roundoff and near-tie winners may rarely flip — exact on the
well-separated test rays below, statistical on full frames.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.kernels.sphere_intersect import nearest_hit_pallas
from tpu_ray.models.path_tracer import render_pass
from tpu_ray.ops.intersect import nearest_hit_jnp
from tpu_ray.ops.raygen import camera_rays


@pytest.mark.parametrize("name", ["rgb", "randomized", "rtweekend"])
def test_nearest_hit_matches_jnp(name):
    scene = make_scene(name)
    cam = default_camera(scene)
    pixel = jnp.arange(48 * 32, dtype=jnp.int32)
    o, d, _ = camera_rays(cam, 48, 32, pixel, 0, 0)
    h_jnp = nearest_hit_jnp(scene.center, scene.radius, o, d)
    h_pal = nearest_hit_pallas(scene.center, scene.radius, o, d)

    i0, i1 = np.asarray(h_jnp.idx), np.asarray(h_pal.idx)
    t0, t1 = np.asarray(h_jnp.t), np.asarray(h_pal.t)
    assert (i0 == i1).mean() > 0.995, (i0 != i1).sum()
    hit = (t0 < 1e29) & (i0 == i1)
    assert ((t0 < 1e29) == (t1 < 1e29)).all()
    np.testing.assert_allclose(t1[hit], t0[hit], rtol=1e-4, atol=1e-5)


def test_unaligned_ray_count_padding():
    scene = make_scene("rgb")
    cam = default_camera(scene)
    pixel = jnp.arange(777, dtype=jnp.int32)  # not a block multiple
    o, d, _ = camera_rays(cam, 37, 21, pixel, 0, 0)
    h_jnp = nearest_hit_jnp(scene.center, scene.radius, o, d)
    h_pal = nearest_hit_pallas(scene.center, scene.radius, o, d)
    assert h_pal.t.shape == (777,)
    assert (np.asarray(h_jnp.idx) == np.asarray(h_pal.idx)).mean() > 0.99


def test_full_render_backend_parity():
    scene = make_scene("rgb")
    cam = default_camera(scene)
    kw = dict(width=32, height=32, spp=1, sample_start=0)
    img_j, rays_j = render_pass(scene, cam, backend="jnp", **kw)
    img_p, rays_p = render_pass(scene, cam, backend="pallas", **kw)
    # identical winners on this scene => identical bounce paths and image
    assert abs(int(rays_j) - int(rays_p)) <= 0.01 * int(rays_j)
    diff = np.abs(np.asarray(img_j) - np.asarray(img_p)).max(axis=-1)
    assert (diff < 1e-5).mean() > 0.99
