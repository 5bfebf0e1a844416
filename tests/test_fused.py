"""Fused bounce mega-kernel (kernels/bounce_step.py), interpret mode on CPU.

Parity vs the jnp wavefront tracer: same counter RNG (bit-identical draws via
the exact u32->f32 emulation), same shading; winners may flip on exact-t
near-ties (quadratic vs projection discriminant), so parity is statistical.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.kernels.bounce_step import trace_rays_fused
from tpu_ray.models.path_tracer import probe_jnp, render_pass, trace_rays
from tpu_ray.ops.raygen import camera_rays


@pytest.mark.parametrize("name", ["rgb", "randomized", "rtweekend"])
def test_trace_parity(name):
    scene = make_scene(name)
    cam = default_camera(scene)
    px = jnp.arange(48 * 32, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 48, 32, px, 0, 0)
    c0, r0 = trace_rays(scene, o, d, base, 5, probe_jnp)
    c1, r1 = trace_rays_fused(scene, o, d, base, 5)
    match = np.abs(np.asarray(c1) - np.asarray(c0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.98, match.mean()
    assert abs(int(np.asarray(r0).sum()) - int(np.asarray(r1).sum())) \
        <= 0.01 * int(np.asarray(r0).sum())


def test_render_pass_fused_backend():
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    kw = dict(width=48, height=32, spp=2, sample_start=0)
    i0, _ = render_pass(scene, cam, backend="jnp", **kw)
    i1, _ = render_pass(scene, cam, backend="fused", **kw)
    # tile-order permutation must round-trip exactly for matching rays
    match = np.abs(np.asarray(i1) - np.asarray(i0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()


def test_fused_rejects_triangle_scenes():
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    px = jnp.arange(64, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 8, 8, px, 0, 0)
    with pytest.raises(AssertionError):
        trace_rays_fused(scene, o, d, base, 5)


def test_unaligned_ray_count():
    scene = make_scene("rgb")
    cam = default_camera(scene)
    px = jnp.arange(333, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 37, 9, px, 0, 0)
    c0, r0 = trace_rays(scene, o, d, base, 5, probe_jnp)
    c1, r1 = trace_rays_fused(scene, o, d, base, 5)
    assert c1.shape == (333, 3)
    match = np.abs(np.asarray(c1) - np.asarray(c0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.98
