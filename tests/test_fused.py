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


def test_trace_parity_mean_error_bounded():
    # VERDICT r1 weak-4: bound the MAGNITUDE of error on mismatching pixels,
    # not just the match fraction — a tie-flip may change a pixel's path but
    # the image-mean |delta| must stay small for both argmin modes.
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    px = jnp.arange(64 * 48, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 64, 48, px, 0, 0)
    c0, _ = trace_rays(scene, o, d, base, 5, probe_jnp)
    for exact in (False, True):
        c1, _ = trace_rays_fused(scene, o, d, base, 5, exact_argmin=exact)
        mean_abs = float(np.abs(np.asarray(c1) - np.asarray(c0)).mean())
        assert mean_abs < 2e-3, (exact, mean_abs)


def test_exact_argmin_matches_packed_on_winners():
    # exact mode is the certification knob: where packed and exact agree on
    # the winner the radiance must agree bitwise; disagreements are near-ties
    scene = make_scene("randomized")
    cam = default_camera(scene)
    px = jnp.arange(32 * 32, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 32, 32, px, 0, 0)
    cp, _ = trace_rays_fused(scene, o, d, base, 5, exact_argmin=False)
    ce, _ = trace_rays_fused(scene, o, d, base, 5, exact_argmin=True)
    same = np.all(np.asarray(cp) == np.asarray(ce), axis=-1)
    assert same.mean() > 0.995, same.mean()


def test_fused_grads_match_jnp():
    # the round-2 deliverable: the custom-VJP fused path (forward Pallas +
    # saved-hit replay backward, SURVEY.md §7 step 4) produces the same
    # scene/camera gradients as the jnp backend
    import jax
    from tpu_ray.grad import image_mse, render_mean
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    W = H = 16
    target = jnp.zeros((H, W, 3), jnp.float32)

    def grads(backend):
        def f(s, c):
            return image_mse(
                render_mean(s, c, width=W, height=H, spp=2, backend=backend),
                target)
        return jax.jit(jax.grad(f, argnums=(0, 1)))(scene, cam)

    g0 = grads("jnp")
    g1 = grads("fused")
    la, lb = jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)
    for a, b in zip(la, lb):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=1e-7 + 1e-4 * max(1e-30, np.abs(b).max()))
    assert float(np.linalg.norm(np.asarray(g1[0].center))) > 0


def test_fused_grads_sharded_match_single():
    import jax
    from tpu_ray.grad import image_mse, render_mean, render_mean_sharded
    from tpu_ray.parallel import make_mesh, shard_scene
    scene = make_scene("rgb")
    cam = default_camera(scene)
    W = H = 16
    target = jnp.zeros((H, W, 3), jnp.float32)

    def f_single(s, c):
        return image_mse(
            render_mean(s, c, width=W, height=H, spp=1, backend="fused"),
            target)

    g0 = jax.jit(jax.grad(f_single, argnums=(0, 1)))(scene, cam)

    mesh = make_mesh((8,))
    s = shard_scene(scene, mesh)

    def f_sh(s_, c):
        return image_mse(
            render_mean_sharded(s_, c, mesh=mesh, width=W, height=H, spp=1,
                                backend="fused"), target)

    g1 = jax.jit(jax.grad(f_sh, argnums=(0, 1)))(s, cam)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-7 + 1e-5 * max(1e-30, np.abs(b).max()))
