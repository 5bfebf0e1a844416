"""Flat + Lambert/shadow shading modes (BASELINE.json configs 1-2)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.models.path_tracer import render_pass
from tpu_ray.ops.shading_modes import scene_light_indices
from tpu_ray.parallel import make_mesh, render_pass_sharded, shard_scene


def test_flat_single_scene():
    scene = make_scene("single")
    cam = default_camera(scene)
    img, rays = render_pass(scene, cam, width=64, height=64, spp=1,
                            sample_start=0, shading="flat")
    img = np.asarray(img)
    # flat = exactly one ray per pixel sample
    assert int(rays) == 64 * 64
    # center of frame looks at the red sphere -> its albedo
    np.testing.assert_allclose(img[32, 32], [0.8, 0.3, 0.3], atol=1e-6)
    # top rows are sky (gradient between white and blue)
    assert img[63, 0, 2] >= img[63, 0, 0]  # blue-ish


def test_lambert_shadow_sixteen_scene():
    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    assert lights == (1, 2)
    cam = default_camera(scene)
    img, rays = render_pass(scene, cam, width=64, height=64, spp=1,
                            sample_start=0, shading="lambert_shadow",
                            lights=lights)
    img = np.asarray(img)
    n = 64 * 64
    # 1 primary per pixel + one shadow ray per light per hit
    assert n < int(rays) <= n * (1 + len(lights))
    assert np.isfinite(img).all() and (img >= 0).all()
    # lighting is not flat: lit and shadowed pixels differ
    assert img.max() > 10 * max(img.min(), 1e-6)


def test_lambert_shadow_sharded_parity():
    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    cam = default_camera(scene)
    kw = dict(width=32, height=16, spp=1, sample_start=0,
              shading="lambert_shadow", lights=lights)
    img0, rays0 = render_pass(scene, cam, **kw)
    mesh = make_mesh((4, 2))
    img, rays = render_pass_sharded(shard_scene(scene, mesh), cam,
                                    mesh=mesh, **kw)
    assert int(rays) == int(rays0)
    # allclose (not bit-equal): XLA fuses FMAs differently for the narrower
    # per-shard sphere slices, a 1-ulp effect
    np.testing.assert_allclose(np.asarray(img), np.asarray(img0),
                               rtol=1e-5, atol=1e-6)


def test_flat_matches_probe_backends():
    scene = make_scene("single")
    cam = default_camera(scene)
    kw = dict(width=32, height=32, spp=1, sample_start=0, shading="flat")
    img_j, _ = render_pass(scene, cam, backend="jnp", **kw)
    img_p, _ = render_pass(scene, cam, backend="pallas", **kw)
    diff = np.abs(np.asarray(img_j) - np.asarray(img_p))
    assert (diff < 1e-6).mean() > 0.999


# ---- r4 fused estimator mega-kernel (kernels/simple_shade.py) ----------

def test_flat_fused_matches_jnp():
    """Flat has no payload-derived arithmetic beyond the gather, so the
    fused kernel matches jnp to float noise (measured exact on CPU)."""
    scene = make_scene("single")
    cam = default_camera(scene)
    kw = dict(width=64, height=64, spp=2, sample_start=0, shading="flat")
    img_j, rays_j = render_pass(scene, cam, backend="jnp", **kw)
    img_f, rays_f = render_pass(scene, cam, backend="fused", **kw)
    assert int(rays_j) == int(rays_f)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_j),
                               rtol=1e-5, atol=1e-5)


def test_lambert_fused_statistical_parity():
    """The fused lambert kernel's statistical-parity contract vs jnp
    (kernels/simple_shade.py docstring): the fused search evaluates the
    quadratic through a different f32 op sequence, so rare borderline
    winners flip (large per-pixel diff), and cross-program FP contraction
    adds ~1e-5-scale noise everywhere. Gate both classes."""
    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    cam = default_camera(scene)
    kw = dict(width=128, height=128, spp=2, sample_start=0,
              shading="lambert_shadow", lights=lights)
    img_j, rays_j = render_pass(scene, cam, backend="jnp", **kw)
    img_f, rays_f = render_pass(scene, cam, backend="fused", **kw)
    a, b = np.asarray(img_j), np.asarray(img_f)
    # rays: winner flips can move a shadow-ray count by O(1)
    assert abs(int(rays_j) - int(rays_f)) <= 16
    d = np.abs(a - b).max(axis=-1)
    # winner-flip class: isolated pixels
    assert (d > 1e-3).mean() < 0.003, (d > 1e-3).mean()
    # contraction-noise class: everywhere, but tiny
    assert np.median(d) < 1e-5


def test_lambert_fused_grad_matches_probe():
    """The fused estimator's custom VJP re-runs the probe path; its
    gradients must match differentiating the jnp route (up to the same
    near-tie forward divergence)."""
    import jax

    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    cam = default_camera(scene)
    kw = dict(width=32, height=32, spp=1, sample_start=0,
              shading="lambert_shadow", lights=lights)

    def loss(scene, cam, backend):
        img, _ = render_pass(scene, cam, backend=backend, **kw)
        return jnp.sum(img ** 2) * 1e-3

    g_j = jax.grad(loss, argnums=(0, 1))(scene, cam, "jnp")
    g_f = jax.grad(loss, argnums=(0, 1))(scene, cam, "fused")
    for a, b in zip(jax.tree.leaves(g_j), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)


def test_flat_fused_chunked_matches_unchunked():
    scene = make_scene("single")
    cam = default_camera(scene)
    kw = dict(width=64, height=64, spp=1, sample_start=0, shading="flat",
              backend="fused")
    img0, rays0 = render_pass(scene, cam, **kw)
    img1, rays1 = render_pass(scene, cam, ray_chunk=1024, **kw)
    assert int(rays0) == int(rays1)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(img1),
                               rtol=1e-6, atol=1e-6)


def test_lambert_fused_sharded_parity():
    """The fused estimator under shard_map (1D ray mesh, scene
    replicated) matches single-device."""
    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    cam = default_camera(scene)
    kw = dict(width=64, height=32, spp=1, sample_start=0,
              shading="lambert_shadow", lights=lights, backend="fused")
    img0, rays0 = render_pass(scene, cam, **kw)
    mesh = make_mesh((8,))
    img, rays = render_pass_sharded(shard_scene(scene, mesh), cam,
                                    mesh=mesh, **kw)
    assert int(rays) == int(rays0)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img0),
                               rtol=1e-5, atol=1e-6)


def test_lambert_fused_chunked_grad():
    """Gradients through the chunked fused-estimator route (lax.map over
    the custom-VJP trace) stay finite and match the unchunked route."""
    import jax

    scene = make_scene("sixteen")
    lights = scene_light_indices(scene)
    cam = default_camera(scene)

    def loss(scene, cam, chunk):
        img, _ = render_pass(scene, cam, width=64, height=32, spp=1,
                             sample_start=0, shading="lambert_shadow",
                             lights=lights, backend="fused",
                             ray_chunk=chunk)
        return jnp.sum(img ** 2) * 1e-3

    g0 = jax.grad(loss, argnums=(0, 1))(scene, cam, None)
    g1 = jax.grad(loss, argnums=(0, 1))(scene, cam, 1024)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
