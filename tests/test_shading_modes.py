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


# ---- r5: the fused estimators on RESIDENT triangle scenes --------------

def _tri_light_scene():
    """Small mixed scene: a light + diffuse sphere AND a resident soup
    (icosphere + ground quad) — triangles must be hit, shaded, and cast
    shadows in the estimator kernels."""
    import dataclasses
    import numpy as np
    from tpu_ray.core.scene import WORLD_SCALE, SceneBuilder
    from tpu_ray.core.trimesh import icosphere, merge, pack_triangles, quad

    s = float(WORLD_SCALE)
    v, f = icosphere(1)
    g = 20.0 * s
    verts, faces, colors = merge([
        (v * (1.2 * s) + np.array([0.0, 1.2 * s, 0.0], np.float32), f,
         (0.7, 0.4, 0.3)),
        (*quad((-g, 0, -g), (-g, 0, g), (g, 0, g), (g, 0, -g)),
         (0.5, 0.5, 0.5)),
    ])
    tris = pack_triangles(verts, faces, colors)
    b = SceneBuilder()
    b.add((3.0, 6.0, 2.0), 1.0, (1.0, 1.0, 1.0), emissive=(8.0, 7.5, 7.0))
    b.add((2.2, 0.8, 0.5), 0.8, (0.3, 0.6, 0.4))
    scene = b.build(look_at=np.array([0.0, 1.2 * s, 0.0], np.float32),
                    use_sky=True,
                    default_distance=8.0 * WORLD_SCALE,
                    default_x_angle=0.6,
                    default_y_height=3.0 * WORLD_SCALE)
    return dataclasses.replace(scene, tris=tris)


def test_flat_fused_trimesh_statistical_parity():
    """Fused flat on a resident TRIANGLE scene (r5): the MT search runs
    through the K-stacked bf16 table, so rare near-edge winners can flip
    vs the jnp probe (the tri_intersect statistical contract); the rest
    matches to contraction noise."""
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    kw = dict(width=64, height=64, spp=1, sample_start=0, shading="flat")
    img_j, rays_j = render_pass(scene, cam, backend="jnp", **kw)
    img_f, rays_f = render_pass(scene, cam, backend="fused", **kw)
    assert int(rays_j) == int(rays_f)        # flat: 1 ray/sample always
    a, b = np.asarray(img_j), np.asarray(img_f)
    d = np.abs(a - b).max(axis=-1)
    assert (d > 1e-3).mean() < 0.003, (d > 1e-3).mean()
    assert np.median(d) < 1e-5
    # the soup is actually visible (non-vacuous): mesh albedo present
    assert (np.abs(a - np.array([0.8, 0.35, 0.25])).max(-1) < 0.2).any()


def test_lambert_fused_trimesh_statistical_parity():
    scene = _tri_light_scene()
    lights = scene_light_indices(scene)
    assert lights == (0,)
    cam = default_camera(scene)
    kw = dict(width=64, height=64, spp=2, sample_start=0,
              shading="lambert_shadow", lights=lights)
    img_j, rays_j = render_pass(scene, cam, backend="jnp", **kw)
    img_f, rays_f = render_pass(scene, cam, backend="fused", **kw)
    a, b = np.asarray(img_j), np.asarray(img_f)
    assert abs(int(rays_j) - int(rays_f)) <= 16
    d = np.abs(a - b).max(axis=-1)
    assert (d > 1e-3).mean() < 0.005, (d > 1e-3).mean()
    assert np.median(d) < 2e-5
    # shadows exist (some tri/sphere surface occluded from the light)
    assert d.size and a.max() > 0


def test_lambert_fused_trimesh_grad_matches_probe():
    """The fused estimator's custom VJP (probe re-run) on a triangle
    scene: vertex + material + camera gradients match the jnp route."""
    import jax

    scene = _tri_light_scene()
    lights = scene_light_indices(scene)
    cam = default_camera(scene)
    kw = dict(width=32, height=32, spp=1, sample_start=0,
              shading="lambert_shadow", lights=lights)

    def loss(scene, cam, backend):
        img, _ = render_pass(scene, cam, backend=backend, **kw)
        return jnp.sum(img ** 2) * 1e-3

    g_j = jax.grad(loss, argnums=(0, 1))(scene, cam, "jnp")
    g_f = jax.grad(loss, argnums=(0, 1))(scene, cam, "fused")
    import jax as _j
    nz = 0
    for a, b in zip(_j.tree.leaves(g_j), _j.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
        nz += float(np.abs(np.asarray(a)).sum()) > 0
    assert nz >= 4


def test_estimator_past_cliff_warns_and_falls_back(monkeypatch):
    import jax
    import warnings as _w
    from tpu_ray.kernels import bounce_step

    scene = make_scene("trimesh")
    cam = default_camera(scene)
    kw = dict(width=32, height=16, spp=1, sample_start=0, shading="flat")
    img_ref, rays_ref = render_pass(scene, cam, backend="jnp", **kw)
    monkeypatch.setattr(bounce_step, "resident_tables_fit",
                        lambda n, m: False)
    jax.clear_caches()   # render_pass cache key does not see the patch
    with pytest.warns(UserWarning, match="resident"):
        img, rays = render_pass(scene, cam, backend="fused", **kw)
    assert int(rays) == int(rays_ref)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               rtol=1e-5, atol=1e-6)
    jax.clear_caches()   # do not leak the patched executable


def test_estimator_frustum_lists_fire():
    """Non-vacuity guard for the r5 estimator tile lists: on a framed
    mesh most blocks must reach only a small fraction of tri tiles (if
    this regresses to ~all tiles the 7.5x is silently gone)."""
    import jax.numpy as jnp2
    from tpu_ray.kernels.bounce_step import (cull_mask, list_group,
                                             tri_tile_boxes, _TRI_TILE)
    from tpu_ray import make_scene

    scene = make_scene("trimesh")
    cam = default_camera(scene)
    # reproduce the wrapper's frustum-list construction at 128x64
    from tpu_ray.core.camera import film_extent
    w, h = 128, 64
    film_w, film_h = film_extent(w, h)
    pixel = np.arange(w * h, dtype=np.int32)
    block_r = 1024
    r = pixel.size
    r_pad = -(-r // block_r) * block_r
    ax = (pixel % w).astype(np.float32)
    ay = (pixel // w).astype(np.float32)
    n_blocks = r_pad // block_r
    big = 3.0e38
    axp = np.full(r_pad, big); axp[:r] = ax
    ayp = np.full(r_pad, big); ayp[:r] = ay
    axn = np.full(r_pad, -big); axn[:r] = ax
    ayn = np.full(r_pad, -big); ayn[:r] = ay
    xlo = axp.reshape(n_blocks, block_r).min(1) - 0.5
    xhi = axn.reshape(n_blocks, block_r).max(1) + 0.5
    ylo = ayp.reshape(n_blocks, block_r).min(1) - 0.5
    yhi = ayn.reshape(n_blocks, block_r).max(1) + 0.5

    def film(v, n, ext):
        return (-1.0 + v * 2.0 / n) * (ext * 0.5)

    fxl, fxh = film(xlo, w, film_w), film(xhi, w, film_w)
    fyl, fyh = film(ylo, h, film_h), film(yhi, h, film_h)
    cam_x, cam_y, _, film_center = cam.basis()
    cam_x, cam_y = np.asarray(cam_x), np.asarray(cam_y)
    pos = np.asarray(cam.position)
    base = (np.asarray(film_center) - pos)[None, :]
    xl = np.minimum(fxl[:, None] * cam_x, fxh[:, None] * cam_x)
    xh = np.maximum(fxl[:, None] * cam_x, fxh[:, None] * cam_x)
    yl = np.minimum(fyl[:, None] * cam_y, fyh[:, None] * cam_y)
    yh = np.maximum(fyl[:, None] * cam_y, fyh[:, None] * cam_y)
    dlo = jnp2.asarray(base + xl + yl)
    dhi = jnp2.asarray(base + xh + yh)
    olo = jnp2.broadcast_to(jnp2.asarray(pos)[None, :], dlo.shape)
    from tpu_ray.kernels.bounce_step import permute_spheres, morton_perm
    scene_p = permute_spheres(scene, morton_perm(scene))
    boxes = tri_tile_boxes(scene_p.tris, _TRI_TILE)
    mask = cull_mask(olo, olo, dlo, dhi, boxes[:, 0:3], boxes[:, 3:6])
    m_tiles = scene_p.tris.n_pad // _TRI_TILE
    frac = float(np.asarray(mask).sum()) / (n_blocks * m_tiles)
    assert frac < 0.7, frac     # lists must cull a real fraction
    assert np.asarray(mask).sum() > 0   # and reach the mesh at all
