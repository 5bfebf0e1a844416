"""Möller-Trumbore triangle path: analytic hits, payload grads, mixed scenes."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.core.trimesh import icosphere, pack_triangles
from tpu_ray.models.path_tracer import render_pass
from tpu_ray.ops.intersect_tri import (nearest_hit_tri_jnp, tri_payload)


def _single_tri():
    # unit right triangle in the z = -2 plane
    verts = np.array([[0, 0, -2], [1, 0, -2], [0, 1, -2]], np.float32)
    faces = np.array([[0, 1, 2]])
    return pack_triangles(verts, faces, (0.5, 0.5, 0.5))


def test_analytic_hit_and_miss():
    tris = _single_tri()
    o = jnp.asarray(np.array([[0.25, 0.25, 0.0], [0.9, 0.9, 0.0],
                              [0.25, 0.25, 0.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1], [0, 0, -1], [0, 0, 1]], np.float32))
    hit = nearest_hit_tri_jnp(tris, o, d)
    t = np.asarray(hit.t)
    assert t[0] == pytest.approx(2.0, abs=1e-6)   # inside -> t = 2
    assert t[1] > 1e29                            # outside barycentric
    assert t[2] > 1e29                            # pointing away


def test_backface_hit_is_inside():
    tris = _single_tri()
    o = jnp.asarray(np.array([[0.25, 0.25, -4.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    hit = nearest_hit_tri_jnp(tris, o, d)
    p = tri_payload(tris, o, d, hit)
    assert bool(p.hit[0]) and bool(p.inside[0])
    assert float(p.t[0]) == pytest.approx(2.0, abs=1e-6)


def test_vertex_gradient_matches_finite_difference():
    tris = _single_tri()
    o = jnp.asarray(np.array([[0.25, 0.25, 0.0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, -1]], np.float32))

    def t_of(v0z):
        t2 = dataclasses.replace(tris, v0=tris.v0.at[0, 2].set(v0z))
        hit = nearest_hit_tri_jnp(t2, o, d)
        return tri_payload(t2, o, d, hit).t[0]

    g = jax.grad(t_of)(jnp.float32(-2.0))
    eps = 1e-3
    fd = (t_of(jnp.float32(-2.0 + eps)) - t_of(jnp.float32(-2.0 - eps))) / (2 * eps)
    # moving the whole plane back moves t 1:1
    assert float(g) == pytest.approx(float(fd), rel=1e-2)
    assert float(g) == pytest.approx(-1.0, abs=1e-3)


def test_trimesh_scene_renders_and_mixes_primitives():
    scene = make_scene("trimesh")
    assert scene.tris.n_real == 10242
    cam = default_camera(scene)
    img, rays = render_pass(scene, cam, width=48, height=32, spp=1,
                            sample_start=0, ray_chunk=None)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # sky + mesh both visible: some pure-sky pixels, some shaded mesh pixels
    assert img.max() > 0.1
    assert int(rays) > 48 * 32  # bounces happened (sphere or mesh hits)


def test_icosphere_counts():
    v, f = icosphere(2)
    assert len(f) == 20 * 4 ** 2
    # all vertices on the unit sphere
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)


# --- Pallas Möller-Trumbore (kernels/tri_intersect.py) -------------------

def test_tri_pallas_matches_jnp_search():
    import jax
    from tpu_ray.kernels.tri_intersect import nearest_hit_tri_pallas
    from tpu_ray.ops.intersect_tri import nearest_hit_tri_jnp
    from tpu_ray.ops.raygen import camera_rays
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    px = jnp.arange(48 * 32, dtype=jnp.int32)
    o, d, _ = camera_rays(cam, 48, 32, px, 0, 0)
    h0 = nearest_hit_tri_jnp(scene.tris, o, d)
    for exact in (False, True):
        h1 = nearest_hit_tri_pallas(scene.tris, o, d, exact=exact)
        same_idx = np.asarray(h0.idx) == np.asarray(h1.idx)
        # MXU-bilinear barycentrics can flip near-edge winners (module
        # docstring); hit/miss and winners must agree on ~all rays
        assert same_idx.mean() > 0.995, (exact, same_idx.mean())
        hit0 = np.asarray(h0.t) < 1e29
        hit1 = np.asarray(h1.t) < 1e29
        assert (hit0 == hit1).mean() > 0.995
        both = same_idx & hit0 & hit1
        np.testing.assert_allclose(np.asarray(h1.t)[both],
                                   np.asarray(h0.t)[both],
                                   rtol=2e-3, atol=2e-4)


def test_tri_pallas_render_parity():
    from tpu_ray.models.path_tracer import render_pass
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    kw = dict(width=48, height=32, spp=1, sample_start=0)
    i0, r0 = render_pass(scene, cam, backend="jnp", **kw)
    i1, r1 = render_pass(scene, cam, backend="pallas", **kw)
    match = np.abs(np.asarray(i1) - np.asarray(i0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert float(np.abs(np.asarray(i1) - np.asarray(i0)).mean()) < 2e-3


def test_tri_pallas_large_mesh_exact_path():
    # m_pad > _PACK_MAX_M exercises the exact two-reduction carry tiles
    import jax
    from tpu_ray.core.trimesh import icosphere, pack_triangles
    from tpu_ray.kernels.tri_intersect import nearest_hit_tri_pallas
    from tpu_ray.ops.intersect_tri import nearest_hit_tri_jnp
    verts, faces = icosphere(subdivisions=4)   # 5120 tris
    tris = pack_triangles(verts, faces, (0.5, 0.5, 0.5))
    o = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (256, 3)),
                    jnp.float32)
    d = o * 0.0
    d = d.at[:, 2].set(1.0)
    h0 = nearest_hit_tri_jnp(tris, o, d)
    h1 = nearest_hit_tri_pallas(tris, o, d)
    assert (np.asarray(h0.idx) == np.asarray(h1.idx)).mean() > 0.98
