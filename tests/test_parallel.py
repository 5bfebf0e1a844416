"""Sharding parity: the multi-chip analogue of the reference's EnableSIMD A/B
oracle (reference main.cpp:853) — the sharded render must be bit-identical to
the single-device render, on both the 1D ray mesh and the 2D rays x spheres
mesh (run on the virtual 8-device CPU platform, see conftest.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.models.path_tracer import render_pass
from tpu_ray.parallel import make_mesh, render_pass_sharded, shard_scene

W = H = 32
KW = dict(width=W, height=H, spp=1, sample_start=0, seed=0)


@pytest.fixture(scope="module")
def single():
    scene = make_scene("rgb")
    cam = default_camera(scene)
    img, rays = render_pass(scene, cam, **KW)
    return scene, cam, np.asarray(img), int(rays)


@pytest.mark.parametrize("mesh_shape", [(8,), (4, 2), (2, 4), (1, 8)])
def test_sharded_render_bitexact(single, mesh_shape):
    scene, cam, img0, rays0 = single
    mesh = make_mesh(mesh_shape)
    s = shard_scene(scene, mesh)
    img, rays = render_pass_sharded(s, cam, mesh=mesh, **KW)
    assert int(rays) == rays0
    np.testing.assert_array_equal(np.asarray(img), img0)


def test_sharded_output_sharding(single):
    scene, cam, _, _ = single
    mesh = make_mesh((8,))
    s = shard_scene(scene, mesh)
    img, _ = render_pass_sharded(s, cam, mesh=mesh, **KW)
    # image rows stay sharded over the ray axis (no gather on the hot path)
    assert len(img.sharding.device_set) == 8


def test_scene_sharded_over_spheres(single):
    scene, cam, _, _ = single
    mesh = make_mesh((2, 4))
    s = shard_scene(scene, mesh)
    # per-sphere arrays are split 4 ways over the sphere axis
    shard_shapes = {sh.data.shape for sh in s.center.addressable_shards}
    assert shard_shapes == {(scene.n_pad // 4, 3)}


def test_multihost_noop_single_process():
    from tpu_ray.parallel.multihost import ensure_initialized
    # single process, no coordinator env -> no-op
    assert ensure_initialized() is False
    assert jax.process_count() == 1


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_trimesh_sharded_over_primitives(mesh_shape):
    # VERDICT r1 item 10: the primitive axis covers the triangle soup too —
    # each shard searches its sphere AND triangle slices, global ids follow
    # the unsharded [spheres | triangles] convention
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    img0, rays0 = render_pass(scene, cam, **KW)
    mesh = make_mesh(mesh_shape)
    s = shard_scene(scene, mesh)
    img, rays = render_pass_sharded(s, cam, mesh=mesh, **KW)
    assert int(rays) == int(rays0)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img0),
                               rtol=1e-6, atol=1e-7)


def test_sharded_trimesh_fused_matches_single():
    # the fused custom-VJP path with a triangle soup under shard_map (1D ray
    # mesh): the round-2 tri-fused kernel must stay bit-identical when the
    # ray axis is split across devices
    from tpu_ray.core.scene import make_trimesh_scene
    scene = make_trimesh_scene(subdivisions=2)
    cam = default_camera(scene)
    kw = dict(width=32, height=16, spp=1, sample_start=0, seed=0,
              backend="fused")
    img0, rays0 = render_pass(scene, cam, **kw)
    mesh = make_mesh((8,))
    s = shard_scene(scene, mesh)
    img, rays = render_pass_sharded(s, cam, mesh=mesh, **kw)
    assert int(rays) == int(rays0)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img0))
