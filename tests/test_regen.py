"""Persistent-wavefront sample-regeneration kernel (kernels/regen.py),
interpret mode on CPU.

Parity standard matches tests/test_fused.py: the regen kernel shares the
search, RNG, and shading chain with the per-sample fused sweep, and its
in-kernel raygen replays ops/raygen.camera_rays' f32 op sequence exactly —
but compiler FP contraction across different kernel bodies drifts scatter
directions by ~1 ulp, which chaotically flips rare near-tie winners
(measured: 1 path in ~8k samples on rtweekend). Parity is therefore
statistical, with the rays-cast counter required to agree to <=0.1%.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.kernels.regen import make_trace_regen
from tpu_ray.models.path_tracer import render_pass, tile_order


def _regen_image(scene, cam, w, h, spp, sample_start=0, seed=0, **kw):
    perm, inv = tile_order(w, h)
    run = make_trace_regen(w, h)
    color, rays = run(scene, cam, jnp.asarray(perm), spp, seed, 5,
                      sample_start=sample_start, **kw)
    return color[jnp.asarray(inv)].reshape(h, w, 3), int(rays)


@pytest.mark.parametrize("name", ["rgb", "rtweekend", "trimesh"])
def test_regen_matches_fused(name):
    scene = make_scene(name)
    cam = default_camera(scene)
    w, h, spp = 64, 40, 3
    i0, r0 = render_pass(scene, cam, width=w, height=h, spp=spp,
                         sample_start=0, backend="fused")
    i1, r1 = _regen_image(scene, cam, w, h, spp)
    a, b = np.asarray(i0), np.asarray(i1)
    match = np.abs(a - b).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert float(np.abs(a - b).mean()) < 1e-3
    assert abs(int(r0) - r1) <= max(2, 0.001 * int(r0)), (int(r0), r1)


def test_regen_render_pass_flag():
    # the product wiring: render_pass(backend='fused', regen=True) runs the
    # same trace as the _regen_image plumbing above, permutation included.
    # Full-jit vs eager compilation contexts contract FP differently
    # (measured: mean |d| ~3e-5, identical ray counts), so the comparison
    # is statistical like every cross-context kernel test here.
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    w, h, spp = 64, 40, 2
    i0, r0 = render_pass(scene, cam, width=w, height=h, spp=spp,
                         sample_start=0, backend="fused", regen=True)
    i1, r1 = _regen_image(scene, cam, w, h, spp)
    a, b = np.asarray(i0), np.asarray(i1)
    match = np.abs(a - b).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert float(np.abs(a - b).mean()) < 1e-3
    assert abs(int(r0) - r1) <= max(2, 0.001 * int(r0))


def test_regen_progressive_sample_start():
    # progressive accumulation: pass 2 starts at sample_start=spp and must
    # draw the SAME RNG streams the per-sample sweep would — the combined
    # two-pass image equals one regen render of 2*spp samples exactly
    # (identical left-fold order), and statistically matches the fused
    # two-pass render
    scene = make_scene("rgb")
    cam = default_camera(scene)
    w, h, spp = 64, 40, 2
    p1, r1 = _regen_image(scene, cam, w, h, spp, sample_start=0)
    p2, r2 = _regen_image(scene, cam, w, h, spp, sample_start=spp)
    both, rb = _regen_image(scene, cam, w, h, 2 * spp, sample_start=0)
    np.testing.assert_array_equal(np.asarray(p1) + np.asarray(p2),
                                  np.asarray(both))
    assert r1 + r2 == rb
    f2, rf2 = render_pass(scene, cam, width=w, height=h, spp=spp,
                          sample_start=spp, backend="fused")
    match = np.abs(np.asarray(f2) - np.asarray(p2)).max(axis=-1) < 1e-5
    assert match.mean() > 0.99, match.mean()


def test_regen_exact_argmin():
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    i0, r0 = _regen_image(scene, cam, 48, 32, 2, exact_argmin=True)
    i1, r1 = render_pass(scene, cam, width=48, height=32, spp=2,
                         sample_start=0, backend="jnp")
    match = np.abs(np.asarray(i0) - np.asarray(i1)).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()


def test_regen_unaligned_pixel_count():
    # r not a BLOCK_R multiple: padding lanes must stay exhausted and
    # contribute nothing
    scene = make_scene("rgb")
    cam = default_camera(scene)
    run = make_trace_regen(37, 9)
    px = jnp.arange(333, dtype=jnp.int32)
    color, rays = run(scene, cam, px, 2, 0, 5)
    assert color.shape == (333, 3)
    assert np.isfinite(np.asarray(color)).all()
    assert rays > 0


def test_regen_ray_chunked():
    # slabbed regen (ray_chunk routed through render_pass): per-slab
    # while_loops must reproduce the unslabbed render statistically and
    # the exact ray-count class
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    w, h, spp = 64, 40, 2
    i0, r0 = render_pass(scene, cam, width=w, height=h, spp=spp,
                         sample_start=0, backend="fused", regen=True)
    i1, r1 = render_pass(scene, cam, width=w, height=h, spp=spp,
                         sample_start=0, backend="fused", regen=True,
                         ray_chunk=640)
    a, b = np.asarray(i0), np.asarray(i1)
    match = np.abs(a - b).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert abs(int(r0) - int(r1)) <= max(2, 0.001 * int(r0))


def test_regen_sharded_matches_single():
    # shard_map'd regen: per-shard while_loops (independent trip counts)
    # must reproduce the single-device regen render
    import jax
    from tpu_ray.parallel import make_mesh, render_pass_sharded, shard_scene
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    w, h, spp = 64, 40, 2
    i0, r0 = render_pass(scene, cam, width=w, height=h, spp=spp,
                         sample_start=0, backend="fused", regen=True)
    mesh = make_mesh((8,))
    i1, r1 = render_pass_sharded(shard_scene(scene, mesh), cam, mesh=mesh,
                                 width=w, height=h, spp=spp, sample_start=0,
                                 backend="fused", regen=True)
    a, b = np.asarray(i0), np.asarray(i1)
    match = np.abs(a - b).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert abs(int(r0) - int(r1)) <= max(2, 0.001 * int(r0))
