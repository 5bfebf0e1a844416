"""Resident-table list-sweep triangle search (kernels/bounce_step:
bounce_fwd_list) vs the streamed (ray block x tri tile) grid sweep.

The list kernel is the TPU shape of a one-level BVH traversal: per
ray-block-group compacted reachable-tile lists (exact per-lane slab tests,
tri_block_lists) swept by an in-kernel dynamic-trip fori_loop over a
VMEM-resident tri table. In interpret mode the two sweeps are BIT-identical
(same folds, order-invariant packed min / matched exact tie rule); on real
TPU hardware the residual divergence class is Möller-Trumbore acceptance
fuzz at grazing determinants (measured: 1 pixel in 2.07M at 1080p,
BASELINE.md r3) — which interpret-mode CPU arithmetic does not exhibit.

Reference analogue: the EnableSIMD A/B oracle (/root/reference/main.cpp:853)
— every new search backend must reproduce the old one's output exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ray.core.scene import make_scene
from tpu_ray.core.camera import default_camera
from tpu_ray.ops.raygen import camera_rays
from tpu_ray.kernels.bounce_step import (
    BLOCK_R, _TRI_TILE, _fused_tables, _init_state, bounce_fwd_list,
    list_group, permute_scene, resident_tables_fit, trace_rays_fused,
    tri_block_lists)

W, H = 192, 108


def _rays(scene, seed=0):
    cam = default_camera(scene)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    return camera_rays(cam, W, H, pix, jnp.int32(0), seed)


@pytest.mark.parametrize("exact", [False, True])
def test_list_matches_streamed_bitwise(exact):
    scene = make_scene("trimesh")
    o, d, base = _rays(scene)

    def run(tri_list):
        return jax.jit(lambda s: trace_rays_fused(
            s, o, d, base, 5, exact_argmin=exact, tri_list=tri_list))(scene)

    c_on, r_on = run(True)
    c_off, r_off = run(False)
    assert np.array_equal(np.asarray(c_on), np.asarray(c_off))
    assert np.array_equal(np.asarray(r_on), np.asarray(r_off))


def test_grouped_lists_match_ungrouped():
    """Group coarsening (SMEM bound) only ORs reachability — same output."""
    scene = permute_scene(make_scene("trimesh"))
    o, d, base = _rays(scene)
    tb = _fused_tables(scene)
    st, r, r_pad = _init_state(o, d, base, BLOCK_R)

    def one_bounce(group):
        lists = tri_block_lists(tb["tri_boxes"], st, BLOCK_R, group)
        out, idx = bounce_fwd_list(
            tb["t48"], tb["stab_full"], st, jnp.int32(0), tb["tri_full"],
            lists, use_sky=scene.use_sky, group=group)
        return np.asarray(out), np.asarray(idx)

    o1, i1 = one_bounce(1)
    o4, i4 = one_bounce(4)
    # bitwise: state row 13 carries the RNG stream base as bitcast f32,
    # whose bit patterns are legitimately NaN (NaN != NaN under ==)
    assert np.array_equal(np.ascontiguousarray(o1).view(np.uint32),
                          np.ascontiguousarray(o4).view(np.uint32))
    assert np.array_equal(i1, i4)


def test_list_counts_are_conservative():
    """Every tile holding any lane's winner must be in that group's list."""
    scene = permute_scene(make_scene("trimesh"))
    o, d, base = _rays(scene)
    tb = _fused_tables(scene)
    st, r, r_pad = _init_state(o, d, base, BLOCK_R)
    cnt, lst = jax.jit(
        lambda s: tri_block_lists(tb["tri_boxes"], s, BLOCK_R, 1))(st)
    _, idx = bounce_fwd_list(
        tb["t48"], tb["stab_full"], st, jnp.int32(0), tb["tri_full"],
        (cnt, lst), use_sky=scene.use_sky, group=1)
    idx = np.asarray(idx).reshape(-1, BLOCK_R)
    cnt, lst = np.asarray(cnt)[:, 0], np.asarray(lst)
    n_pad = tb["n_pad"]
    for b in range(idx.shape[0]):
        wins = idx[b][idx[b] >= n_pad]
        tiles = np.unique((wins - n_pad) // _TRI_TILE)
        listed = set(lst[b, :cnt[b]].tolist())
        assert set(tiles.tolist()) <= listed, (b, tiles, sorted(listed))
    # and the lists actually cull something on this scene
    assert cnt.mean() < 0.9 * lst.shape[1]


def test_resident_fit_gate():
    assert resident_tables_fit(128, 10368)            # BASELINE config 4
    assert not resident_tables_fit(128, 10 ** 6)      # too big: falls back
    assert not resident_tables_fit(2048, 10368)       # sphere table too big
    assert not resident_tables_fit(128, 0)            # no triangles
    assert list_group(2025, 81) > 1                   # 1080p needs grouping
    assert list_group(10, 81) == 1


def test_sphere_scene_unaffected():
    """No triangles -> the list path must not engage (same trace fn)."""
    scene = make_scene("rtweekend")
    o, d, base = _rays(scene)
    c1, _ = jax.jit(lambda s: trace_rays_fused(
        s, o, d, base, 3, tri_list=True))(scene)
    c2, _ = jax.jit(lambda s: trace_rays_fused(
        s, o, d, base, 3, tri_list=False))(scene)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_measured_tri_reach_regen_sane():
    """The regen-wavefront reach measurement (r5, bench.py's SoL input
    for regen trimesh runs): a fraction in (0, 1], measured on the
    actual persistent-wavefront loop."""
    from tpu_ray import default_camera, make_scene
    from tpu_ray.kernels.regen import measured_tri_reach_regen
    from tpu_ray.models.path_tracer import tile_order

    scene = make_scene("trimesh")
    cam = default_camera(scene)
    import jax.numpy as jnp
    perm, _ = tile_order(64, 32)
    reach = measured_tri_reach_regen(scene, cam, jnp.asarray(perm),
                                     spp=1, seed=0, max_bounces=3,
                                     width=64, height=32)
    assert 0.0 < reach <= 1.0, reach
