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


def _small_trimesh_scene():
    # config-4 geometry at subdivisions=2: 2*320 mesh tris + 2 ground quads
    # + 1 glass sphere -> a real mixed scene small enough for interpret mode
    from tpu_ray.core.scene import make_trimesh_scene
    return make_trimesh_scene(subdivisions=2)


@pytest.mark.parametrize("exact", [False, True])
def test_fused_triangle_scene_parity(exact):
    # round-2: the fused kernel's triangle tile phase (Möller-Trumbore
    # K-stack) + plane-form winner recompute vs the jnp mixed-primitive
    # path, in both the packed and the exact two-scratch carry (the carry
    # that takes over automatically beyond 2048 primitives). Near-tie
    # winner flips across shared mesh edges make packed parity
    # statistical, like the sphere tests above.
    scene = _small_trimesh_scene()
    cam = default_camera(scene)
    px = jnp.arange(48 * 32, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 48, 32, px, 0, 0)
    c0, r0 = trace_rays(scene, o, d, base, 5, probe_jnp)
    c1, r1 = trace_rays_fused(scene, o, d, base, 5, exact_argmin=exact)
    match = np.abs(np.asarray(c1) - np.asarray(c0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.97, match.mean()
    assert abs(int(np.asarray(r0).sum()) - int(np.asarray(r1).sum())) \
        <= 0.01 * int(np.asarray(r0).sum())
    mean_abs = float(np.abs(np.asarray(c1) - np.asarray(c0)).mean())
    assert mean_abs < 2e-3, mean_abs


def test_fused_triangle_grads_match_jnp():
    # vertex/material gradients through the fused plane-form winner table
    # (prim_table vjp: d_table -> cross/dot -> v0/e1/e2) vs the jnp
    # backend's payload-recompute gradients
    import jax
    scene = _small_trimesh_scene()
    cam = default_camera(scene)
    g0 = _backend_grads(scene, cam, 32, 24, 2, "jnp")
    g1 = _backend_grads(scene, cam, 32, 24, 2, "fused")
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g1)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g0)])
    tol = 1e-7 + 2e-3 * np.abs(b) + 1e-4 * max(1e-30, np.abs(b).max())
    ok = np.abs(a - b) <= tol
    assert ok.mean() > 0.97, ok.mean()
    # triangle-vertex gradients must actually flow
    assert float(np.abs(np.asarray(g1[0].tris.v0)).max()) > 0


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


def test_fused_beyond_vmem_sphere_cap():
    # round-1 VERDICT: the fused kernel was capped at 1024 spheres (whole
    # search table + tpq in one VMEM shot). The (ray block x primitive
    # tile) grid lifts that: pad rtweekend to 2048 spheres (two 1024-wide
    # uncalled tiles + 16 culled tiles) and require parity with the
    # identically-padded jnp trace (padding spheres never hit, so this
    # also matches the unpadded render).
    scene = make_scene("rtweekend", pad_to=2048)
    assert scene.n_pad == 2048
    cam = default_camera(scene)
    px = jnp.arange(32 * 24, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 32, 24, px, 0, 0)
    c0, r0 = trace_rays(scene, o, d, base, 5, probe_jnp)
    c1, r1 = trace_rays_fused(scene, o, d, base, 5)
    match = np.abs(np.asarray(c1) - np.asarray(c0)).max(axis=-1) < 1e-5
    assert match.mean() > 0.98, match.mean()


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


@pytest.mark.parametrize("name", ["rtweekend", "trimesh"])
def test_cull_secondary_bit_identical(name):
    # octant-split secondary-bounce culling must be output-INVARIANT: the
    # mask is conservative (every alive ray lies inside its block's octant
    # interval), so culled tiles can never hold the nearest hit and the
    # culled render is bitwise the uncalled one.
    scene = _small_trimesh_scene() if name == "trimesh" \
        else make_scene("rtweekend")
    cam = default_camera(scene)
    px = jnp.arange(48 * 32, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 48, 32, px, 0, 0)
    c0, r0 = trace_rays_fused(scene, o, d, base, 5)
    c1, r1 = trace_rays_fused(scene, o, d, base, 5, cull_secondary=True)
    assert np.array_equal(np.asarray(c0), np.asarray(c1))
    assert np.array_equal(np.asarray(r0), np.asarray(r1))


def test_cull_secondary_mask_tighter_and_covering():
    # the octant mask is a SUBSET of the plain per-block interval mask
    # (each octant test intersects the block's d-interval with the octant
    # box) on real secondary states, and on a constructed directional
    # state it must fire where the plain mask provably cannot.
    from tpu_ray.kernels.bounce_step import (
        BLOCK_R, bounce_cull_mask, bounce_cull_mask_octant, permute_scene,
        _init_state, _fused_tables, bounce_fwd)
    scene = permute_scene(make_scene("rtweekend"))
    cam = default_camera(scene)
    px = jnp.arange(64 * 64, dtype=jnp.int32)
    o, d, base = camera_rays(cam, 64, 64, px, 0, 0)
    st, _, _ = _init_state(o, d, base, BLOCK_R)
    tb = _fused_tables(scene)
    # advance to a diffuse secondary state
    st, _ = bounce_fwd(tb["t48"], tb["stab_full"], st, jnp.int32(0), None,
                       use_sky=scene.use_sky, block_r=BLOCK_R)
    plain = np.asarray(bounce_cull_mask(scene, st, BLOCK_R))
    octant = np.asarray(bounce_cull_mask_octant(scene, st, BLOCK_R))
    assert (octant <= plain).all()

    # constructed case exposing what the octant split captures that the
    # plain hull cannot: direction-axis CORRELATION. A block of rays at
    # the origin in two cones, (+x, +y, +z) and (-x, +y, -z); three
    # sphere-cluster tiles in quadrants (+x,-z), (-x,+z), (+x,+z). The
    # plain interval hull brackets 0 on both x and z — no sign constraint
    # at all — and admits every tile; neither occupied octant reaches the
    # first two tiles (each cone is sign-blocked on x or z), so the
    # octant mask culls exactly those and keeps the third.
    from tpu_ray.core.scene import SceneBuilder
    b = SceneBuilder()
    rng = np.random.RandomState(0)
    for quad in ((+1, -1), (-1, +1), (+1, +1)):
        for _ in range(128):
            x, z = rng.uniform(5.0, 6.0, 2)
            b.add((quad[0] * x, rng.uniform(0.0, 1.0), quad[1] * z), 0.1,
                  (0.5, 0.5, 0.5), world_scale=False)
    qscene = b.build(look_at=(0, 0, 0), use_sky=True, default_distance=20.0,
                     default_x_angle=0.0, default_y_height=1.0)
    st2 = np.zeros((16, BLOCK_R), np.float32)
    half = np.arange(BLOCK_R) % 2 == 0
    st2[3, :] = np.where(half, 0.7, -0.7)
    st2[4, :] = 0.05
    st2[5, :] = np.where(half, 0.7, -0.7)
    st2[3:6, :] /= np.linalg.norm(st2[3:6, :], axis=0, keepdims=True)
    st2[12, :] = 1.0
    st2 = jnp.asarray(st2)
    plain2 = np.asarray(bounce_cull_mask(qscene, st2, BLOCK_R))
    octant2 = np.asarray(bounce_cull_mask_octant(qscene, st2, BLOCK_R))
    assert plain2.tolist() == [[1, 1, 1]], plain2
    assert octant2.tolist() == [[0, 0, 1]], octant2


def test_cull_secondary_grads_bit_identical():
    # the differentiable fused path with octant culling: forward AND
    # gradients must equal the uncalled fused path exactly (same winners,
    # same saved idx stack, identical backward).
    import jax
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    from tpu_ray.grad import image_mse, render_mean
    target = jnp.zeros((24, 32, 3), jnp.float32)

    def f(cull):
        def loss(s, c):
            return image_mse(
                render_mean(s, c, width=32, height=24, spp=2,
                            backend="fused", cull_secondary=cull), target)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(scene, cam)

    g0, g1 = f(False), f(True)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_table_chunks_exact_reconstruction_traced():
    # The bf16 chunk table must reconstruct the f32 table BITWISE with the
    # table as a traced jit argument — the configuration where XLA's
    # excess-precision simplifier rewrote the old rounding-based split's
    # convert_f32(convert_bf16(x)) round-trip to x on TPU, zeroing the
    # residual chunks (c2 = c3 = 0) and silently degrading every winner
    # gather to bf16. The truncation-based _split3_bf16 is immune; this
    # pins the property (and the TPU verify recipe re-checks on-device).
    import jax
    from tpu_ray.kernels.bounce_step import scene_table, table_chunks
    for name in ("rgb", "rtweekend"):
        t = np.asarray(scene_table(make_scene(name)))
        ch = np.asarray(jax.jit(table_chunks)(jnp.asarray(t)),
                        dtype=np.float32)
        recon = ch[0:16] + ch[16:32] + ch[32:48]
        assert (recon == t).all(), name
        assert np.abs(ch[16:32]).max() > 0, "residual chunks collapsed"


def _backend_grads(scene, cam, W, H, spp, backend, sample_start=0):
    import jax
    from tpu_ray.grad import image_mse, render_mean
    target = jnp.zeros((H, W, 3), jnp.float32)

    def f(s, c):
        return image_mse(
            render_mean(s, c, width=W, height=H, spp=spp, backend=backend,
                        sample_start=sample_start), target)

    return jax.jit(jax.grad(f, argnums=(0, 1)))(scene, cam)


def test_fused_grads_exact_on_flip_free_scene():
    # the round-2 deliverable: the custom-VJP fused path (forward Pallas +
    # saved-hit replay backward, SURVEY.md §7 step 4) produces the same
    # scene/camera gradients as the jnp backend. On the rgb scene (5 well-
    # separated spheres: no near-tie winners, so both backends pick
    # identical paths) parity is essentially BITWISE — this pins the whole
    # trace-level wiring (multi-sample scan, sample_start, raygen VJP,
    # d_table accumulation) with no statistical slack.
    import jax
    scene = make_scene("rgb")
    cam = default_camera(scene)
    g0 = _backend_grads(scene, cam, 32, 32, 3, "jnp", sample_start=5)
    g1 = _backend_grads(scene, cam, 32, 32, 3, "fused", sample_start=5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.linalg.norm(a - b) <= 1e-6 * (np.linalg.norm(b) + 1e-30)


def test_fused_grads_match_jnp_statistically():
    # rtweekend: the packed search's rounding differs from jnp's projection
    # form, so near-tie winners flip on a handful of rays — those carry
    # legitimately different path gradients. Everything off the flipped
    # paths must match tightly.
    import jax
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    g0 = _backend_grads(scene, cam, 48, 32, 2, "jnp")
    g1 = _backend_grads(scene, cam, 48, 32, 2, "fused")
    # judge element-wise over the CONCATENATED gradient (tiny leaves like
    # camera.position have 3 elements — a single flipped path can move all
    # of them, so per-leaf fractions are meaningless there)
    a = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g1)])
    b = np.concatenate([np.asarray(x).ravel()
                        for x in jax.tree_util.tree_leaves(g0)])
    tol = 1e-7 + 2e-3 * np.abs(b) + 1e-4 * max(1e-30, np.abs(b).max())
    ok = np.abs(a - b) <= tol
    assert ok.mean() > 0.98, ok.mean()
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


def test_untile_image_matches_inverse_permutation():
    """untile_image's reshape/transpose route == the plain inv gather for
    arbitrary data, across multiple (width, height) shapes including
    ragged tile rows — a pure-permutation unit guard for the r4 gather
    replacement."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_ray.models.path_tracer import tile_order, untile_image

    rng = np.random.default_rng(0)
    for w, h in [(32, 24), (64, 40), (96, 32), (64, 64), (160, 72)]:
        perm, inv = tile_order(w, h)
        buf = rng.standard_normal((w * h, 3)).astype(np.float32)
        want = buf[inv].reshape(h, w, 3)
        got = np.asarray(untile_image(jnp.asarray(buf), w, h, inv))
        np.testing.assert_array_equal(got, want), (w, h)
