"""Differentiable persistent-wavefront trace (kernels/regen.make_regen_trace),
interpret mode on CPU.

The regen VJP and the fused per-sample custom VJP differentiate THE SAME
estimator (shared search, RNG, `_shade` chain, left-fold accumulation), so
their gradients must agree on every parameter group up to the ~1-ulp
cross-kernel FP contraction drift that flips rare near-tie winners
(tests/test_regen.py module docstring) — measured <=7e-4 relative on every
group; asserted at 3e-3 here.

Geometry/camera finite-difference checks follow the smooth-pixel discipline
of tests/test_grad_oracle.py: AD computes the INTERIOR gradient (discrete
winner selection held fixed), while a raw central difference also picks up
O(1) boundary terms wherever the perturbation flips a winner (silhouettes).
Raw FD therefore legitimately disagrees on boundary-moving parameters — the
comparison must mask to pixels whose radiance moves O(eps) inside the
stencil. (This is exactly why the raw-FD center/camera rows of the retired
root-level smoke script printed rel~1, with sign flips.)
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.grad import make_train_step, render_mean
from tpu_ray.kernels.regen import make_regen_trace, make_trace_regen
from tpu_ray.models.path_tracer import tile_order

W, H, SPP, MB = 32, 16, 2, 5


def _pix(w=W, h=H):
    perm, _ = tile_order(w, h)
    return jnp.asarray(perm)


def _wts(n, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(n, 3), np.float32)


def _scene(name):
    if name == "trimesh":
        from tpu_ray.core.scene import make_trimesh_scene
        return make_trimesh_scene(subdivisions=2)   # 642 tris: interpret-fast
    return make_scene(name)


def _grads(loss):
    return jax.jit(jax.grad(loss, argnums=(0, 1)))


def _leaf_groups(scene, cam):
    groups = {"center": scene.center, "radius": scene.radius,
              "albedo": scene.albedo, "emissive": scene.emissive,
              "specular": scene.specular, "ior": scene.ior,
              "cam.position": cam.position, "cam.look_at": cam.look_at}
    if scene.tris is not None:
        groups.update({"tris.v0": scene.tris.v0, "tris.e1": scene.tris.e1,
                       "tris.e2": scene.tris.e2,
                       "tris.albedo": scene.tris.albedo})
    return groups


@pytest.mark.parametrize("name", ["rtweekend", "trimesh"])
def test_regen_grad_matches_fused(name):
    scene = _scene(name)
    cam = default_camera(scene)
    px = _pix()
    wts = _wts(px.shape[0])
    tr = make_regen_trace(W, H, 0, MB, SPP, seg=4)

    def loss_regen(scene, cam):
        c, _ = tr(scene, cam, px, 0)
        return jnp.sum(c * wts)

    from tpu_ray.kernels.bounce_step import make_fused_sample
    fused = make_fused_sample(W, H, 0, MB)

    def loss_fused(scene, cam):
        tot = jnp.zeros(())
        for s in range(SPP):
            c, _ = fused(scene, cam, px, jnp.uint32(s))
            tot = tot + jnp.sum(c * wts)
        return tot

    gr_s, gr_c = _grads(loss_regen)(scene, cam)
    gf_s, gf_c = _grads(loss_fused)(scene, cam)
    got = _leaf_groups(gr_s, gr_c)
    want = _leaf_groups(gf_s, gf_c)
    for key in want:
        a = np.asarray(got[key], np.float64)
        b = np.asarray(want[key], np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        assert rel < 3e-3, (name, key, rel)
        if key in ("center", "albedo", "cam.position"):
            assert np.abs(b).max() > 0.0, (name, key, "all-zero")


@pytest.mark.parametrize("name", ["rtweekend", "trimesh"])
def test_regen_records_forward_bit_identical(name):
    # the recording forward (run under jax.vjp) must reproduce the primal
    # while-loop BIT-exactly: shared _step_tail, same kernel bodies
    scene = _scene(name)
    cam = default_camera(scene)
    px = _pix()
    tr = make_regen_trace(W, H, 0, MB, SPP, seg=4)
    c0, r0 = tr(scene, cam, px, 0)
    (c1, r1), _ = jax.vjp(lambda sc: tr(sc, cam, px, 0), scene)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    assert int(r0) == int(r1)
    # and the primal equals the undecorated forward-only trace
    run = make_trace_regen(W, H)
    c2, r2 = run(scene, cam, px, SPP, 0, MB)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c2))
    assert int(r0) == int(r2)


def test_regen_grad_seg_invariance():
    """Segment length is a pure re-checkpointing knob: seg not dividing
    k_max (3 | 10 fails), seg = 1 (checkpoint every step), and seg > k_max
    (single segment whose tail rows lie past the forward's t_final and must
    replay as all-dead identities) all yield the same gradients."""
    scene = make_scene("rgb")     # early termination: no sky, paths die fast
    cam = default_camera(scene)
    px = _pix()
    wts = _wts(px.shape[0], seed=1)

    def loss(tr):
        def f(scene, cam):
            c, _ = tr(scene, cam, px, 0)
            return jnp.sum(c * wts)
        return f

    ref_s, ref_c = None, None
    for seg in (4, 3, 1, 64):
        tr = make_regen_trace(W, H, 0, MB, SPP, seg=seg)
        gs, gc = _grads(loss(tr))(scene, cam)
        if ref_s is None:
            ref_s, ref_c = gs, gc
            continue
        for a, b in zip(jax.tree.leaves((gs, gc)),
                        jax.tree.leaves((ref_s, ref_c))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)


def test_regen_grad_sample_start():
    # s0 > 0 (progressive pass 2): the recording forward and the raygen
    # cotangent routing must use the SHIFTED sample indices
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    px = _pix()
    wts = _wts(px.shape[0], seed=2)
    tr2 = make_regen_trace(W, H, 0, MB, SPP, seg=4)

    def loss_shift(scene, cam):
        c, _ = tr2(scene, cam, px, SPP)      # samples [SPP, 2*SPP)
        return jnp.sum(c * wts)

    tr4 = make_regen_trace(W, H, 0, MB, 2 * SPP, seg=4)

    def loss_all(scene, cam):
        c, _ = tr4(scene, cam, px, 0)        # samples [0, 2*SPP)
        return jnp.sum(c * wts)

    tr0 = make_regen_trace(W, H, 0, MB, SPP, seg=4)

    def loss_first(scene, cam):
        c, _ = tr0(scene, cam, px, 0)        # samples [0, SPP)
        return jnp.sum(c * wts)

    g_shift = _grads(loss_shift)(scene, cam)
    g_all = _grads(loss_all)(scene, cam)
    g_first = _grads(loss_first)(scene, cam)
    # additivity of the sample sum: grad[0,2spp) = grad[0,spp) + grad[spp,2spp)
    # — statistically: the spp=4 and spp=2 traces are different kernel
    # compilations, so rare near-tie winners flip (~1 path in 8k, module
    # docstring of tests/test_regen.py), perturbing isolated elements O(1%)
    for a, b, c in zip(jax.tree.leaves(g_all), jax.tree.leaves(g_first),
                       jax.tree.leaves(g_shift)):
        want = np.asarray(b, np.float64) + np.asarray(c, np.float64)
        got = np.asarray(a, np.float64)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
        assert rel < 1.5e-2, rel


def test_regen_grad_sharded_matches_single():
    from tpu_ray.parallel import make_mesh, shard_scene
    from tpu_ray.grad import render_mean_sharded
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)
    kw = dict(width=W, height=H, spp=SPP, backend="fused", regen=True)

    def loss(scene, cam):
        img = render_mean(scene, cam, **kw)
        return jnp.mean((img - target) ** 2)

    g1 = _grads(loss)(scene, cam)
    mesh = make_mesh((8,))

    def loss_sh(scene, cam):
        img = render_mean_sharded(scene, cam, mesh=mesh, **kw)
        return jnp.mean((img - target) ** 2)

    g2 = _grads(loss_sh)(shard_scene(scene, mesh), cam)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-6)


def _regen_image_mean(scene, cam, tr, px, inv):
    c, _ = tr(scene, cam, px, 0)
    return c[inv].reshape(H, W, 3) / SPP


@pytest.mark.parametrize("param", ["center", "cam_pos"])
def test_regen_geometry_fd_masked(param):
    """Boundary-moving parameters vs central differences THROUGH THE REGEN
    FORWARD ITSELF, on the smooth-pixel set (test_grad_oracle discipline).
    Raw FD picks up O(1) silhouette terms AD deliberately excludes — the
    masked comparison is the correct contract for geometry/camera."""
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    perm, inv_np = tile_order(W, H)
    px, inv = jnp.asarray(perm), jnp.asarray(inv_np)
    tr = make_regen_trace(W, H, 0, MB, SPP, seg=4)
    eps = 1e-3

    def with_param(v):
        if param == "center":
            s2 = dataclasses.replace(scene,
                                     center=scene.center.at[1, 1].set(v))
            return s2, cam
        c2 = dataclasses.replace(cam, position=cam.position.at[0].set(v))
        return scene, c2

    v0 = float(scene.center[1, 1] if param == "center" else cam.position[0])
    ip = np.asarray(_regen_image_mean(*with_param(v0 + eps), tr, px, inv),
                    np.float64)
    im = np.asarray(_regen_image_mean(*with_param(v0 - eps), tr, px, inv),
                    np.float64)
    jump = np.abs(ip - im).max(axis=-1)
    mask = jump < 10.0 * eps
    assert mask.mean() > 0.6, mask.mean()
    maskj = jnp.asarray(mask, jnp.float32)
    target = np.zeros((H, W, 3), np.float32)

    def masked_mse(img, m):
        return float(np.sum(m[..., None] * (img - target) ** 2)
                     / (3 * m.sum()))

    fd = (masked_mse(ip, mask) - masked_mse(im, mask)) / (2 * eps)

    def loss(scene, cam):
        img = _regen_image_mean(scene, cam, tr, px, inv)
        return jnp.sum(maskj[..., None] * (img - jnp.asarray(target)) ** 2) \
            / (3 * maskj.sum())

    gs, gc = _grads(loss)(scene, cam)
    ad = float(gs.center[1, 1] if param == "center" else gc.position[0])
    assert abs(fd - ad) < 3e-3 + 0.6 * abs(fd), (param, fd, ad)


def test_train_step_regen():
    # product wiring: make_train_step(backend='fused', regen=True) optimizes
    scene = make_scene("rgb")
    cam = default_camera(scene)
    target = render_mean(scene, cam, width=W, height=H, spp=SPP,
                         backend="fused", regen=True)
    bad = dataclasses.replace(scene, albedo=jnp.clip(scene.albedo * 0.7,
                                                     0.0, 1.0))
    init_fn, step_fn = make_train_step(
        width=W, height=H, spp=SPP, backend="fused", regen=True,
        fixed_samples=True, train_camera=False)
    state = init_fn(bad, cam)
    state, loss0 = step_fn(state, target)
    for _ in range(4):
        state, loss = step_fn(state, target)
    assert np.isfinite(float(loss))
    assert float(loss) < float(loss0), (float(loss0), float(loss))


@pytest.mark.parametrize("use_sky,with_tri", [(True, False), (False, False),
                                              (True, True)])
def test_shade_vjp_matches_autodiff(use_sky, with_tri):
    """The hand-written `_shade` transpose (kernels/bounce_step._shade_vjp,
    the segment backward's no-residual-stack replacement for in-kernel
    jax.vjp) must match jax.vjp(_shade) on randomized states/winners."""
    from tpu_ray.kernels.bounce_step import _shade, _shade_vjp

    rng = np.random.default_rng(7)
    br = 256
    st = rng.standard_normal((16, br)).astype(np.float32)
    st[12] = (rng.random(br) < 0.8).astype(np.float32)
    st[3:6] /= np.linalg.norm(st[3:6], axis=0, keepdims=True)
    w = rng.standard_normal((16, br)).astype(np.float32)
    w[3] = np.abs(w[3]) + 0.1
    w[10] = rng.random(br).astype(np.float32)
    w[11] = np.where(rng.random(br) < 0.5, 0.0, 1.5).astype(np.float32)
    live = ((st[12] > 0.5) & (rng.random(br) < 0.7))[None, :]
    sky = (st[12] > 0.5)[None, :] & ~live
    rand = tuple(jnp.asarray(rng.uniform(-1, 1, (1, br)), jnp.float32)
                 for _ in range(3)) + (
        jnp.asarray(rng.uniform(0, 1, (1, br)), jnp.float32),)
    is_tri = jnp.asarray(rng.random((1, br)) < 0.5) if with_tri else None
    g = rng.standard_normal((16, br)).astype(np.float32)
    g[12] = 0.0

    st, w, g = jnp.asarray(st), jnp.asarray(w), jnp.asarray(g)
    live, sky = jnp.asarray(live), jnp.asarray(sky)
    _, vjp = jax.vjp(
        lambda s, ww: _shade(s, ww, live, sky, rand, use_sky, is_tri),
        st, w)
    d_st_ref, d_w_ref = vjp(g)
    d_st, d_w = _shade_vjp(st, w, live, sky, rand, use_sky, g, is_tri)
    np.testing.assert_allclose(d_st, d_st_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(d_w, d_w_ref, rtol=2e-5, atol=2e-5)


def test_regen_grad_big_table_list_gathers():
    """p_pad > _GATHER_TILE routes the segment backward through the
    record-derived gather-tile lists (gather_tile_lists + the rt-layout
    table/d_table) — gradients must match the fused per-sample sweep
    exactly as the small-table path does."""
    from tpu_ray.core.scene import make_trimesh_scene
    from tpu_ray.kernels.bounce_step import _GATHER_TILE, make_fused_sample

    scene = make_trimesh_scene(subdivisions=3)   # 2562 tris -> p_pad > 1024
    p_pad = scene.n_pad + scene.tris.n_pad
    assert p_pad > _GATHER_TILE, p_pad
    cam = default_camera(scene)
    px = _pix()
    wts = _wts(px.shape[0], seed=3)
    tr = make_regen_trace(W, H, 0, MB, SPP, seg=4)

    def loss_regen(scene, cam):
        c, _ = tr(scene, cam, px, 0)
        return jnp.sum(c * wts)

    fused = make_fused_sample(W, H, 0, MB)

    def loss_fused(scene, cam):
        tot = jnp.zeros(())
        for s in range(SPP):
            c, _ = fused(scene, cam, px, jnp.uint32(s))
            tot = tot + jnp.sum(c * wts)
        return tot

    gr_s, gr_c = _grads(loss_regen)(scene, cam)
    gf_s, gf_c = _grads(loss_fused)(scene, cam)
    got = _leaf_groups(gr_s, gr_c)
    want = _leaf_groups(gf_s, gf_c)
    for key in want:
        a = np.asarray(got[key], np.float64)
        b = np.asarray(want[key], np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        assert rel < 3e-3, (key, rel)


def test_fuse_steps_bit_identical(monkeypatch):
    """The r5 multi-step launch fusion (_regen_multi_kernel) vs 1-step
    launches: the rays counter is EXACT (integer, winner-independent) and
    radiance/gradients agree to the cross-program contraction class — the
    compiler fuses across the sub-steps, so the same f32 chain contracts
    differently (~1-ulp state drift, rare near-tie winner flips; measured
    64x32 4spp fwd: 0 of 2048 pixels differ >1e-3, max 7.6e-5). Same
    statistical contract as regen-vs-fused-sweep (tests/test_regen.py)."""
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    px = _pix()
    wts = _wts(px.shape[0], seed=7)

    def run(fuse):
        monkeypatch.setenv("TPU_RAY_REGEN_FUSE", str(fuse))
        tr = make_regen_trace(W, H, 0, MB, SPP, seg=4)

        def loss(scene, cam):
            c, rays = tr(scene, cam, px, 0)
            return jnp.sum(c * wts), rays

        # fresh jit wrapper per fuse: the env var is read at TRACE time
        (v, rays), g = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True))(scene, cam)
        return v, rays, g

    v1, r1, g1 = run(1)
    v2, r2, g2 = run(2)
    assert int(r1) == int(r2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-4 * max(1e-30, np.abs(b).max()))
