"""HBM-streaming list-driven triangle search (nearest_hit_tri_stream) —
the route past the ~13k-tri VMEM residency cliff (VERDICT r3 item 4).

Bit-identity discipline: on CPU (interpret mode) the stream kernel must
reproduce the exact full sweep fold-for-fold — skipped tiles provably
cannot win (tri_block_lists conservativeness), and the exact two-reduction
carry with ascending tile order resolves ties identically.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.core.scene import make_trimesh_scene
from tpu_ray.kernels.tri_intersect import (nearest_hit_tri_pallas,
                                           nearest_hit_tri_stream)
from tpu_ray.ops.raygen import camera_rays


@pytest.fixture(autouse=True)
def _isolate_jit_cache():
    """render_pass is a module-level jax.jit: a monkeypatched route change
    does NOT change its cache key, so a same-signature render from an
    earlier test would silently return the UNPATCHED executable (verified:
    resident_tables_fit is never called on the cache hit) — and, symmetric
    hazard, a later unpatched test could get a patched one. Every test in
    this module therefore leaves a clean cache behind, and the
    monkeypatching tests clear again right after patching."""
    yield
    jax.clear_caches()


def _rays(scene, w=64, h=36):
    cam = default_camera(scene)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    o, d, _ = camera_rays(cam, w, h, pix, jnp.uint32(0), 0)
    return o, d


def test_stream_matches_exact_full_sweep_primary():
    scene = make_trimesh_scene(subdivisions=2)
    o, d = _rays(scene)
    ref = nearest_hit_tri_pallas(scene.tris, o, d, exact=True)
    got = nearest_hit_tri_stream(scene.tris, o, d)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(got.idx))
    assert (np.asarray(got.t) < 3e38).any(), "no hits — vacuous parity"


def test_stream_matches_exact_full_sweep_scattered():
    # incoherent directions (secondary-bounce-like): the per-lane slab
    # tests must stay conservative for arbitrary o/d
    scene = make_trimesh_scene(subdivisions=2)
    rng = np.random.default_rng(11)
    r = 2048
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (r, 3)), jnp.float32)
    d = rng.standard_normal((r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    ref = nearest_hit_tri_pallas(scene.tris, o, d, exact=True)
    got = nearest_hit_tri_stream(scene.tris, o, d)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(got.idx))


def test_fused_backend_autoroutes_past_cliff(monkeypatch):
    """With the residency check forced false, backend='fused' must fall
    back to the probe path + stream search and reproduce the jnp
    backend's image bit-for-bit (identical winners and payload math)."""
    from tpu_ray.kernels import bounce_step
    from tpu_ray.models.path_tracer import render_pass

    scene = make_trimesh_scene(subdivisions=1)
    kw = dict(width=32, height=16, spp=1, sample_start=0, max_bounces=3)
    ref_img, ref_rays = render_pass(scene, default_camera(scene),
                                    backend="jnp", **kw)
    monkeypatch.setattr(bounce_step, "resident_tables_fit",
                        lambda n, m: False)
    # sort_rays=False pins the SEARCH certification: with sorting on, XLA
    # contracts the same per-lane ops differently around the permutes
    # (~1-ulp drift, the usual cross-program class) — the sorted route is
    # covered by test_sorted_bounces_match below
    import tpu_ray.models.path_tracer as pt
    orig = pt.trace_rays
    monkeypatch.setattr(
        pt, "trace_rays",
        lambda *a, **k: orig(*a, **{**k, "sort_rays": False}))
    jax.clear_caches()     # see _isolate_jit_cache
    got_img, got_rays = render_pass(scene, default_camera(scene),
                                    backend="fused", regen=True, **kw)
    assert int(ref_rays) == int(got_rays)
    np.testing.assert_array_equal(np.asarray(ref_img), np.asarray(got_img))


def test_sorted_bounces_match(monkeypatch):
    """The direction-sorted secondary-bounce wavefront (the streaming
    route's default) matches the unsorted trace: rays EXACTLY (integer
    counter, permutation-invariant), radiance to the ~1-ulp
    cross-program contraction class."""
    from tpu_ray.kernels import bounce_step
    from tpu_ray.models.path_tracer import render_pass

    scene = make_trimesh_scene(subdivisions=1)
    kw = dict(width=32, height=16, spp=1, sample_start=0, max_bounces=3)
    monkeypatch.setattr(bounce_step, "resident_tables_fit",
                        lambda n, m: False)
    jax.clear_caches()     # see _isolate_jit_cache
    a_img, a_rays = render_pass(scene, default_camera(scene),
                                backend="jnp", **kw)   # auto: sorted
    import tpu_ray.models.path_tracer as pt
    orig = pt.trace_rays
    monkeypatch.setattr(
        pt, "trace_rays",
        lambda *a, **k: orig(*a, **{**k, "sort_rays": False}))
    jax.clear_caches()     # the sorted a_img primed this same signature
    b_img, b_rays = render_pass(scene, default_camera(scene),
                                backend="jnp", **kw)
    assert int(a_rays) == int(b_rays)
    np.testing.assert_allclose(np.asarray(a_img), np.asarray(b_img),
                               rtol=1e-6, atol=1e-6)


def _grads(scene, cam, monkeypatch_sort_off=None, **kw):
    from tpu_ray.grad import image_mse, render_mean
    target = jnp.zeros((kw["height"], kw["width"], 3), jnp.float32)

    def loss(s, c):
        return image_mse(render_mean(s, c, **kw), target)

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(scene, cam)


def _assert_grad_trees_close(got, ref, rtol, atol_scale=1e-6):
    flat_g, _ = jax.tree_util.tree_flatten(got)
    flat_r, _ = jax.tree_util.tree_flatten(ref)
    assert len(flat_g) == len(flat_r)
    nonzero = 0
    for a, b in zip(flat_g, flat_r):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol_scale * max(1e-30, np.abs(b).max()))
        nonzero += float(np.abs(b).sum()) > 0
    assert nonzero >= 4, "grad parity is vacuous — too many zero leaves"


def test_stream_grads_match_resident_route(monkeypatch):
    """Gradient parity PAST the residency cliff (the route's flagship
    capability — the reference cannot differentiate at all, and r4 shipped
    the streaming search forward-only): jax.grad of render_mean through
    the auto-routed stream search must match the resident jnp route on
    the same geometry. Gradients flow through the O(R) payload recompute
    (tri_payload) from the stream kernel's winners, which are bit-identical
    to the resident sweep on CPU — so with the sort disabled the
    gradients agree to roundoff. Uses the production remat='save_hits'
    policy (the bench fwd+bwd config)."""
    from tpu_ray.kernels import bounce_step
    import tpu_ray.models.path_tracer as pt

    scene = make_trimesh_scene(subdivisions=1)
    cam = default_camera(scene)
    kw = dict(width=32, height=16, spp=1, max_bounces=3,
              remat="save_hits")
    ref = _grads(scene, cam, backend="jnp", **kw)

    monkeypatch.setattr(bounce_step, "resident_tables_fit",
                        lambda n, m: False)
    orig = pt.trace_rays
    monkeypatch.setattr(
        pt, "trace_rays",
        lambda *a, **k: orig(*a, **{**k, "sort_rays": False}))
    got = _grads(scene, cam, backend="fused", regen=True, **kw)
    _assert_grad_trees_close(got, ref, rtol=1e-5)


def test_stream_grads_with_sorted_bounces(monkeypatch):
    """Same parity with the sorted-bounce wavefront ACTIVE (the streaming
    route's default): every differentiable carried value rides the
    per-bounce argsort permutation, so reverse-mode transposes the
    gathers — this pins that the permutation chain is
    gradient-transparent (value-preserving permutation => same gradients
    up to the usual cross-program contraction class)."""
    from tpu_ray.kernels import bounce_step

    scene = make_trimesh_scene(subdivisions=1)
    cam = default_camera(scene)
    kw = dict(width=32, height=16, spp=1, max_bounces=3,
              remat="save_hits")
    ref = _grads(scene, cam, backend="jnp", **kw)

    monkeypatch.setattr(bounce_step, "resident_tables_fit",
                        lambda n, m: False)
    got = _grads(scene, cam, backend="fused", regen=True, **kw)
    _assert_grad_trees_close(got, ref, rtol=1e-4, atol_scale=1e-5)


def test_bigmesh_scene_past_cliff():
    from tpu_ray.kernels.bounce_step import resident_tables_fit
    scene = make_scene("bigmesh")
    assert scene.tris.n_pad >= 100_000
    assert not resident_tables_fit(scene.n_pad, scene.tris.n_pad)


def test_obj_cliff_warning(tmp_path):
    # a generated icosphere OBJ past the cliff must warn about the
    # streaming route (core/scene.make_obj_scene)
    from tpu_ray.core.trimesh import icosphere
    from tpu_ray.core.scene import make_obj_scene
    v, f = icosphere(5)                  # 20480 faces > ~13k cliff
    p = tmp_path / "big.obj"
    with open(p, "w") as fh:
        for x, y, z in np.asarray(v):
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in np.asarray(f) + 1:
            fh.write(f"f {a} {b} {c}\n")
    with pytest.warns(UserWarning, match="streaming"):
        scene = make_obj_scene(str(p))
    assert scene.tris.n_pad > 20000
