"""Independent gradient oracle: central differences through the NATIVE C++
oracle vs reverse-mode AD (BASELINE.md: "pixel-gradient parity ... vs
reference re-execution").

The C++ oracle (src/native/oracle.cpp) is an independently-written
re-execution of the reference scalar tracer (reference main.cpp:497-640) —
different code, same algorithm, same counter RNG. Matching AD against
finite differences through IT (not through the jnp implementation being
differentiated) would catch a systematic estimator bug shared by every jnp
path.

Estimator semantics (grad/__init__, SURVEY.md §7 "Gradients through
discreteness"): AD computes the INTERIOR gradient — discrete choices (hit
selection, refract-vs-reflect) are held fixed — while a raw finite
difference also picks up boundary terms wherever a perturbation flips a
winner (silhouettes). Material/emissive parameters never move boundaries,
so raw FD must match. Geometry/camera parameters do, so those are compared
on the SMOOTH pixel set: pixels whose oracle radiance moves O(eps) inside
the stencil (discontinuous pixels jump O(1), independent of eps) — on that
set AD and FD agree or the payload-recompute gradient is wrong.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.grad import render_mean
from tpu_ray.oracle.native import NativeOracle, native_available

W = H = 64
SPP = 2

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native oracle unavailable")


@pytest.fixture(scope="module")
def setup():
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    target = np.zeros((H, W, 3), np.float32)
    return scene, cam, target


def _oracle_image(scene, cam_pos, look_at):
    img_sum, _ = NativeOracle(scene).render_pass(
        cam_pos, look_at, W, H, spp=SPP, sample_start=0, seed=0)
    return img_sum.astype(np.float64) / SPP


def _masked_mse(img, target, mask):
    return float(np.sum(mask[..., None] * (img - target) ** 2)
                 / (3 * mask.sum()))


def _jnp_image(scene, cam):
    img = render_mean(scene, cam, width=W, height=H, spp=SPP, backend="jnp")
    return np.asarray(img).astype(np.float64)


def _fd_and_mask(scene_p, scene_m, cam_p, cam_m, cam, target, eps):
    """Central differences of the mask-restricted MSE through BOTH the
    native oracle and the jnp renderer, + the smooth-pixel mask (pixels
    whose radiance moved O(eps), not O(1), inside the stencil)."""
    look_at = cam.look_at
    ip = _oracle_image(scene_p, cam_p, look_at)
    im = _oracle_image(scene_m, cam_m, look_at)
    camj_p = dataclasses.replace(cam, position=jnp.asarray(
        cam_p, jnp.float32))
    camj_m = dataclasses.replace(cam, position=jnp.asarray(
        cam_m, jnp.float32))
    jp = _jnp_image(scene_p, camj_p)
    jm = _jnp_image(scene_m, camj_m)
    # a near-tie pixel can flip at slightly different parameter values in
    # the two f32 implementations — smooth means smooth in BOTH
    jump = np.maximum(np.abs(ip - im).max(axis=-1),
                      np.abs(jp - jm).max(axis=-1))
    mask = jump < 10.0 * eps           # discontinuous pixels jump O(1)
    assert mask.mean() > 0.6, mask.mean()
    fd_o = (_masked_mse(ip, target, mask) - _masked_mse(im, target, mask)) \
        / (2 * eps)
    fd_j = (_masked_mse(jp, target, mask) - _masked_mse(jm, target, mask)) \
        / (2 * eps)
    return fd_o, fd_j, mask


def _ad_grad(scene, cam, target, mask, backend):
    maskj = jnp.asarray(mask, jnp.float32)

    def loss(s, c):
        img = render_mean(s, c, width=W, height=H, spp=SPP, backend=backend)
        return jnp.sum(maskj[..., None] * (img - jnp.asarray(target)) ** 2) \
            / (3 * maskj.sum())

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(scene, cam)


@pytest.mark.parametrize("backend", ["jnp", "fused"])
def test_material_ad_matches_native_fd(setup, backend):
    # material params move no boundaries: raw (unmasked) FD must match AD
    scene, cam, target = setup
    full = np.ones((H, W), bool)
    gs, _ = _ad_grad(scene, cam, target, full, backend)
    eps = 2e-3
    for field, index in [("albedo", (0, 0)), ("albedo", (0, 2)),
                         ("emissive", (0, 0)), ("specular", (4,))]:
        base = np.asarray(getattr(scene, field))
        basis = np.zeros_like(base)
        basis[index] = 1.0
        sp = dataclasses.replace(scene, **{field: jnp.asarray(
            base + eps * basis)})
        sm = dataclasses.replace(scene, **{field: jnp.asarray(
            base - eps * basis)})
        ip = _oracle_image(sp, cam.position, cam.look_at)
        im = _oracle_image(sm, cam.position, cam.look_at)
        fd = (_masked_mse(ip, target, full) - _masked_mse(im, target, full)) \
            / (2 * eps)
        ad = float(np.asarray(getattr(gs, field))[index])
        assert abs(fd - ad) < 1e-4 + 0.05 * abs(fd), (field, index, fd, ad)


@pytest.mark.parametrize("backend", ["jnp", "fused"])
def test_geometry_ad_matches_native_fd(setup, backend):
    """Two-part check for boundary-moving parameters:
    (a) oracle-FD == jnp-FD tightly — the jnp forward responds to geometry
        perturbations exactly like the independent C++ re-execution (this
        is what an estimator bug shared by all jnp paths would break);
    (b) AD within a loose band of the masked FD — the interior gradient
        tracks the smooth-pixel derivative up to residual boundary
        contamination from partially-discontinuous pixels in the band
        between O(eps) and the 10*eps mask threshold."""
    scene, cam, target = setup
    eps = 1e-3
    # ground-sphere height & radius, a grid sphere's center — the payload
    # recompute path (t, hit point, normal) w.r.t. geometry
    for field, index in [("center", (0, 1)), ("radius", (0,)),
                         ("center", (2, 0))]:
        base = np.asarray(getattr(scene, field))
        basis = np.zeros_like(base)
        basis[index] = 1.0
        sp = dataclasses.replace(scene, **{field: jnp.asarray(
            base + eps * basis)})
        sm = dataclasses.replace(scene, **{field: jnp.asarray(
            base - eps * basis)})
        fd_o, fd_j, mask = _fd_and_mask(sp, sm, cam.position, cam.position,
                                        cam, target, eps)
        assert abs(fd_o - fd_j) < 1e-4 + 0.03 * abs(fd_o), \
            (field, index, fd_o, fd_j)
        gs, _ = _ad_grad(scene, cam, target, mask, backend)
        ad = float(np.asarray(getattr(gs, field))[index])
        assert abs(fd_o - ad) < 3e-3 + 0.6 * abs(fd_o), \
            (field, index, fd_o, ad)


def test_camera_ad_matches_native_fd(setup):
    scene, cam, target = setup
    pos = np.asarray(cam.position)
    eps = 1e-3
    for axis in range(3):
        basis = np.zeros(3, np.float32)
        basis[axis] = 1.0
        fd_o, fd_j, mask = _fd_and_mask(scene, scene, pos + eps * basis,
                                        pos - eps * basis, cam, target, eps)
        assert abs(fd_o - fd_j) < 1e-4 + 0.03 * abs(fd_o), (axis, fd_o, fd_j)
        _, gc = _ad_grad(scene, cam, target, mask, "jnp")
        ad = float(np.asarray(gc.position)[axis])
        assert abs(fd_o - ad) < 3e-3 + 0.6 * abs(fd_o), (axis, fd_o, ad)


@pytest.mark.parametrize("backend", ["jnp", "fused"])
def test_triangle_params_ad_matches_native_fd(backend):
    """Round-2 extension of the independent gradient oracle to triangle
    soups: per-face albedo (moves no boundaries: raw FD == AD) and a
    vertex coordinate (boundary-moving: oracle-FD == jnp-FD tightly on
    the smooth mask, AD within the loose interior band — same two-part
    contract as test_geometry_ad_matches_native_fd)."""
    from tpu_ray.core.scene import make_trimesh_scene
    scene = make_trimesh_scene(subdivisions=2)
    cam = default_camera(scene)
    target = np.zeros((H, W, 3), np.float32)
    full = np.ones((H, W), bool)

    # (1) per-face albedo of a mesh face: raw FD vs AD
    gs, _ = _ad_grad(scene, cam, target, full, backend)
    eps = 2e-3
    base = np.asarray(scene.tris.albedo)
    face = 7
    basis = np.zeros_like(base)
    basis[face, 1] = 1.0
    tp = dataclasses.replace(scene.tris, albedo=jnp.asarray(base + eps * basis))
    tm = dataclasses.replace(scene.tris, albedo=jnp.asarray(base - eps * basis))
    ip = _oracle_image(dataclasses.replace(scene, tris=tp),
                       cam.position, cam.look_at)
    im = _oracle_image(dataclasses.replace(scene, tris=tm),
                       cam.position, cam.look_at)
    fd = (_masked_mse(ip, target, full) - _masked_mse(im, target, full)) \
        / (2 * eps)
    ad = float(np.asarray(gs.tris.albedo)[face, 1])
    assert abs(fd - ad) < 1e-4 + 0.05 * abs(fd), (backend, fd, ad)

    # (2) a vertex coordinate (v0.y of the same face)
    eps = 1e-3
    base = np.asarray(scene.tris.v0)
    basis = np.zeros_like(base)
    basis[face, 1] = 1.0
    tp = dataclasses.replace(scene.tris, v0=jnp.asarray(base + eps * basis))
    tm = dataclasses.replace(scene.tris, v0=jnp.asarray(base - eps * basis))
    sp = dataclasses.replace(scene, tris=tp)
    sm = dataclasses.replace(scene, tris=tm)
    fd_o, fd_j, mask = _fd_and_mask(sp, sm, cam.position, cam.position,
                                    cam, target, eps)
    assert abs(fd_o - fd_j) < 1e-4 + 0.03 * abs(fd_o), (fd_o, fd_j)
    gs, _ = _ad_grad(scene, cam, target, mask, backend)
    ad = float(np.asarray(gs.tris.v0)[face, 1])
    assert abs(fd_o - ad) < 3e-3 + 0.6 * abs(fd_o), (backend, fd_o, ad)
