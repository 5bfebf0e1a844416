"""Differentiability tests (SURVEY.md §4: check_grads / finite differences on
tiny scenes; BASELINE.json: pixel-gradient parity).

Finite-difference checks run on quantities that are smooth at the test point:
material gradients (exact polynomials in albedo/emissive) and the hit-payload
geometry path. Sharded-vs-single gradient parity covers the collective
transpose path (psum of scene/camera cotangents)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.grad import image_mse, make_train_step, render_mean, render_mean_sharded
from tpu_ray.parallel import make_mesh, shard_scene

W = H = 16
KW = dict(width=W, height=H, spp=1)


@pytest.fixture(scope="module")
def rtw():
    scene = make_scene("rtweekend")
    return scene, default_camera(scene)


def _loss(scene, cam, target):
    return image_mse(render_mean(scene, cam, **KW), target)


def test_material_grads_match_finite_difference(rtw):
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    g = jax.jit(jax.grad(_loss))(scene, cam, target)

    # FD on the ground sphere's albedo red channel (index 0): radiance is a
    # polynomial in albedo, so central differences converge fast.
    f = jax.jit(lambda s: _loss(s, cam, target))
    eps = 1e-3
    for idx in [0, 2]:
        basis = np.zeros_like(np.asarray(scene.albedo))
        basis[idx, 0] = 1.0
        import dataclasses
        sp = dataclasses.replace(scene, albedo=scene.albedo + eps * basis)
        sm = dataclasses.replace(scene, albedo=scene.albedo - eps * basis)
        fd = (float(f(sp)) - float(f(sm))) / (2 * eps)
        ad = float(g.albedo[idx, 0])
        assert abs(fd - ad) < 1e-4 + 0.05 * abs(fd), (idx, fd, ad)


def test_geometry_and_camera_grads_nonzero(rtw):
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    gs, gc = jax.jit(jax.grad(_loss, argnums=(0, 1)))(scene, cam, target)
    assert float(jnp.linalg.norm(gs.center)) > 0
    assert float(jnp.linalg.norm(gs.radius)) > 0
    assert float(jnp.linalg.norm(gc.position)) > 0
    for leaf in jax.tree_util.tree_leaves((gs, gc)):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("mesh_shape", [(8,), (4, 2)])
def test_sharded_grads_match_single(rtw, mesh_shape):
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    gs0, gc0 = jax.jit(jax.grad(_loss, argnums=(0, 1)))(scene, cam, target)

    mesh = make_mesh(mesh_shape)
    s = shard_scene(scene, mesh)

    def loss_sh(scene, cam):
        return image_mse(
            render_mean_sharded(scene, cam, mesh=mesh, **KW), target)

    gs, gc = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(s, cam)
    for a, b in [(gs.center, gs0.center), (gs.radius, gs0.radius),
                 (gs.albedo, gs0.albedo), (gc.position, gc0.position)]:
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-4,
                                   atol=1e-6 * max(1e-30, np.abs(b).max()))


def test_train_step_reduces_loss():
    # inverse rendering: recover perturbed emissive from a rendered target
    import dataclasses
    scene = make_scene("rgb")
    cam = default_camera(scene)
    target = render_mean(scene, cam, **KW)

    import optax
    perturbed = dataclasses.replace(scene, emissive=scene.emissive * 0.5)
    init_fn, step_fn = make_train_step(width=W, height=H, spp=1,
                                       train_camera=False,
                                       fixed_samples=True,
                                       optimizer=optax.adam(0.1))
    state = init_fn(perturbed, cam)
    state, loss0 = step_fn(state, target)
    for _ in range(25):
        state, loss = step_fn(state, target)
    assert float(loss) < 0.5 * float(loss0), (float(loss0), float(loss))


def test_camera_pose_fit():
    # BASELINE config 3: camera-pose gradients drive the pose back toward
    # the target view (sixtyfour scene, perturbed orbit angle)
    import optax
    from tpu_ray import orbit_camera
    scene = make_scene("sixtyfour")
    cam_true = default_camera(scene)
    target = render_mean(scene, cam_true, **KW)

    cam0 = orbit_camera(scene.look_at, scene.default_distance,
                        scene.default_x_angle + 0.03,
                        scene.default_y_height)
    init_fn, step_fn = make_train_step(width=W, height=H, spp=1,
                                       fixed_samples=True, train_camera=True,
                                       train_scene=False,
                                       optimizer=optax.adam(1e-3))
    state = init_fn(scene, cam0)
    state, loss0 = step_fn(state, target)
    best = float(loss0)
    for _ in range(30):
        state, loss = step_fn(state, target)
        best = min(best, float(loss))
    assert best < 0.8 * float(loss0), (float(loss0), best)


# --- remat / checkpoint-policy gradient equality -------------------------
# The headline benchmark (bench.py) and cmd_fit run with remat enabled
# ('save_hits' and True respectively); these tests pin every remat mode —
# including the named-checkpoint plumbing in models.path_tracer._name_hit —
# to the remat=False gradients, the reference-style A/B oracle discipline
# (reference main.cpp:853) applied to the checkpoint machinery.

def _grads(scene, cam, target, **kw):
    def loss(s, c):
        return image_mse(render_mean(s, c, **KW, **kw), target)
    return jax.jit(jax.grad(loss, argnums=(0, 1)))(scene, cam)


def _assert_grads_close(g, g0, rtol=1e-4):
    la, lb = jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g0)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=rtol, atol=1e-7 + 1e-5 * max(1e-30, np.abs(b).max()))


@pytest.mark.parametrize("remat", [True, "save_hits", "save_hits_bounce"])
def test_remat_grads_match_no_remat(rtw, remat):
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    g0 = _grads(scene, cam, target, remat=False)
    g = _grads(scene, cam, target, remat=remat)
    _assert_grads_close(g, g0)


def test_save_hits_grads_with_ray_chunk(rtw):
    # the exact headline-bench configuration shape: remat='save_hits' with
    # lax.map ray chunking (bench.py uses ray_chunk=86400 at 1080p)
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    g0 = _grads(scene, cam, target, remat=False)
    g = _grads(scene, cam, target, remat="save_hits", ray_chunk=64)
    _assert_grads_close(g, g0)


def test_save_hits_grads_sharded(rtw):
    scene, cam = rtw
    target = jnp.zeros((H, W, 3), jnp.float32)
    g0 = _grads(scene, cam, target, remat=False)

    mesh = make_mesh((8,))
    s = shard_scene(scene, mesh)

    def loss_sh(scene, cam):
        return image_mse(render_mean_sharded(scene, cam, mesh=mesh,
                                             remat="save_hits", **KW), target)

    gs, gc = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(s, cam)
    _assert_grads_close((gs, gc), g0)


def test_save_hits_grads_trimesh():
    # covers _name_hit on BOTH search paths (sphere + Moller-Trumbore merge)
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)
    g0 = _grads(scene, cam, target, remat=False)
    g = _grads(scene, cam, target, remat="save_hits")
    _assert_grads_close(g, g0)
    assert float(jnp.linalg.norm(g[0].tris.v0)) > 0


def test_fit_remat_step_matches_no_remat():
    # cmd_fit runs make_train_step(remat=True); one optimizer step must be
    # identical to the remat=False step (same grads -> same adam update)
    import optax
    scene = make_scene("rgb")
    cam = default_camera(scene)
    target = render_mean(scene, cam, **KW)
    states = {}
    for remat in (False, True):
        init_fn, step_fn = make_train_step(
            width=W, height=H, spp=1, train_camera=False, fixed_samples=True,
            remat=remat, optimizer=optax.adam(0.1))
        st, loss = step_fn(init_fn(scene, cam), target)
        states[remat] = (st, float(loss))
    assert states[False][1] == pytest.approx(states[True][1], rel=1e-6)
    _assert_grads_close(states[True][0].scene, states[False][0].scene)
