import dataclasses
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from tpu_ray import default_camera, make_scene
from tpu_ray.kernels.regen import make_regen_trace
from tpu_ray.models.path_tracer import tile_order

w, h, spp = 32, 16, 2
scene = make_scene("rtweekend")
cam = default_camera(scene)
perm, inv = tile_order(w, h)
px = jnp.asarray(perm)
tr = make_regen_trace(w, h, 0, 5, spp, seg=4)
wts = jnp.asarray(np.random.RandomState(0).rand(px.shape[0], 3), jnp.float32)

def loss(scene, cam):
    c, _ = tr(scene, cam, px, 0)
    return jnp.sum(c * wts)

g_scene, g_cam = jax.grad(loss, argnums=(0, 1))(scene, cam)

# FD checks on a few scalar params
def fd(f, x, eps):
    return (f(x + eps) - f(x - eps)) / (2 * eps)

checks = []
# albedo of sphere 3, channel 1
def f_alb(v):
    s2 = dataclasses.replace(scene, albedo=scene.albedo.at[3, 1].set(v))
    return loss(s2, cam)
checks.append(("albedo[3,1]", float(g_scene.albedo[3, 1]),
               float(fd(f_alb, float(scene.albedo[3, 1]), 1e-3))))
# emissive of sphere 0 ch 0
def f_em(v):
    s2 = dataclasses.replace(scene, emissive=scene.emissive.at[0, 0].set(v))
    return loss(s2, cam)
checks.append(("emissive[0,0]", float(g_scene.emissive[0, 0]),
               float(fd(f_em, float(scene.emissive[0, 0]), 1e-3))))
# sphere center y of sphere 1
def f_cy(v):
    s2 = dataclasses.replace(scene, center=scene.center.at[1, 1].set(v))
    return loss(s2, cam)
checks.append(("center[1,1]", float(g_scene.center[1, 1]),
               float(fd(f_cy, float(scene.center[1, 1]), 1e-4))))
# camera position x
def f_px(v):
    c2 = dataclasses.replace(cam, position=cam.position.at[0].set(v))
    return loss(scene, c2)
checks.append(("cam.pos[0]", float(g_cam.position[0]),
               float(fd(f_px, float(cam.position[0]), 1e-4))))
for nm, ad, fdv in checks:
    rel = abs(ad - fdv) / max(1e-6, abs(fdv))
    print(f"{nm}: ad={ad:.6g} fd={fdv:.6g} rel={rel:.3g}")
