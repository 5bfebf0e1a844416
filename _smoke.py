import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from tpu_ray import default_camera, make_scene
from tpu_ray.kernels.regen import make_trace_regen, make_regen_trace
from tpu_ray.models.path_tracer import tile_order

w, h, spp = 32, 16, 2
for name in ("rtweekend", "trimesh"):
    scene = make_scene(name)
    cam = default_camera(scene)
    perm, inv = tile_order(w, h)
    px = jnp.asarray(perm)
    run = make_trace_regen(w, h)
    c0, r0 = run(scene, cam, px, spp, 0, 5)
    tr = make_regen_trace(w, h, 0, 5, spp, seg=4)
    c1, r1 = tr(scene, cam, px, 0)
    print(name, "primal match:", bool(jnp.allclose(c0, c1)), int(r0), int(r1))
    # fwd-records path must be bit-identical to the primal
    (c2, r2), _ = jax.vjp(lambda sc: tr(sc, cam, px, 0), scene)
    print(name, "records-fwd match:", float(jnp.abs(c2 - c0).max()), int(r2))
