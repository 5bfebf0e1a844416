"""shard_map'd progressive render pass.

Maps the reference's tile/thread decomposition (reference main.cpp:824-838 +
wasm/wasm.cpp:604-694) onto a TPU mesh: the flat [H*W] pixel axis is evenly
sharded over the "rays" mesh axis (static sharding replaces the atomic
fetch-add queue — the workload is uniform, SURVEY.md §2 C6), the scene is
replicated (or sharded over "spheres"), and the only collectives are a psum
of the rays-cast stat (reference GetTotalRayCastCount, main.cpp:696-703) and
— in the sphere-sharded probe — an all_gather of per-shard hit minima.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_ray.core.camera import Camera
from tpu_ray.core.scene import Scene
from tpu_ray.models.path_tracer import (
    Payload,
    probe_fn_for_backend,
    render_pixels,
)
from tpu_ray.ops.intersect import hit_payload, nearest_hit_jnp
from tpu_ray.parallel.mesh import RAY_AXIS, SPHERE_AXIS, scene_pspec


def probe_sphere_sharded(scene_local: Scene, origins, directions,
                         axis: str = SPHERE_AXIS, alive=None) -> Payload:
    """Nearest-hit probe when the primitive arrays (spheres AND the
    triangle soup, if any) are sharded over `axis`.

    Each device searches its own primitive slice and computes the
    (differentiable) payload for its local winner — O(R) work — then the
    global winner is selected by an all_gather of per-shard minima + argmin
    over the shard axis. Communication is O(R * payload) and independent of
    scene size: this is the ring-reduce-over-hit-records design from
    SURVEY.md §5.7.

    Tie-breaking matches the reference's argmin-lowest-index rule
    (main.cpp:432-443): shards hold contiguous ascending sphere blocks, so
    (shard, local-argmin) lexicographic order == global lowest index.
    The global primitive-id space is [all shards' spheres | all shards'
    triangles], so ids match the unsharded convention (spheres first).
    """
    hit = nearest_hit_jnp(scene_local.center, scene_local.radius,
                          origins, directions)
    p = hit_payload(scene_local, origins, directions, hit)
    n_local = scene_local.center.shape[0]
    shard = jax.lax.axis_index(axis)
    n_shards = jax.lax.psum(jnp.ones((), jnp.int32), axis)
    # local -> global sphere index (shards hold contiguous ascending blocks)
    p = p._replace(idx=p.idx + shard * n_local)
    t_local = jax.lax.stop_gradient(hit.t)

    if scene_local.tris is not None:
        from tpu_ray.ops.intersect_tri import (merge_payloads,
                                               nearest_hit_tri_jnp,
                                               tri_payload)
        th = nearest_hit_tri_jnp(scene_local.tris, origins, directions)
        tp = tri_payload(scene_local.tris, origins, directions, th)
        m_local = scene_local.tris.n_pad
        # triangle global ids sit after every shard's spheres
        tri_base = n_local * n_shards + shard * m_local
        p = merge_payloads(p, tp, tri_base)
        t_local = jnp.minimum(t_local, jax.lax.stop_gradient(th.t))

    t_all = jax.lax.all_gather(t_local, axis)                       # [S, R]
    win = jnp.argmin(t_all, axis=0)                                 # [R]

    def select(x):
        xs = jax.lax.all_gather(x, axis)  # [S, R, ...]
        w = win.reshape((1,) + win.shape + (1,) * (xs.ndim - 2))
        return jnp.take_along_axis(xs, w, axis=0)[0]

    return Payload(*[select(f) for f in p])


@partial(jax.jit, static_argnames=(
    "mesh", "width", "height", "spp", "max_bounces", "backend", "ray_chunk",
    "seed", "shading", "lights", "exact_argmin", "cull_secondary",
    "regen"))
def render_pass_sharded(scene: Scene, camera: Camera, *, mesh: Mesh,
                        width: int, height: int, spp: int, sample_start,
                        seed: int = 0, max_bounces: int = 5,
                        backend: str = "jnp",
                        ray_chunk: Optional[int] = None,
                        shading: str = "path", lights: tuple = (),
                        exact_argmin: bool = False,
                        cull_secondary: bool = False, regen: bool = False):
    """One progressive pass, sharded over the mesh.

    -> (image_sum [H,W,3] sharded over rows on "rays", rays_cast [] u32
    replicated). Semantically identical to
    tpu_ray.models.path_tracer.render_pass — the sharded-vs-single-chip parity
    test is the analogue of the reference's EnableSIMD A/B oracle.
    """
    n = width * height
    n_ray = mesh.shape[RAY_AXIS]
    assert n % n_ray == 0, (n, n_ray)
    sphere_sharded = SPHERE_AXIS in mesh.axis_names

    assert not regen or backend == "fused", "regen is a fused-backend mode"
    if sphere_sharded:
        n_sph = mesh.shape[SPHERE_AXIS]
        assert scene.n_pad % n_sph == 0, (scene.n_pad, n_sph)
        assert backend != "fused", "fused backend needs the full sphere axis"
        if scene.tris is not None:
            assert scene.tris.n_pad % n_sph == 0, (scene.tris.n_pad, n_sph)
        probe = partial(probe_sphere_sharded, axis=SPHERE_AXIS)
    else:
        probe = probe_fn_for_backend(backend)

    scene_specs = scene_pspec(scene, SPHERE_AXIS if sphere_sharded else None)
    if backend == "fused":
        # tile-major order so the fused kernel's dead-block skip fires
        # (same rationale as the single-chip path); one inverse gather per
        # pass on the sharded output
        from tpu_ray.models.path_tracer import tile_order
        perm, inv = tile_order(width, height)
        pixel = jnp.asarray(perm)
    else:
        inv = None
        pixel = jnp.arange(n, dtype=jnp.int32)
    # light data from the GLOBAL scene, replicated into every shard (a
    # sphere shard may not own the light's row)
    from tpu_ray.ops.shading_modes import scene_light_data
    light_data = scene_light_data(scene, lights)

    def shard_fn(scene_local, camera, pixel_local, sample_start, light_data):
        color_sum, rays = render_pixels(
            scene_local, camera, pixel_local, width=width, height=height,
            spp=spp, sample_start=sample_start, seed=seed,
            max_bounces=max_bounces, probe_fn=probe, ray_chunk=ray_chunk,
            shading=shading, lights=lights, light_data=light_data,
            backend_is_fused=(backend == "fused"),
            exact_argmin=exact_argmin, cull_secondary=cull_secondary,
            regen=regen)
        # regen note: the persistent-wavefront while_loop runs shard-locally
        # with an independent trip count per shard (no collectives inside),
        # so sky-heavy shards simply finish early.
        # rays-cast stat: identical on every sphere shard (the bounce loop is
        # redundantly computed there), so reduce over the ray axis only.
        rays = jax.lax.psum(rays, RAY_AXIS)
        return color_sum, rays

    color_sum, rays = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(scene_specs, P(), P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P()),
        check_vma=False,
    )(scene, camera, pixel, jnp.asarray(sample_start, jnp.uint32),
      light_data)
    if inv is not None:
        from tpu_ray.models.path_tracer import untile_image
        return untile_image(color_sum, width, height, inv), rays
    return color_sum.reshape(height, width, 3), rays
