"""Mesh construction + scene sharding specs.

Replaces reference WorkQueueCreate (wasm/wasm.cpp:651-666,
win32/win32.cpp:242-266): instead of spawning N worker threads, we lay the
devices out in a 1-2D logical mesh and let pjit/shard_map place the work.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ray.core.scene import Scene

RAY_AXIS = "rays"
SPHERE_AXIS = "spheres"


def make_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("rays",) or ("rays", "spheres") mesh.

    mesh_shape () or None -> 1D mesh over all devices; (r,) -> 1D over r
    devices; (r, s) -> 2D rays x spheres.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),)
    n = int(np.prod(mesh_shape))
    assert n <= len(devices), (mesh_shape, len(devices))
    arr = np.array(devices[:n]).reshape(mesh_shape)
    names = (RAY_AXIS,) if arr.ndim == 1 else (RAY_AXIS, SPHERE_AXIS)
    assert arr.ndim <= 2, "mesh is (rays,) or (rays, spheres)"
    return Mesh(arr, names)


def scene_pspec(scene: Scene, sphere_axis: Optional[str]) -> Scene:
    """PartitionSpec pytree matching `scene`'s structure.

    The per-sphere arrays AND the triangle soup shard over `sphere_axis`
    (a generic primitive axis; or replicate when None); everything else
    (look_at, camera defaults) replicates. The scene is tiny, so full
    replication is the default — primitive sharding exists for the
    huge-scene regime (SURVEY.md §5.7).
    """
    # explicit by field name (NOT by leading-dim shape matching, which would
    # mis-shard a triangle array whose padded length collides with n_pad)
    sharded = P(sphere_axis) if sphere_axis else P()
    replicated = jax.tree_util.tree_map(lambda _: P(), scene)
    out = dataclasses.replace(
        replicated,
        **{f: sharded for f in ("center", "radius", "albedo", "emissive",
                                "specular", "ior")})
    if scene.tris is not None:
        tris = dataclasses.replace(
            replicated.tris,
            **{f: sharded for f in ("v0", "e1", "e2", "albedo", "emissive",
                                    "specular", "ior")})
        out = dataclasses.replace(out, tris=tris)
    return out


def shard_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place scene arrays on the mesh per `scene_pspec`."""
    sphere_axis = SPHERE_AXIS if SPHERE_AXIS in mesh.axis_names else None
    specs = scene_pspec(scene, sphere_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), scene, specs)
