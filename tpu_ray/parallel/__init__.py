"""Multi-chip parallelism: device meshes + shard_map'd rendering.

The reference's entire "scheduler + communication backend" is a lock-free
tile work queue over OS threads (reference wasm/wasm.cpp:604-694,
win32/win32.cpp:204-295). The TPU-native replacement (SURVEY.md §2 C6, §5.8)
is a `jax.sharding.Mesh` with static even sharding of the ray wavefront —
the brute-force workload is uniform, so dynamic stealing buys nothing — and
XLA collectives over ICI where the reference used shared-memory atomics.

Axes:
  "rays"    — data parallelism over the [H*W] pixel/ray wavefront.
  "spheres" — optional second axis: each device holds a slice of the sphere
              arrays and computes partial nearest-hit minima; winners are
              selected with an all_gather + argmin (the tensor-parallel
              analogue; SURVEY.md §5.7's "sharding the primitive axis").
"""

from tpu_ray.parallel.mesh import (
    RAY_AXIS,
    SPHERE_AXIS,
    make_mesh,
    scene_pspec,
    shard_scene,
)
from tpu_ray.parallel.render import (
    probe_sphere_sharded,
    render_pass_sharded,
)

__all__ = [
    "RAY_AXIS",
    "SPHERE_AXIS",
    "make_mesh",
    "scene_pspec",
    "shard_scene",
    "probe_sphere_sharded",
    "render_pass_sharded",
]
