"""tpu_ray: a TPU-native differentiable Monte-Carlo path tracer.

Built from scratch in JAX (jit / shard_map / Pallas) with the capabilities of
the SIMD-Ray-Tracer reference (see SURVEY.md): brute-force progressive
path tracing over sphere scenes, re-architected as a batched ray wavefront
sharded over a TPU device mesh, with exact pixel gradients w.r.t. scene
geometry, materials and camera pose.
"""

from tpu_ray.config import RenderConfig
from tpu_ray.core.scene import (
    Scene,
    SceneBuilder,
    make_rgb_scene,
    make_randomized_scene,
    make_rtweekend_scene,
    make_scene,
    SCENE_BUILDERS,
)
from tpu_ray.core.camera import Camera, orbit_camera, default_camera
from tpu_ray.core.trimesh import Triangles, pack_triangles
from tpu_ray.models.path_tracer import PathTracer

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Scene",
    "SceneBuilder",
    "Camera",
    "PathTracer",
    "Triangles",
    "pack_triangles",
    "make_rgb_scene",
    "make_randomized_scene",
    "make_rtweekend_scene",
    "make_scene",
    "SCENE_BUILDERS",
    "orbit_camera",
    "default_camera",
]
