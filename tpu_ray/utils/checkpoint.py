"""Checkpoint / resume for progressive rendering and fitting.

The reference's progressive accumulator is an implicit in-memory checkpoint
(PreviousImage + PreviousRayCount, reference main.cpp:484-489, 805-806;
SURVEY.md §5.4). Here it is explicit and durable: (accumulated mean image,
sample count, scene arrays, camera pose, config) round-trip through one npz
file, so any render or optimization can resume exactly where it stopped —
each accumulated pass is a natural resume point.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ray.config import RenderConfig
from tpu_ray.core.camera import Camera
from tpu_ray.core.scene import Scene
from tpu_ray.core.trimesh import Triangles
from tpu_ray.ops.accumulate import AccumState

_SCENE_FIELDS = ("center", "radius", "albedo", "emissive", "specular", "ior",
                 "look_at")
_SCENE_STATIC = ("use_sky", "n_real", "default_distance", "default_x_angle",
                 "default_y_height")
_TRI_FIELDS = ("v0", "e1", "e2", "albedo", "emissive", "specular", "ior")


def save_checkpoint(path: str, state: AccumState, scene: Scene,
                    camera: Camera, config: Optional[RenderConfig] = None,
                    total_rays: int = 0) -> None:
    arrays = {
        "accum_mean": np.asarray(state.mean),
        "accum_samples": np.asarray(state.samples),
        "camera_position": np.asarray(camera.position),
        "camera_look_at": np.asarray(camera.look_at),
        "total_rays": np.asarray(total_rays, np.uint64),
    }
    for f in _SCENE_FIELDS:
        arrays[f"scene_{f}"] = np.asarray(getattr(scene, f))
    meta = {f: getattr(scene, f) for f in _SCENE_STATIC}
    if scene.tris is not None:
        for f in _TRI_FIELDS:
            arrays[f"tri_{f}"] = np.asarray(getattr(scene.tris, f))
        meta["tri_n_real"] = scene.tris.n_real
    if config is not None:
        meta["config"] = dataclasses.asdict(config)
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)  # appends .npz if missing


def load_checkpoint(path: str
                    ) -> Tuple[AccumState, Scene, Camera,
                               Optional[RenderConfig], int]:
    """-> (accum_state, scene, camera, config | None, total_rays)."""
    import os
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"  # np.savez_compressed appended the suffix
    z = np.load(path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    cfg_dict = meta.pop("config", None)
    config = None
    if cfg_dict is not None:
        cfg_dict.pop("mesh_shape", None)  # removed field (old checkpoints)
        config = RenderConfig(**cfg_dict)
    tris = None
    tri_n_real = meta.pop("tri_n_real", None)
    if tri_n_real is not None:
        tris = Triangles(
            **{f: jnp.asarray(z[f"tri_{f}"]) for f in _TRI_FIELDS},
            n_real=int(tri_n_real),
        )
    scene = Scene(
        **{f: jnp.asarray(z[f"scene_{f}"]) for f in _SCENE_FIELDS},
        tris=tris,
        **meta,
    )
    camera = Camera(position=jnp.asarray(z["camera_position"]),
                    look_at=jnp.asarray(z["camera_look_at"]))
    state = AccumState(mean=jnp.asarray(z["accum_mean"]),
                      samples=jnp.asarray(z["accum_samples"]))
    return state, scene, camera, config, int(z["total_rays"])
