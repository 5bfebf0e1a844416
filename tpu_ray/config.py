"""Render configuration (the reference's compile-time + runtime flag set).

Replaces reference render_params{ThreadCount, EnableSIMD, SceneIndex}
(base.h:157-161), the HTML control panel (wasm/index.html:170-209) and the
compile-time SIMD_WIDTH/platform macros (base.h:53-79). `backend` is the
EnableSIMD analogue: 'jnp' is the XLA-fused correctness anchor, 'pallas' the
hand-tiled VMEM kernel. ThreadCount has no analogue — within-chip parallelism
is XLA's job; across chips it's the mesh (tpu_ray.parallel).
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    scene: str = "rtweekend"          # 'rgb' | 'randomized' | 'rtweekend'
    width: int = 960                  # reference default: 1280x720 x 0.75
    height: int = 540
    spp: int = 1                      # samples per render pass
    max_bounces: int = 5              # reference main.cpp:387
    backend: str = "jnp"              # 'jnp' | 'pallas' | 'fused' 
    seed: int = 0
    shading: str = "path"             # 'path' | 'flat' | 'lambert_shadow'
    ray_chunk: Optional[int] = None   # split the ray wavefront to bound memory
    exact_srgb: bool = False          # reference ships the sqrt approximation
    exact_argmin: bool = False        # fused backend: bit-stable two-pass
                                      # winner selection (certification mode)
    regen: bool = False               # fused backend, forward-only: the
                                      # persistent-wavefront sample-regen
                                      # kernel (kernels/regen.py)
    cull_secondary: bool = False      # fused backend: octant-split tile
                                      # culling on bounces 1.. (bit-identical;
                                      # win is scene-dependent, measure it)

    def __post_init__(self):
        assert self.backend in ("jnp", "pallas", "fused"), self.backend
        assert self.shading in ("path", "flat", "lambert_shadow"), self.shading
        if self.ray_chunk is not None:
            assert (self.width * self.height) % self.ray_chunk == 0, (
                "ray_chunk must divide width*height")
