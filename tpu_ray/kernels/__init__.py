"""Pallas TPU kernels — the hand-tiled replacements for the reference's SIMD
intrinsics layer (reference x64_math.h / wasm_math.h).

The reference vectorizes one ray against SIMD_WIDTH spheres with masked
blends + horizontal min (reference main.cpp:398-443); here the same search
runs as a VMEM-tiled (ray_block x sphere_block) grid with the dot products
on the MXU and the masked running argmin on the VPU (SURVEY.md §2 C9, C14).
"""

from tpu_ray.kernels.sphere_intersect import nearest_hit_pallas

__all__ = ["nearest_hit_pallas"]
