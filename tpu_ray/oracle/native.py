"""ctypes binding + on-demand build of the native C++ oracle.

src/native/oracle.cpp is the compiled counterpart of cpu_oracle.py (same
algorithm, same f32 op order, same counter RNG): ~1000x faster, so parity
tests can oracle full frames instead of 64x64 crops. Built lazily with g++
(-O2 -ffp-contract=off: no FMA contraction, keeping results bit-comparable
with NumPy) into tpu_ray/oracle/_build/.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from tpu_ray.core.scene import Scene

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                    "src", "native", "oracle.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "liboracle.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.abspath(_SRC)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", "-ffp-contract=off", "-fPIC", "-shared",
               "-std=c++17", "-pthread", src, "-o", _LIB_PATH + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
    return _LIB_PATH


def _load():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.oracle_render_pass.restype = ctypes.c_uint64
            lib.oracle_render_pass.argtypes = [
                f32p, f32p, f32p, f32p, f32p, f32p,          # scene arrays
                ctypes.c_int, ctypes.c_int,                  # n, use_sky
                f32p, f32p, f32p, f32p, f32p, f32p, f32p,    # triangle soup
                ctypes.c_int,                                # n_tris
                f32p, f32p,                                  # cam_pos, look_at
                ctypes.c_int, ctypes.c_int, ctypes.c_int,    # W, H, spp
                ctypes.c_int, ctypes.c_uint32, ctypes.c_int,  # start, seed, mb
                ctypes.c_int,                                # n_threads
                f32p,                                        # out_image
            ]
            _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


class NativeOracle:
    """Same API as CpuOracle, backed by the C++ library."""

    def __init__(self, scene: Scene, n_threads: int = 0):
        self._arrays = {
            name: np.ascontiguousarray(np.asarray(getattr(scene, name),
                                                  np.float32))
            for name in ("center", "radius", "albedo", "emissive",
                         "specular", "ior")
        }
        self.n = int(scene.n_pad)
        self.use_sky = bool(scene.use_sky)
        self.m = 0
        self._tri_arrays = None
        if scene.tris is not None:
            t = scene.tris
            self._tri_arrays = [
                np.ascontiguousarray(np.asarray(x, np.float32))
                for x in (t.v0, t.e1, t.e2, t.albedo, t.emissive,
                          t.specular, t.ior)]
            self.m = int(t.n_pad)
        self.n_threads = n_threads
        self._lib = _load()

    def render_pass(self, camera_position, look_at, width: int, height: int,
                    spp: int = 1, sample_start: int = 0, seed: int = 0,
                    max_bounces: int = 5) -> Tuple[np.ndarray, int]:
        """-> (image_sum [H,W,3] f32 summed over spp, total rays cast)."""
        pos = np.ascontiguousarray(np.asarray(camera_position, np.float32))
        tgt = np.ascontiguousarray(np.asarray(look_at, np.float32))
        out = np.zeros((height, width, 3), np.float32)

        def p(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

        a = self._arrays
        if self._tri_arrays is not None:
            tp = [p(x) for x in self._tri_arrays]
        else:
            null = ctypes.POINTER(ctypes.c_float)()
            tp = [null] * 7
        rays = self._lib.oracle_render_pass(
            p(a["center"]), p(a["radius"]), p(a["albedo"]), p(a["emissive"]),
            p(a["specular"]), p(a["ior"]), self.n, int(self.use_sky),
            *tp, self.m,
            p(pos), p(tgt), width, height, spp, sample_start,
            seed & 0xFFFFFFFF, max_bounces, self.n_threads, p(out))
        return out, int(rays)
