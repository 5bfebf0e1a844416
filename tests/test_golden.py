"""Golden-image regression guards (SURVEY.md §4: golden hashes per scene).

Goldens are jnp-backend renders at tiny resolution frozen as npz — a pure
DRIFT guard: any change to scenes, RNG, raygen, trace, or shading that
alters output fails here. Oracle anchoring (jnp vs the NumPy/C++ reference
re-execution) is a separate, stronger property covered by
tests/test_forward_parity.py; a regenerated golden is therefore only as
correct as the parity suite that gates it. Regenerate with:
python -m tests.test_golden regen
"""
import os
import sys

import numpy as np
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.models.path_tracer import render_pass

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SCENES = ["rgb", "randomized", "rtweekend"]
W, H = 32, 24


def _render(name):
    scene = make_scene(name)
    cam = default_camera(scene)
    img, rays = render_pass(scene, cam, width=W, height=H, spp=1,
                            sample_start=0, seed=0)
    return np.asarray(img), int(rays)


def _regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in SCENES:
        img, rays = _render(name)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                            image=img, rays=rays)
        print(f"golden {name}: rays={rays}")


@pytest.mark.parametrize("name", SCENES)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip("goldens not generated")
    z = np.load(path)
    img, rays = _render(name)
    assert rays == int(z["rays"]), (rays, int(z["rays"]))
    np.testing.assert_allclose(img, z["image"], rtol=1e-5, atol=1e-6)


if __name__ == "__main__" and "regen" in sys.argv:
    _regen()
