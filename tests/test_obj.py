"""Wavefront OBJ loader (core/trimesh.load_obj) + the obj: scene hook.

Beyond-parity capability (the reference has no mesh support, SURVEY.md
'no triangles'): real assets flow into the same padded-SoA triangle
pipeline config 4 benchmarks."""
import numpy as np
import pytest

from tpu_ray.core.scene import make_scene
from tpu_ray.core.trimesh import load_obj

CUBE = """
# comment
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1/1 2/2 3/3 4/4
f 5//1 8//2 7//3 6//4
f 1 5 6 2
f 2 6 7 3
f 3 7 8 4
f -8 -5 -1 -4
"""


@pytest.fixture()
def cube_path(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE)
    return str(p)


def test_load_obj_forms(cube_path):
    v, f = load_obj(cube_path)
    assert v.shape == (8, 3) and v.dtype == np.float32
    # 6 quads fan-triangulated -> 12 triangles, all index forms +
    # negative (relative) indices resolved
    assert f.shape == (12, 3) and f.min() == 0 and f.max() == 7


def test_load_obj_rejects_garbage(tmp_path):
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\n")
    with pytest.raises(ValueError):
        load_obj(str(p))
    p.write_text("v 0 0 0\nf 1 2 3\n")
    with pytest.raises(ValueError):
        load_obj(str(p))                   # face index out of range


def test_obj_scene_renders(cube_path):
    from tpu_ray.core.camera import default_camera
    from tpu_ray.models.path_tracer import render_pass

    scene = make_scene(f"obj:{cube_path}")
    assert scene.tris.n_real == 14         # 12 cube + 2 ground
    assert scene.n_real == 0               # mesh-only: zero real spheres
    img, rays = render_pass(scene, default_camera(scene), width=96,
                            height=54, spp=1, sample_start=0, seed=0,
                            backend="fused", regen=True)
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.mean() > 0.05
    # jnp backend agrees (mesh-only scenes exercise the all-padding
    # sphere table in every backend)
    img2, rays2 = render_pass(scene, default_camera(scene), width=96,
                              height=54, spp=1, sample_start=0, seed=0)
    np.testing.assert_allclose(img, np.asarray(img2), atol=2e-3)
    assert int(rays) == int(rays2)
