"""Native C++ oracle vs NumPy oracle (SURVEY.md §4 dual-path A/B posture).

The two oracles share the algorithm, f32 op order (-ffp-contract=off), and
counter RNG. Scenes whose dot products NumPy evaluates in the same order as
C++ match bit-for-bit; larger scenes accumulate 1-ulp differences from BLAS
summation order which can flip near-tie winners on a few pixels, so the
statistical bound is: almost all pixels within float roundoff.
"""
import numpy as np
import pytest

from tpu_ray import default_camera, make_scene
from tpu_ray.oracle.cpu_oracle import CpuOracle
from tpu_ray.oracle.native import NativeOracle, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def test_rgb_scene_bitexact():
    scene = make_scene("rgb")
    cam = default_camera(scene)
    img_py, rays_py = CpuOracle(scene).render_pass(
        cam.position, cam.look_at, 32, 32, spp=1)
    img_c, rays_c = NativeOracle(scene).render_pass(
        cam.position, cam.look_at, 32, 32, spp=1)
    assert rays_py == rays_c
    np.testing.assert_array_equal(img_py, img_c)


@pytest.mark.parametrize("name", ["randomized", "rtweekend"])
def test_large_scenes_statistical(name):
    scene = make_scene(name)
    cam = default_camera(scene)
    img_py, rays_py = CpuOracle(scene).render_pass(
        cam.position, cam.look_at, 32, 32, spp=1)
    img_c, rays_c = NativeOracle(scene).render_pass(
        cam.position, cam.look_at, 32, 32, spp=1)
    # rays-cast totals may differ only via near-tie path divergence
    assert abs(rays_py - rays_c) <= 0.01 * rays_py
    diff = np.abs(img_py - img_c).max(axis=-1)
    assert (diff < 1e-5).mean() > 0.95, (diff < 1e-5).mean()
    assert np.median(diff) == 0.0


def test_native_multithreaded_deterministic():
    scene = make_scene("rtweekend")
    cam = default_camera(scene)
    a, ra = NativeOracle(scene, n_threads=1).render_pass(
        cam.position, cam.look_at, 64, 64, spp=2)
    b, rb = NativeOracle(scene, n_threads=8).render_pass(
        cam.position, cam.look_at, 64, 64, spp=2)
    # disjoint tile writes + per-pixel sample order => thread-count invariant
    assert ra == rb
    np.testing.assert_array_equal(a, b)


def test_native_matches_numpy_on_trimesh():
    # the C++ oracle's Möller-Trumbore path vs the NumPy oracle: same
    # algorithm, independently written (branch-order early-outs vs
    # vectorized masks), so agreement pins the triangle semantics from a
    # third direction (jnp/fused/pallas share none of this code)
    from tpu_ray.core.scene import make_trimesh_scene
    from tpu_ray.oracle.cpu_oracle import CpuOracle
    from tpu_ray.oracle.native import NativeOracle, native_available
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    scene = make_trimesh_scene(subdivisions=1)
    from tpu_ray.core.camera import default_camera
    import numpy as np
    cam = default_camera(scene)
    kw = dict(width=24, height=24, spp=1, seed=0)
    a, ra = CpuOracle(scene).render_pass(
        np.asarray(cam.position), np.asarray(cam.look_at), **kw)
    b, rb = NativeOracle(scene, n_threads=2).render_pass(
        np.asarray(cam.position), np.asarray(cam.look_at), **kw)
    assert ra == rb
    match = np.abs(a - b).max(axis=-1) < 1e-6
    assert match.mean() > 0.995, match.mean()
