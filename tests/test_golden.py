"""Golden-image regression guards (SURVEY.md §4: golden hashes per scene).

Goldens are tiny-resolution renders frozen as npz — a pure DRIFT guard: any
change to scenes, RNG, raygen, trace, or shading that alters output fails
here. Round 3 extends them beyond the jnp backend to the FAST backends
under --exact-argmin (bit-stable winner selection by construction), the
standing A/B oracle the reference keeps live as its EnableSIMD toggle
(/root/reference/main.cpp:853): fused (spheres + the trimesh list-sweep
search) and fused+regen (persistent wavefront). Oracle anchoring (jnp vs
the NumPy/C++ reference re-execution) is a separate, stronger property
covered by tests/test_forward_parity.py; a regenerated golden is therefore
only as correct as the parity suite that gates it. Regenerate with:
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

# "objico" renders the committed OBJ fixture through the obj:PATH loader
# (the r3 OBJ surface gets frozen renders too)
_OBJ_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "ico1.obj")

# (tag, scene list, render_pass kwargs). exact_argmin makes the fused
# winner selection bit-stable, so these renders are as deterministic as
# the jnp ones (interpret-mode kernels on the CPU test platform). Every
# (backend, primitive-family) cell with a default route has a frozen
# render: regen is the default fwd route for trimesh AND obj scenes
# since r3/r4 (VERDICT r3 item 7).
BACKENDS = [
    ("jnp", SCENES, {}),
    ("fused-exact", SCENES + ["trimesh", "objico"],
     dict(backend="fused", exact_argmin=True)),
    ("regen-exact", ["rtweekend", "trimesh", "objico"],
     dict(backend="fused", exact_argmin=True, regen=True)),
    # the r4 fused estimator mega-kernel (kernels/simple_shade.py) on its
    # BASELINE config scenes
    # r5: the estimator kernels handle resident triangle soups too
    ("flat-fused-exact", ["single", "trimesh"],
     dict(backend="fused", exact_argmin=True, shading="flat")),
    ("lambert-fused-exact", ["sixteen"],
     dict(backend="fused", exact_argmin=True, shading="lambert_shadow")),
    # r5: lambert+shadow on a MIXED sphere+triangle scene — the
    # estimator kernel's triangle folds, frustum primary lists, AND
    # origin-box shadow lists all drift-guarded in one frozen render
    ("lambert-fused-exact", ["trilight"],
     dict(backend="fused", exact_argmin=True, shading="lambert_shadow")),
    # the r4/r5 HBM-streaming big-mesh route WITH the sorted-bounce
    # wavefront (its default): frozen on a cliff-forced tiny soup so the
    # sorted+streamed output is drift-guarded by the suite, not only by
    # bit-identity vs the full sweep (VERDICT r4 item 3)
    ("stream-sorted", ["trimesh"], dict(_force_stream=True)),
]
CASES = [(tag, name, kw) for tag, names, kw in BACKENDS for name in names]


def _render(name, **kw):
    import jax
    from tpu_ray.kernels import bounce_step
    kw = dict(kw)
    force_stream = kw.pop("_force_stream", False)
    if name == "trilight":
        from tests.test_shading_modes import _tri_light_scene
        scene = _tri_light_scene()
    else:
        scene = make_scene(
            f"obj:{_OBJ_FIXTURE}" if name == "objico" else name)
    if kw.get("shading") == "lambert_shadow":
        from tpu_ray.ops.shading_modes import scene_light_indices
        kw = dict(kw, lights=scene_light_indices(scene))
    cam = default_camera(scene)
    orig_fit = bounce_step.resident_tables_fit
    if force_stream:
        # render_pass is a module-level jit whose cache key does NOT see
        # this patch — clear around it so no same-signature executable
        # leaks in either direction (tests/test_tri_stream.py rationale)
        bounce_step.resident_tables_fit = lambda n, m: False
        jax.clear_caches()
    try:
        img, rays = render_pass(scene, cam, width=W, height=H, spp=1,
                                sample_start=0, seed=0, **kw)
        img, rays = np.asarray(img), int(rays)
    finally:
        if force_stream:
            bounce_step.resident_tables_fit = orig_fit
            jax.clear_caches()
    return img, rays


def _path(tag, name):
    # round-2 jnp goldens keep their original file names
    stem = name if tag == "jnp" else f"{name}-{tag}"
    return os.path.join(GOLDEN_DIR, f"{stem}.npz")


def _regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for tag, name, kw in CASES:
        img, rays = _render(name, **kw)
        np.savez_compressed(_path(tag, name), image=img, rays=rays)
        print(f"golden {name} [{tag}]: rays={rays}")


@pytest.mark.parametrize("tag,name,kw", CASES,
                         ids=[f"{t}-{n}" for t, n, _ in CASES])
def test_golden(tag, name, kw):
    path = _path(tag, name)
    if not os.path.exists(path):
        pytest.skip("goldens not generated")
    z = np.load(path)
    img, rays = _render(name, **kw)
    assert rays == int(z["rays"]), (rays, int(z["rays"]))
    np.testing.assert_allclose(img, z["image"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["rtweekend", "trimesh"])
def test_exact_fused_max_error_vs_jnp(name):
    """MAX-error (not statistical) bound on the certification path: with
    exact_argmin the fused winners are identical to jnp's, so the whole
    residual is shading/search arithmetic (bf16x6 K-stacked matmuls vs
    XLA f32 chains) — small and bounded, with no winner-flip tail."""
    a, ra = _render(name, backend="fused", exact_argmin=True)
    b, rb = _render(name)
    assert ra == rb
    assert np.max(np.abs(a - b)) < 2e-3, np.max(np.abs(a - b))


if __name__ == "__main__" and "regen" in sys.argv:
    # goldens must be generated on the platform the test suite runs on
    # (conftest forces CPU; real-MXU bf16 rounding differs from the CPU
    # emulation, so TPU-generated goldens would not reproduce)
    import jax
    jax.config.update("jax_platforms", "cpu")
    _regen()
