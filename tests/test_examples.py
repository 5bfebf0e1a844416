"""Smoke tests for examples/ — every script's main() runs at tiny size.

The examples are the library-API documentation (examples/README.md); this
keeps them executable as the framework evolves. Runs under the conftest's
forced-CPU virtual-device platform like every other test.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
TINY = ["--width", "64", "--height", "40", "--spp", "1"]


def _load(name):
    path = os.path.join(EXAMPLES, name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_progressive_render(tmp_path):
    out = str(tmp_path / "r.png")
    state = _load("01_progressive_render").main(
        TINY + ["--scene", "rgb", "--passes", "2", "--out", out])
    assert int(state.samples) == 2
    assert os.path.getsize(out) > 100


def test_custom_scene(tmp_path):
    out = str(tmp_path / "c.png")
    img = _load("02_custom_scene").main(TINY + ["--out", out])
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0.0
    assert os.path.getsize(out) > 100


def test_pixel_gradients():
    # rtweekend (sky on): radiance is continuous in ray direction, so
    # geometry AND camera gradients are nonzero (see the example docstring)
    d_scene, d_camera = _load("03_pixel_gradients").main(
        TINY + ["--scene", "rtweekend"])
    for leaf in (d_scene.albedo, d_scene.center, d_camera.position):
        a = np.asarray(leaf)
        assert np.isfinite(a).all()
        assert np.abs(a).max() > 0.0
    # rgb (no sky): material grads flow, camera grads are the true a.e.
    # derivative of a piecewise-constant radiance = exactly zero
    d_scene, d_camera = _load("03_pixel_gradients").main(
        TINY + ["--scene", "rgb"])
    assert np.abs(np.asarray(d_scene.emissive)).max() > 0.0
    assert np.abs(np.asarray(d_camera.position)).max() == 0.0


def test_inverse_rendering():
    _, err0, err = _load("04_inverse_rendering").main(
        TINY + ["--scene", "rgb", "--steps", "12", "--lr", "0.05"])
    assert err < err0, (err0, err)


def test_sharded_render(tmp_path):
    out = str(tmp_path / "s.png")
    img = _load("05_sharded_render").main(
        ["--width", "64", "--height", "40", "--spp", "1", "--mesh", "2",
         "--out", out])
    assert np.isfinite(np.asarray(img)).all()
    assert os.path.getsize(out) > 100


@pytest.mark.parametrize("backend", ["jnp", "fused"])
def test_triangle_mesh(tmp_path, backend):
    out = str(tmp_path / "t.png")
    img = _load("06_triangle_mesh").main(
        TINY + ["--subdivisions", "1", "--backend", backend, "--out", out])
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.max() > 0.0


@pytest.mark.parametrize("shading", ["flat", "lambert_shadow"])
def test_simple_estimators(tmp_path, shading):
    out = str(tmp_path / "e.png")
    rays = _load("07_simple_estimators").main(
        TINY + ["--scene", "sixteen", "--backend", "fused",
                "--shading", shading, "--out", out])
    n = 64 * 40
    assert rays == n if shading == "flat" else rays > n
    assert os.path.getsize(out) > 100


def test_big_meshes(tmp_path):
    out = str(tmp_path / "b.png")
    # subdivisions=2 keeps the CPU smoke fast; the docstring's past-cliff
    # scale is exercised on TPU (the route is identical — the cliff check
    # only flips which search kernel the probe calls)
    img, gs = _load("08_big_meshes").main(
        TINY + ["--subdivisions", "2", "--grad", "--out", out])
    assert np.isfinite(np.asarray(img)).all()
    assert float(np.abs(np.asarray(gs.tris.v0)).sum()) > 0
    assert os.path.getsize(out) > 100
