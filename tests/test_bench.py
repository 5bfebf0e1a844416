"""bench.py smoke: the driver records BENCH_r{N}.json from `python
bench.py`, so a crash there loses the round's headline artifact. Runs the
real script tiny on the test platform (CPU, interpret-mode kernels) for
both modes and both backend families, and checks the JSON contract."""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--iters", "1",
         *args],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])

# CPU is not jax.default_backend() when a TPU plugin is attached, but the
# subprocess pins JAX_PLATFORMS=cpu, so these run anywhere the suite does.


@pytest.mark.parametrize("mode", ["fwd"])
def test_bench_headline_contract(mode):
    # fwd only: a tiny interpret-mode fwd+bwd costs ~8 min of CPU suite
    # time and duplicates test_regen_grad's VJP coverage; the fwd+bwd
    # ROUTING is pinned by the dry-run test below
    row = _run(["--width", "64", "--height", "36", "--spp", "1",
                "--mode", mode])
    for key in ("metric", "value", "unit", "vs_baseline",
                "speed_of_light_rays_per_s", "ns_per_ray"):
        assert key in row, (key, row)
    assert row["unit"] == "rays/s" and row["value"] > 0
    # sphere scenes default to the regen headline backend
    assert row["backend"] == "fused+regen", row["backend"]


def test_bench_default_routing_dry():
    # measured defaults (BASELINE.md r4): regen ON for every fused route
    # — the r4 segment backward (record-derived gather lists, per-block
    # replay bounds) flipped the triangle gradient step too; tri scenes
    # chunk at 43200, sphere scenes at 86400
    row = _run(["--mode", "fwd", "--scene", "trimesh", "--dry-run"])
    assert row["backend"] == "fused+regen", row["backend"]
    assert row["ray_chunk"] == 43200, row["ray_chunk"]
    row = _run(["--mode", "fwd+bwd", "--scene", "trimesh", "--dry-run"])
    assert row["backend"] == "fused+regen", row["backend"]
    row = _run(["--mode", "fwd+bwd", "--dry-run"])
    assert row["backend"] == "fused+regen", row["backend"]
    assert row["ray_chunk"] == 86400, row["ray_chunk"]
    # power-of-two resolutions pick the 65536 slab (BASELINE config 3
    # chunk sweep, r4)
    row = _run(["--mode", "fwd+bwd", "--scene", "sixtyfour",
                "--width", "1024", "--height", "1024", "--spp", "16",
                "--dry-run"])
    assert row["ray_chunk"] == 65536, row["ray_chunk"]


def test_measure_stream_floor_machinery():
    """The streaming route's DMA-aware SoL (bench.measure_stream_floor):
    on a cliff-forced tiny soup the floor must come back positive with
    coherent stats (tiles > 0, GB consistent with the tile count). This
    is the machinery that prices bigmesh's vs_baseline — a silent break
    here makes the round's streaming numbers float without a floor."""
    import argparse

    import jax
    import jax.numpy as jnp

    from tpu_ray import default_camera
    from tpu_ray.core.scene import make_trimesh_scene
    sys.path.insert(0, ROOT)
    import bench
    from tpu_ray.kernels import bounce_step

    scene = make_trimesh_scene(subdivisions=1)
    cam = default_camera(scene)
    args = argparse.Namespace(width=64, height=32, spp=1, max_bounces=3,
                              mode="fwd")
    orig = bounce_step.resident_tables_fit
    bounce_step.resident_tables_fit = lambda n, m: False
    try:
        jax.clear_caches()
        floor, stats = bench.measure_stream_floor(
            scene, cam, args, ray_chunk=None, chip="v5e", stride=1)
    finally:
        bounce_step.resident_tables_fit = orig
        jax.clear_caches()
    assert floor > 0
    tiles = stats["stream_tiles_per_step"]
    assert tiles > 0
    # bytes = tiles * one [4*128,128] bf16 coefficient tile (the record
    # rounds GB to 3 decimals -> allow half a unit-in-last-place)
    assert abs(stats["stream_gb_per_step"] * 1e9
               - tiles * 4 * 128 * 128 * 2) <= 0.5e6 + 1
    assert stats["stream_rays_cast_modeled"] > 0
