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
