"""bench.py is the driver's measurement interface — guard its wiring.

A full fused 1080p run needs the TPU; this exercises the script end-to-end
at toy size on the jnp backend (arg parsing, render+grad step, the one-line
JSON contract) plus the speed-of-light model's shape.
"""
import json
import subprocess
import sys


def test_bench_emits_one_json_line(tmp_path):
    # force the CPU platform INSIDE the child: the axon TPU plugin ignores
    # JAX_PLATFORMS, and this test must not touch (or hang on) the tunnel
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "sys.argv = ['bench.py', '--width', '32', '--height', '16', "
            "'--spp', '1', '--iters', '1', '--backend', 'jnp', "
            "'--mode', 'fwd']; exec(open('bench.py').read())")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0 and rec["unit"] == "rays/s"


def test_speed_of_light_model_monotone():
    sys.path.insert(0, ".")
    import bench
    # more primitives -> lower speed of light; bwd adds work
    fwd512 = bench.speed_of_light_rays_per_s(512, "v5e", "fwd")
    fwd1024 = bench.speed_of_light_rays_per_s(1024, "v5e", "fwd")
    both512 = bench.speed_of_light_rays_per_s(512, "v5e", "fwd+bwd")
    assert fwd1024 < fwd512
    assert both512 < fwd512
