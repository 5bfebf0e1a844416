"""CLI smoke tests (the reference's UI layer equivalent, SURVEY.md §2 C20)."""
import numpy as np

from tpu_ray.cli import main


def test_scenes_lists_three(capsys):
    assert main(["scenes"]) == 0
    out = capsys.readouterr().out
    assert "rgb" in out and "randomized" in out and "rtweekend" in out


def test_render_writes_png_and_checkpoint(tmp_path):
    out = str(tmp_path / "o.png")
    ck = str(tmp_path / "c.npz")
    met = str(tmp_path / "m.jsonl")
    rc = main(["render", "--scene", "rgb", "--width", "32", "--height", "16",
               "--spp", "1", "--passes", "2", "--out", out,
               "--checkpoint", ck, "--metrics", met])
    assert rc == 0
    assert open(out, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    lines = open(met).read().strip().splitlines()
    assert len(lines) == 2

    # resume doubles accumulated samples
    out2 = str(tmp_path / "o2.png")
    rc = main(["render", "--resume", ck, "--passes", "1", "--out", out2])
    assert rc == 0


def test_render_sharded_matches_single(tmp_path):
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    for out, mesh in [(a, None), (b, "4x2")]:
        args = ["render", "--scene", "rgb", "--width", "32", "--height", "16",
                "--spp", "1", "--out", out]
        if mesh:
            args += ["--mesh", mesh]
        assert main(args) == 0
    assert open(a, "rb").read() == open(b, "rb").read()


def test_animate_writes_frames(tmp_path):
    out = str(tmp_path / "frames")
    rc = main(["animate", "--scene", "rgb", "--width", "32", "--height", "16",
               "--spp", "1", "--frames", "2", "--out-dir", out])
    assert rc == 0
    import os
    names = sorted(os.listdir(out))
    assert names == ["frame_0000.png", "frame_0001.png"]
    # different orbit angles -> different images
    a = open(os.path.join(out, names[0]), "rb").read()
    b = open(os.path.join(out, names[1]), "rb").read()
    assert a != b


def test_unknown_flag_rejected():
    import pytest
    with pytest.raises(SystemExit) as e:
        main(["render", "--sspp", "4", "--out", "/dev/null"])
    assert e.value.code == 2


def test_fit_reduces_loss_and_reports_recovery(tmp_path):
    import json
    out = str(tmp_path / "fit.png")
    met = str(tmp_path / "fit.jsonl")
    rc = main(["fit", "--scene", "rtweekend", "--width", "64", "--height",
               "36", "--spp", "1", "--steps", "25", "--lr", "0.05",
               "--out", out, "--metrics", met])
    assert rc == 0
    assert open(out, "rb").read(8) == b"\x89PNG\r\n\x1a\n"
    rows = [json.loads(l) for l in open(met)]
    losses = [r["loss"] for r in rows if "loss" in r]
    recov = [r for r in rows if "d_center" in r]
    assert len(losses) == 25
    assert losses[-1] < 0.3 * losses[0]    # optimizer actually descends
    assert len(recov) == 2                 # before + after parameter errors
    assert all(np.isfinite(v) for r in recov
               for k, v in r.items() if k.startswith("d_"))
    # PARAMETER-space recovery, not just image loss: albedo error shrinks
    # (geometry frozen at truth by design — see cmd_fit docstring)
    assert recov[1]["d_albedo"] < 0.75 * recov[0]["d_albedo"], recov
    assert recov[1]["d_center"] == 0.0


def test_render_knobs_reach_render_pass(tmp_path, monkeypatch):
    # regression: the CLI once built its render kwargs without
    # exact_argmin/cull_secondary/regen, silently ignoring those flags —
    # capture what cmd_render actually passes down
    import tpu_ray.models.path_tracer as pt
    seen = {}
    orig = pt.render_pass

    def spy(*a, **kw):
        seen.update(kw)
        return orig(*a, **kw)

    monkeypatch.setattr("tpu_ray.cli.render_pass", spy, raising=False)
    # cli imports render_pass locally inside cmd_render, so patch the source
    monkeypatch.setattr(pt, "render_pass", spy)
    out = str(tmp_path / "k.png")
    rc = main(["render", "--scene", "rgb", "--width", "32", "--height", "16",
               "--spp", "1", "--backend", "fused", "--regen",
               "--exact-argmin", "--out", out])
    assert rc == 0
    assert seen.get("regen") is True
    assert seen.get("exact_argmin") is True
