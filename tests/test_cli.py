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
