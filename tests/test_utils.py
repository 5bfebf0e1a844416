"""Utils: PNG writer round-trip, checkpoint round-trip, metrics logging."""
import io
import json
import zlib

import jax.numpy as jnp
import numpy as np

from tpu_ray import RenderConfig, default_camera, make_scene
from tpu_ray.ops.accumulate import AccumState
from tpu_ray.utils import (MetricsLogger, load_checkpoint, save_checkpoint,
                           write_png)


def _decode_png(path):
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(raw):
        ln = int.from_bytes(raw[pos:pos+4], "big")
        tag = raw[pos+4:pos+8]
        data = raw[pos+8:pos+8+ln]
        crc = int.from_bytes(raw[pos+8+ln:pos+12+ln], "big")
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF
        chunks[tag] = data
        pos += 12 + ln
    w = int.from_bytes(chunks[b"IHDR"][0:4], "big")
    h = int.from_bytes(chunks[b"IHDR"][4:8], "big")
    c = {2: 3, 6: 4}[chunks[b"IHDR"][9]]
    rows = zlib.decompress(chunks[b"IDAT"])
    stride = 1 + w * c
    img = np.zeros((h, w, c), np.uint8)
    for y in range(h):
        assert rows[y*stride] == 0
        img[y] = np.frombuffer(rows[y*stride+1:(y+1)*stride],
                               np.uint8).reshape(w, c)
    return img


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    write_png(path, img)
    np.testing.assert_array_equal(_decode_png(path), img)


def test_checkpoint_roundtrip(tmp_path):
    scene = make_scene("rgb")
    cam = default_camera(scene)
    cfg = RenderConfig(scene="rgb", width=16, height=8, spp=2)
    state = AccumState(mean=jnp.ones((8, 16, 3)) * 0.25,
                       samples=jnp.asarray(6, jnp.int32))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, scene, cam, cfg, total_rays=1234)

    st2, sc2, cam2, cfg2, rays = load_checkpoint(path)
    assert rays == 1234
    assert cfg2 == cfg
    assert int(st2.samples) == 6
    np.testing.assert_array_equal(np.asarray(st2.mean), np.asarray(state.mean))
    np.testing.assert_array_equal(np.asarray(sc2.center),
                                  np.asarray(scene.center))
    assert sc2.use_sky == scene.use_sky and sc2.n_real == scene.n_real
    np.testing.assert_array_equal(np.asarray(cam2.position),
                                  np.asarray(cam.position))


def test_metrics_logger():
    buf = io.StringIO()
    log = MetricsLogger(stream=buf)
    rec = log.log_pass(rays=1_000_000, seconds=0.5, render_pass=3)
    assert rec["rays_per_s"] == 2_000_000.0
    line = json.loads(buf.getvalue().strip())
    assert line["rays_cast"] == 1_000_000 and line["render_pass"] == 3


def test_checkpoint_roundtrip_with_triangles(tmp_path):
    scene = make_scene("trimesh")
    cam = default_camera(scene)
    state = AccumState.zeros(4, 4)
    path = str(tmp_path / "t.npz")
    save_checkpoint(path, state, scene, cam)
    _, sc2, _, _, _ = load_checkpoint(path)
    assert sc2.tris is not None and sc2.tris.n_real == scene.tris.n_real
    np.testing.assert_array_equal(np.asarray(sc2.tris.v0),
                                  np.asarray(scene.tris.v0))
