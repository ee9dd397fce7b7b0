"""Native C++ library tests (ctypes bindings + numpy fallback agreement)."""
import os
import subprocess

import numpy as np
import pytest

from dgcnn_tpu import native_ext


def test_fps_native_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    # numpy fallback reference (always available)
    n = len(pts)
    dist = np.full(n, np.inf)
    idx_ref = np.empty(16, np.int32)
    cur = 0
    for s in range(16):
        idx_ref[s] = cur
        d = np.sum((pts - pts[cur]) ** 2, axis=1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    got = native_ext.farthest_point_sample(pts, 16, start=0)
    np.testing.assert_array_equal(got, idx_ref)


def test_knn_host_matches_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    idx = native_ext.knn_host(pts, 5)
    d = np.sum((pts[:, None] - pts[None]) ** 2, -1)
    want = np.argsort(d, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx[:, 0], np.arange(64))  # self first
    got_d = np.take_along_axis(d, idx, 1)
    want_d = np.take_along_axis(d, want, 1)
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)


def test_sample_mesh_on_unit_square():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pts = native_ext.sample_mesh(verts, faces, 500, seed=7)
    assert pts.shape == (500, 3)
    assert pts[:, 2].max() == 0.0
    assert pts[:, 0].min() >= 0 and pts[:, 0].max() <= 1
    # roughly uniform: mean near centroid
    np.testing.assert_allclose(pts[:, :2].mean(0), [0.5, 0.5], atol=0.07)


def test_voxel_downsample_dedups():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float32)
    out = native_ext.voxel_downsample(pts, 0.1)
    assert out.shape[0] == 2


@pytest.mark.skipif(not native_ext.available(), reason="native lib not built")
def test_pcsample_cli(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3\nf 1 3 4\n")
    ply = tmp_path / "out.ply"
    binary = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "build", "pcsample")
    subprocess.run(
        [binary, str(obj), str(ply), "-n_samples", "256", "-leaf_size", "0"],
        check=True,
    )
    text = ply.read_text().splitlines()
    assert text[0] == "ply"
    n = int([l for l in text if l.startswith("element vertex")][0].split()[-1])
    assert n == 256
