"""Visualization writer tests: reference artifact formats + filter grammar."""
import os

import numpy as np

from dgcnn_tpu.utils.ply import read_ply, write_ply_xyz, write_ply_xyzrgb
from dgcnn_tpu.utils.visualization import (
    PartSegVisualizer,
    SemSegVisualizer,
    render_legend_partseg,
    render_legend_semseg,
)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyzrgb = np.concatenate(
        [rng.standard_normal((50, 3)),
         rng.integers(0, 256, (50, 3)).astype(float)], 1)
    p = str(tmp_path / "a.ply")
    write_ply_xyzrgb(p, xyzrgb)
    back = read_ply(p)
    np.testing.assert_allclose(back[:, :3], xyzrgb[:, :3], atol=1e-6)
    np.testing.assert_array_equal(back[:, 3:], xyzrgb[:, 3:])

    p2 = str(tmp_path / "b.ply")
    write_ply_xyz(p2, xyzrgb[:, :3], binary=False)
    back2 = read_ply(p2)
    np.testing.assert_allclose(back2, xyzrgb[:, :3], atol=1e-5)


def _fake_batch(rng, b, n, labels):
    data = rng.standard_normal((b, n, 3)).astype(np.float32)
    pred = np.stack([
        rng.integers(0, 4, n) for _ in range(b)
    ])
    seg = pred.copy()
    return data, pred, seg, np.asarray(labels)


def test_partseg_visualizer_filter_and_files(tmp_path):
    rng = np.random.default_rng(1)
    colors = rng.integers(0, 256, (50, 3))
    exp = str(tmp_path / "exp")
    # filter: only airplane index 1
    vis = PartSegVisualizer(exp, "airplane_1", "txt", colors, None)
    data, pred, seg, labels = _fake_batch(rng, 3, 32, [0, 0, 4])
    vis(data, pred, seg, labels)
    out = os.path.join(exp, "visualization", "airplane")
    files = sorted(os.listdir(out))
    # only airplane #1 written: gt + pred (IoU 1.0 since pred==seg)
    assert files == ["airplane_1_gt.txt", "airplane_1_pred_1.0.txt"]
    assert vis.visual_warning is False

    # 'all' with class_choice set skips everything (reference :103-104)
    vis2 = PartSegVisualizer(exp + "2", "all", "txt", colors, "chair")
    vis2(data, pred, seg, labels)
    assert vis2.visual_warning is True
    vis2.warn_if_unmatched()


def test_partseg_visualizer_ply(tmp_path):
    rng = np.random.default_rng(2)
    colors = rng.integers(0, 256, (50, 3))
    exp = str(tmp_path / "exp")
    vis = PartSegVisualizer(exp, "all", "ply", colors, None)
    data, pred, seg, labels = _fake_batch(rng, 1, 16, [3])
    vis(data, pred, seg, labels)
    out = os.path.join(exp, "visualization", "car")
    (gt,) = [f for f in os.listdir(out) if f.endswith("_gt.ply")]
    rows = read_ply(os.path.join(out, gt))
    assert rows.shape == (16, 6)


def test_semseg_visualizer_streams_rooms(tmp_path):
    rng = np.random.default_rng(3)
    colors = rng.integers(0, 256, (13, 3))
    exp = str(tmp_path / "exp")
    rooms = ["Area_6_office_1", "Area_6_office_1", "Area_6_office_2"]
    vis = SemSegVisualizer(exp, "all", "txt", "all", colors, rooms)
    data = rng.random((3, 16, 9)).astype(np.float32)
    seg = rng.integers(0, 13, (3, 16))
    pred = seg.copy()
    vis(data, seg, pred)
    r1 = os.path.join(exp, "visualization", "area_6", "office_1")
    r2 = os.path.join(exp, "visualization", "area_6", "office_2")
    files1 = sorted(os.listdir(r1))
    assert "office_1_gt.txt" in files1
    assert any(f.startswith("office_1_pred_1.0") for f in files1)
    # two blocks appended into office_1 before finalize
    pred_file = [f for f in files1 if f.startswith("office_1_pred")][0]
    assert len(open(os.path.join(r1, pred_file)).readlines()) == 32
    assert any(f.startswith("office_2_pred") for f in os.listdir(r2))
    assert vis.visual_warning is False


def test_legend_renderers(tmp_path):
    p1 = render_legend_partseg(str(tmp_path / "part.png"))
    p2 = render_legend_semseg(str(tmp_path / "sem.png"))
    if p1 is not None:  # cv2 present
        assert os.path.getsize(p1) > 1000
        assert os.path.getsize(p2) > 1000


def test_legend_renderers_work_without_cv2(tmp_path):
    """Legends render on any host: cv2 when present, else the built-in
    bitmap-font raster + pure-Python PNG encoder (utils/raster.py)."""
    from dgcnn_tpu.utils.visualization import (
        render_legend_partseg,
        render_legend_semseg,
    )

    p1 = render_legend_partseg(str(tmp_path / "part.png"))
    p2 = render_legend_semseg(str(tmp_path / "sem.png"))
    for p, min_size in ((p1, 10_000), (p2, 5_000)):
        assert p is not None
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
        import os as _os

        assert _os.path.getsize(p) > min_size


def test_raster_png_roundtrip(tmp_path):
    """write_png output decodes back to the exact pixels (zlib/PNG
    correctness of the dependency-free encoder)."""
    import struct
    import zlib

    import numpy as np

    from dgcnn_tpu.utils import raster

    img = (np.arange(5 * 7 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    path = str(tmp_path / "t.png")
    raster.write_png(path, img)
    blob = open(path, "rb").read()
    # parse IDAT
    off, idat = 8, b""
    while off < len(blob):
        (ln,) = struct.unpack(">I", blob[off:off + 4])
        tag = blob[off + 4:off + 8]
        if tag == b"IDAT":
            idat += blob[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    rows = [raw[y * (7 * 3 + 1) + 1:(y + 1) * (7 * 3 + 1)] for y in range(5)]
    got = np.frombuffer(b"".join(rows), np.uint8).reshape(5, 7, 3)
    np.testing.assert_array_equal(got, img)
