"""S3DIS ETL unit tests on tiny synthetic rooms."""

import numpy as np

from dgcnn_tpu.data.prepare.gen_indoor3d_h5 import H5ShardWriter
from dgcnn_tpu.data.prepare.indoor3d import (
    collect_point_label,
    room_to_blocks,
    room_to_blocks_normalized,
    room_to_samples,
    sample_to_fixed,
)


def _fake_room(rng, n=2000, extent=(2.5, 1.8, 3.0)):
    xyz = rng.random((n, 3)) * np.array(extent)
    rgb = rng.integers(0, 256, (n, 3)).astype(float)
    lab = rng.integers(0, 13, (n, 1)).astype(float)
    return np.concatenate([xyz, rgb, lab], 1)


def test_sample_to_fixed():
    rng = np.random.default_rng(0)
    data = np.arange(50, dtype=float).reshape(10, 5)
    down, idx = sample_to_fixed(data, 4, rng)
    assert down.shape == (4, 5)
    up, idx = sample_to_fixed(data, 17, rng)
    assert up.shape == (17, 5)
    np.testing.assert_array_equal(up[:10], data)  # originals kept first


def test_room_to_blocks_shapes_and_coverage():
    rng = np.random.default_rng(1)
    room = _fake_room(rng)
    data = room[:, :6].copy()
    data[:, 3:6] /= 255.0
    label = room[:, -1].astype(np.uint8)
    blocks, labels = room_to_blocks(data, label, 128, rng=rng)
    assert blocks.shape[1:] == (128, 6)
    assert labels.shape == blocks.shape[:2]
    # every block's xy extent fits within the 1m block
    for b in range(blocks.shape[0]):
        ext = blocks[b, :, :2].max(0) - blocks[b, :, :2].min(0)
        assert (ext <= 1.0 + 1e-6).all()


def test_room_to_blocks_normalized_layout():
    rng = np.random.default_rng(2)
    room = _fake_room(rng)
    blocks, labels = room_to_blocks_normalized(room, 128, rng=rng)
    assert blocks.shape[1:] == (128, 9)
    # RGB scaled to [0,1]
    assert blocks[:, :, 3:6].min() >= 0 and blocks[:, :, 3:6].max() <= 1
    # normalized room coords in [0,1]
    assert blocks[:, :, 6:9].min() >= -1e-6 and blocks[:, :, 6:9].max() <= 1 + 1e-6
    # XY centered on the block: |xy| <= block/2 + jitter
    assert np.abs(blocks[:, :, 0:2]).max() <= 0.5 + 1e-5


def test_room_to_samples_wraps_tail():
    rng = np.random.default_rng(3)
    data = rng.random((10, 6))
    label = rng.integers(0, 13, 10)
    s, l = room_to_samples(data, label, 4)
    assert s.shape == (3, 4, 6)
    np.testing.assert_array_equal(s[2, 0], data[8])
    np.testing.assert_array_equal(s[2, 1], data[9])
    # tail wraps to the room start
    np.testing.assert_array_equal(s[2, 2], data[0])
    np.testing.assert_array_equal(s[2, 3], data[1])


def test_collect_point_label(tmp_path):
    anno = tmp_path / "Annotations"
    anno.mkdir()
    rng = np.random.default_rng(4)
    np.savetxt(anno / "chair_1.txt", rng.random((20, 6)) + 5)
    np.savetxt(anno / "staris_1.txt", rng.random((10, 6)) + 5)  # unknown cls
    out = tmp_path / "room.npy"
    arr = collect_point_label(str(anno), str(out), "numpy")
    assert arr.shape == (30, 7)
    assert arr[:, 0:3].min() == 0.0  # shifted to origin
    labs = set(arr[:, -1].astype(int))
    assert labs == {8, 12}  # chair, clutter


def test_h5_shard_writer(tmp_path):
    import h5py

    w = H5ShardWriter(str(tmp_path / "shard"), num_point=16, shard_size=10)
    rng = np.random.default_rng(5)
    for n in [4, 9, 3]:  # 16 rows total -> shards of 10 and 6
        w.insert(rng.random((n, 16, 9)).astype(np.float32),
                 rng.integers(0, 13, (n, 16)).astype(np.uint8))
    w.close()
    assert len(w.files) == 2
    with h5py.File(w.files[0], "r") as f:
        assert f["data"].shape == (10, 16, 9)
    with h5py.File(w.files[1], "r") as f:
        assert f["data"].shape == (6, 16, 9)


# ---------------------------------------------------------------------------
# Instance bbox exporters (reference indoor3d_util.py:353-598)
# ---------------------------------------------------------------------------

def _bbox_fixture(tmp_path, rng):
    anno = tmp_path / "Annotations"
    anno.mkdir()
    np.savetxt(anno / "chair_1.txt",
               np.concatenate([rng.random((20, 3)) + [5, 2, 0],
                               rng.integers(0, 256, (20, 3))], 1))
    np.savetxt(anno / "table_1.txt",
               np.concatenate([rng.random((15, 3)) * 2 + [1, 1, 0],
                               rng.integers(0, 256, (15, 3))], 1))
    np.savetxt(anno / "staris_1.txt",  # unknown class -> clutter
               np.concatenate([rng.random((10, 3)),
                               rng.integers(0, 256, (10, 3))], 1))
    return anno


def _load_reference_util():
    import importlib
    import sys

    sys.path.insert(0, "/root/reference/prepare_data")
    try:
        return importlib.import_module("indoor3d_util")
    finally:
        sys.path.pop(0)


def test_collect_bounding_box_matches_reference(tmp_path):
    from dgcnn_tpu.data.prepare.indoor3d import collect_bounding_box

    rng = np.random.default_rng(7)
    anno = _bbox_fixture(tmp_path, rng)
    ours = collect_bounding_box(str(anno), str(tmp_path / "ours.txt"))
    assert ours.shape == (3, 7)
    # most negative corner at origin, boxes tight
    assert ours[:, 0:3].min() == 0.0
    assert (ours[:, 3:6] >= ours[:, 0:3]).all()

    ref = _load_reference_util()
    ref.collect_bounding_box(str(anno), str(tmp_path / "ref.txt"))
    got = np.loadtxt(tmp_path / "ours.txt")
    want = np.loadtxt(tmp_path / "ref.txt")
    # reference glob order is filesystem-dependent; compare as row sets
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-5)


def test_collect_point_bounding_box_matches_reference(tmp_path):
    from dgcnn_tpu.data.prepare.indoor3d import collect_point_bounding_box

    rng = np.random.default_rng(8)
    anno = _bbox_fixture(tmp_path, rng)
    ours = collect_point_bounding_box(str(anno), str(tmp_path / "ours.npy"),
                                      "numpy")
    assert ours.shape == (45, 13)
    # center = point + offset; half-extents positive
    centers = ours[:, 0:3] + ours[:, 7:10]
    assert (ours[:, 10:13] >= 0).all()
    assert (centers - ours[:, 10:13] <= ours[:, 0:3] + 1e-9).all()

    ref = _load_reference_util()
    ref.collect_point_bounding_box(str(anno), str(tmp_path / "ref.npy"),
                                   "numpy")
    want = np.load(tmp_path / "ref.npy")
    got = np.load(tmp_path / "ours.npy")
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-6)

    # txt format round-trips
    collect_point_bounding_box(str(anno), str(tmp_path / "o.txt"), "txt")
    assert np.loadtxt(tmp_path / "o.txt").shape == (45, 13)


def test_bbox_label_to_obj_exporters(tmp_path):
    from dgcnn_tpu.data.prepare.indoor3d import (
        bbox_label_to_obj,
        bbox_label_to_obj_room,
        collect_bounding_box,
    )

    rng = np.random.default_rng(9)
    anno = _bbox_fixture(tmp_path, rng)
    bbox_file = tmp_path / "bbox.txt"
    collect_bounding_box(str(anno), str(bbox_file))

    # per-instance files: chair(8) + table(7) + clutter(12), 3 obj+mtl pairs
    bbox_label_to_obj(str(bbox_file), str(tmp_path / "inst"))
    objs = sorted(p.name for p in tmp_path.glob("inst_*.obj"))
    assert len(objs) == 3 and any("chair" in o for o in objs)
    txt = (tmp_path / objs[0]).read_text()
    assert txt.count("\nv ") == 8 and txt.count("\nf ") == 6

    # easy_view drops clutter (label 12 not in EASY_VIEW_LABELS)
    bbox_label_to_obj(str(bbox_file), str(tmp_path / "easy"), easy_view=True)
    assert len(list(tmp_path.glob("easy_*.obj"))) == 2

    # room exporter: one file, 8 vertices/6 faces per kept box, mtl colors
    bbox_label_to_obj_room(str(bbox_file), str(tmp_path / "room"),
                           permute=[0, 2, 1], center=True,
                           exclude_table=True)
    room = (tmp_path / "room.obj").read_text()
    assert room.count("\nv ") == 16 and room.count("\nf ") == 12
    assert "material1" in room
    mtl = (tmp_path / "room.mtl").read_text()
    assert mtl.count("newmtl") == 2
    # face indices of the second box offset by 8
    assert "f 12 11 10 9" in room
