"""S3DIS ETL unit tests on tiny synthetic rooms."""
import os

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
