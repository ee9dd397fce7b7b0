"""Data pipeline tests against synthetic fixtures in the reference schemas."""
import os

import numpy as np
import pytest

from dgcnn_tpu.data import synthetic
from dgcnn_tpu.data.loader import NumpyLoader


@pytest.fixture(scope="module")
def data_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    synthetic.make_all(root)
    old = os.environ.get("DGCNN_TPU_DATA")
    os.environ["DGCNN_TPU_DATA"] = root
    os.environ["DGCNN_TPU_NO_DOWNLOAD"] = "1"
    yield root
    if old is None:
        os.environ.pop("DGCNN_TPU_DATA")
    else:
        os.environ["DGCNN_TPU_DATA"] = old


def test_modelnet40_dataset(data_env):
    from dgcnn_tpu.data import ModelNet40

    ds = ModelNet40(num_points=256, partition="train")
    pc, label = ds[0]
    assert pc.shape == (256, 3) and pc.dtype == np.float32
    assert 0 <= int(np.asarray(label).item()) < 40
    test = ModelNet40(num_points=256, partition="test")
    # test partition applies no augmentation: deterministic reads
    a, _ = test[1]
    b, _ = test[1]
    np.testing.assert_array_equal(a, b)


def test_shapenetpart_dataset_and_class_choice(data_env):
    from dgcnn_tpu.data import ShapeNetPart

    ds = ShapeNetPart(num_points=128, partition="trainval")
    pc, label, seg = ds[0]
    assert pc.shape == (128, 3) and seg.shape == (128,)
    start = ds.INDEX_START[int(np.asarray(label).item())]
    num = ds.SEG_NUM[int(np.asarray(label).item())]
    assert ((seg >= start) & (seg < start + num)).all()

    # class filter narrows ids and exposes the window
    sub = ShapeNetPart(num_points=128, partition="test", class_choice="chair")
    assert (sub.label == 4).all()
    assert sub.seg_num_all == 4 and sub.seg_start_index == 12


def test_s3dis_dataset(data_env):
    from dgcnn_tpu.data import S3DIS

    tr = S3DIS(num_points=512, partition="train", test_area="6")
    te = S3DIS(num_points=512, partition="test", test_area="6")
    pc, seg = tr[0]
    assert pc.shape == (512, 9) and seg.shape == (512,)
    # Area-substring split covers the whole set disjointly
    full = len(tr) + len(te)
    assert len(te) > 0 and full > len(te)


def test_augmentations_shapes_and_ranges():
    from dgcnn_tpu.data import augment

    rng = np.random.default_rng(0)
    pc = rng.standard_normal((64, 3)).astype(np.float32)
    t = augment.translate_pointcloud(pc, rng)
    j = augment.jitter_pointcloud(pc.copy(), rng)
    r = augment.rotate_pointcloud(pc.copy(), rng)
    assert t.shape == j.shape == r.shape == (64, 3)
    assert np.abs(j - pc).max() <= 0.02 + 1e-6
    # rotation preserves distance from the y axis
    d0 = np.sqrt(pc[:, 0] ** 2 + pc[:, 2] ** 2)
    d1 = np.sqrt(r[:, 0] ** 2 + r[:, 2] ** 2)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)
    np.testing.assert_allclose(r[:, 1], pc[:, 1])


def test_loader_pads_final_batch(data_env):
    from dgcnn_tpu.data import ModelNet40

    ds = ModelNet40(num_points=64, partition="test")  # 16 samples
    loader = NumpyLoader(ds, ["points", "label"], batch_size=5)
    batches = list(loader)
    assert len(batches) == 4
    last = batches[-1]
    assert last["points"].shape == (5, 64, 3)
    assert last["mask"].sum() == 1  # 16 = 3*5 + 1
    full = batches[0]
    assert full["mask"].all()


def test_loader_epoch_reshuffle(data_env):
    from dgcnn_tpu.data import ModelNet40

    ds = ModelNet40(num_points=64, partition="test")
    loader = NumpyLoader(ds, ["points", "label"], batch_size=16, shuffle=True)
    loader.set_epoch(0)
    a = next(iter(loader))["label"]
    loader.set_epoch(0)
    b = next(iter(loader))["label"]
    loader.set_epoch(1)
    c = next(iter(loader))["label"]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
