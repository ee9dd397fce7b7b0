"""Structured synthetic fixtures (dgcnn_tpu.data.synthetic.make_*_structured):
schema matches the reference h5 layouts (data.py:80-169) and labels are
recoverable functions of geometry — the property the on-chip learnability
gate (tools/learn_check.py) depends on."""
import numpy as np
import pytest

from dgcnn_tpu.data import synthetic
from dgcnn_tpu.train.metrics import INDEX_START, SEG_NUM


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_cls_cloud_shape_and_determinism():
    a = synthetic.structured_cls_cloud(np.random.default_rng(7), 13, 256)
    b = synthetic.structured_cls_cloud(np.random.default_rng(7), 13, 256)
    assert a.shape == (256, 3) and a.dtype == np.float32
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
    # radial bumps stay within the designed envelope
    r = np.linalg.norm(a, axis=-1)
    assert 0.4 < r.min() and r.max() < 1.6


def test_cls_classes_geometrically_distinct(rng):
    """Same-class clouds are closer (in radial-spectrum space) than
    different-class clouds — the separability the learn gate relies on."""
    def spectrum(pts):
        # azimuthal power spectrum of the radius over theta bins
        theta = np.arctan2(pts[:, 1], pts[:, 0])
        r = np.linalg.norm(pts, axis=-1)
        bins = np.linspace(-np.pi, np.pi, 65)
        prof = np.zeros(64)
        idx = np.clip(np.digitize(theta, bins) - 1, 0, 63)
        np.add.at(prof, idx, r)
        cnt = np.bincount(idx, minlength=64).clip(1)
        return np.abs(np.fft.rfft(prof / cnt))[1:9]

    # frequency pair differs between classes 2 and 5; phase is random
    a1 = spectrum(synthetic.structured_cls_cloud(rng, 2, 2048))
    a2 = spectrum(synthetic.structured_cls_cloud(rng, 2, 2048))
    b1 = spectrum(synthetic.structured_cls_cloud(rng, 5, 2048))
    same = np.linalg.norm(a1 - a2)
    diff = np.linalg.norm(a1 - b1)
    assert diff > 2 * same


def test_partseg_cloud_part_rule(rng):
    """pid is the category's part window, parts order along +y, and the
    y-order rule survives the reference augmentations (rotate spins x-z)."""
    from dgcnn_tpu.data import augment

    for cat in [0, 1, 10]:  # 4, 2 and 6 parts
        pts, pid = synthetic.structured_partseg_cloud(rng, cat, 512)
        assert pts.shape == (512, 3) and pid.shape == (512,)
        lo, hi = INDEX_START[cat], INDEX_START[cat] + SEG_NUM[cat]
        assert pid.min() >= lo and pid.max() < hi
        assert len(np.unique(pid)) == SEG_NUM[cat]
        # mean y strictly increases with part id
        means = [pts[pid == p, 1].mean() for p in range(lo, hi)]
        assert all(m2 > m1 for m1, m2 in zip(means, means[1:]))
        # blobs stay y-separable after the aug pipeline
        aug = augment.rotate_pointcloud(
            augment.translate_pointcloud(pts, rng), rng)
        for p in range(lo, hi - 1):
            assert aug[pid == p, 1].max() > aug[pid == p + 1, 1].min() - 1.0


def test_semseg_block_color_rule(rng):
    block, lab = synthetic.structured_semseg_block(rng, 4096)
    assert block.shape == (4096, 9) and lab.shape == (4096,)
    assert block.dtype == np.float32
    # nearest-color-anchor recovers the class for nearly every point
    d = np.linalg.norm(
        block[:, 3:6][:, None, :] - synthetic._SEM_COLORS[None], axis=-1)
    acc = (d.argmin(1) == lab).mean()
    assert acc > 0.95
    # structural classes obey their plane geometry
    assert abs(block[lab == 0, 2].mean() - 3.0) < 0.05   # ceiling z
    assert abs(block[lab == 1, 2].mean() - 0.0) < 0.05   # floor z


def test_structured_files_load_through_datasets(tmp_path, monkeypatch):
    """The structured fixtures drive the real dataset classes unmodified."""
    root = str(tmp_path)
    synthetic.make_modelnet40_structured(root, n_train=8, n_test=4,
                                         num_points=64, seed=0)
    synthetic.make_shapenetpart_structured(root, n_train=8, n_val=2,
                                           n_test=4, num_points=64, seed=0)
    synthetic.make_s3dis_structured(root, blocks_per_room=1,
                                    rooms_per_area=1, num_points=128, seed=0)
    monkeypatch.setenv("DGCNN_TPU_DATA", root)
    monkeypatch.setenv("DGCNN_TPU_NO_DOWNLOAD", "1")
    from dgcnn_tpu.data import ModelNet40, S3DIS, ShapeNetPart

    mn = ModelNet40(num_points=64, partition="train")
    pc, label = mn[0]
    assert pc.shape == (64, 3) and 0 <= int(np.ravel(label)[0]) < 40
    sp = ShapeNetPart(num_points=64, partition="test")
    pc, label, seg = sp[0]
    c = int(np.ravel(label)[0])
    assert INDEX_START[c] <= int(seg.min()) and (
        int(seg.max()) < INDEX_START[c] + SEG_NUM[c])
    s3 = S3DIS(num_points=128, partition="test", test_area="6")
    pc, seg = s3[0]
    assert pc.shape == (128, 9) and seg.max() < 13
