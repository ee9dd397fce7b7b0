"""PipelineLoader (data/pipeline.py): vectorized batch assembly, worker
determinism, and NumpyLoader contract parity."""
import numpy as np

from dgcnn_tpu.data.loader import NumpyLoader
from dgcnn_tpu.data.pipeline import PipelineLoader


def _dataset(partition, n=37, num_points=32):
    from dgcnn_tpu.data.datasets import ModelNet40

    ds = ModelNet40.__new__(ModelNet40)
    rng = np.random.RandomState(3)
    ds.data = rng.randn(n, 64, 3).astype(np.float32)
    ds.label = rng.randint(0, 40, size=(n, 1)).astype(np.int64)
    ds.num_points = num_points
    ds.partition = partition
    ds.rng = np.random.default_rng(42)
    return ds


def test_eval_batches_bitwise_match_numpy_loader():
    """No augmentation -> the vectorized loader must produce exactly the
    NumpyLoader batches: same order, padding, mask, values."""
    ds = _dataset("test")
    a = NumpyLoader(ds, ["points", "label"], 8, shuffle=True, seed=5)
    b = PipelineLoader(ds, ["points", "label"], 8, shuffle=True, seed=5)
    a.set_epoch(2)
    b.set_epoch(2)
    batches_a, batches_b = list(a), list(b)
    assert len(batches_a) == len(batches_b) == 5  # 37/8 padded final
    for ba, bb in zip(batches_a, batches_b):
        np.testing.assert_array_equal(ba["points"], bb["points"])
        np.testing.assert_array_equal(ba["label"], bb["label"])
        np.testing.assert_array_equal(ba["mask"], bb["mask"])
    assert batches_a[-1]["mask"].sum() == 37 - 4 * 8


def test_worker_count_does_not_change_batches():
    """Batch content is a pure function of (seed, epoch, batch index):
    results are identical for any worker count/scheduling."""
    ds = _dataset("train")
    b0 = PipelineLoader(ds, ["points", "label"], 8, shuffle=True, seed=7,
                        num_workers=0)
    b2 = PipelineLoader(ds, ["points", "label"], 8, shuffle=True, seed=7,
                        num_workers=2)
    try:
        for e in range(2):
            b0.set_epoch(e)
            b2.set_epoch(e)
            for x, y in zip(b0, b2):
                np.testing.assert_array_equal(x["points"], y["points"])
                np.testing.assert_array_equal(x["label"], y["label"])
    finally:
        b2.close()


def test_train_augmentation_distribution():
    """Vectorized train batches: every sample scaled within U(2/3,3/2) and
    shifted within 0.2, point-shuffled per sample (same multiset)."""
    ds = _dataset("train", n=64, num_points=64)
    pl = PipelineLoader(ds, ["points", "label"], 64, shuffle=False, seed=1)
    batch = next(iter(pl))
    raw = ds.data[:, :64]
    got = batch["points"]
    for i in range(64):
        # undo the per-sample affine by lstsq: points are a permutation of
        # scale*raw+shift, so column-wise sorted values must match
        a = np.sort(got[i], axis=0)
        lo, hi = a[0], a[-1]
        r = np.sort(raw[i], axis=0)
        scale = (hi - lo) / (r[-1] - r[0])
        assert np.all(scale > 2 / 3 - 1e-5) and np.all(scale < 3 / 2 + 1e-5)
        recon = r * scale + (lo - r[0] * scale)
        np.testing.assert_allclose(a, recon, atol=1e-4)


def test_shapenetpart_aug_batch_matches_single_distribution():
    """ShapeNetPartAugmented.batch: augmented clouds stay finite and the
    no-aug (test) partition is a bitwise pass-through."""
    from dgcnn_tpu.data.datasets import ShapeNetPartAugmented

    rng = np.random.RandomState(0)
    for partition in ("test", "train"):
        ds = ShapeNetPartAugmented.__new__(ShapeNetPartAugmented)
        ds.partition = partition
        ds.data = rng.randn(12, 48, 3).astype(np.float32)
        ds.label = rng.randint(0, 16, size=(12, 1)).astype(np.int64)
        ds.seg = rng.randint(0, 50, size=(12, 48)).astype(np.int64)
        ds.rng = np.random.default_rng(42)
        pc, lbl, seg = ds.batch(np.arange(12), np.random.default_rng(9))
        assert pc.shape == (12, 48, 3) and np.isfinite(pc).all()
        np.testing.assert_array_equal(seg, ds.seg)
        if partition == "test":
            np.testing.assert_array_equal(pc, ds.data)


def test_device_resident_epoch_matches_per_batch():
    """device_resident + run_resident_epoch: one H2D + on-device lax.scan
    gives the same per-batch outputs as the per-batch device_iter loop."""
    import jax.numpy as jnp

    from dgcnn_tpu.data.pipeline import run_resident_epoch

    ds = _dataset("test")
    pl = PipelineLoader(ds, ["points", "label"], 8, shuffle=True, seed=5)
    pl.set_epoch(1)
    arrays, mask = pl.device_resident()
    assert arrays["points"].shape == (5, 8, 32, 3)
    assert mask.shape == (5, 8) and mask.sum() == 37

    def step(batch, w):
        return jnp.sum(batch["points"] * w, axis=(1, 2)) + batch[
            "label"].squeeze(-1)

    w = jnp.float32(2.0)
    got = np.asarray(run_resident_epoch(step, arrays, w))
    pl.set_epoch(1)
    for i, b in enumerate(pl.device_iter()):
        want = np.asarray(step({"points": b["points"], "label": b["label"]},
                               w))
        assert isinstance(b["mask"], np.ndarray)  # mask stays host-side
        np.testing.assert_allclose(got[i], want, rtol=1e-6)


def test_device_augment_cls_distribution():
    """On-device cls augmentation (device_pipeline): scale within
    U(2/3,3/2), shift within 0.2, per-sample permutation (same multiset),
    deterministic in the key."""
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.data.device_pipeline import augment_cls

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(16, 64, 3).astype(np.float32))
    key = jax.random.PRNGKey(3)
    out = np.asarray(augment_cls(key, {"points": pts})["points"])
    out2 = np.asarray(augment_cls(key, {"points": pts})["points"])
    np.testing.assert_array_equal(out, out2)
    raw = np.asarray(pts)
    for i in range(16):
        a, r = np.sort(out[i], axis=0), np.sort(raw[i], axis=0)
        scale = (a[-1] - a[0]) / (r[-1] - r[0])
        assert np.all(scale > 2 / 3 - 1e-5) and np.all(scale < 3 / 2 + 1e-5)
        shift = a[0] - r[0] * scale
        assert np.all(np.abs(shift) <= 0.2 + 1e-5)
        recon = r * scale + shift
        np.testing.assert_allclose(a, recon, atol=1e-4)


def test_device_augment_partseg():
    """Seg labels follow the point shuffle; the augmented recipe applies
    per-sample gated translate/jitter/rotate (finite, y preserved up to
    scale/shift/jitter when rotation is about the x-z plane)."""
    import jax
    import jax.numpy as jnp

    from dgcnn_tpu.data.device_pipeline import (
        augment_partseg_augmented,
        augment_partseg_plain,
    )

    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(8, 32, 3).astype(np.float32))
    # seg encodes each point's original rank along x, recoverable after
    # a pure permutation
    seg = jnp.asarray(np.argsort(np.argsort(np.asarray(pts)[..., 0],
                                            axis=1), axis=1))
    out = augment_partseg_plain(jax.random.PRNGKey(0),
                                {"points": pts, "seg": seg})
    p, s = np.asarray(out["points"]), np.asarray(out["seg"])
    for i in range(8):
        rank = np.argsort(np.argsort(p[i, :, 0]))
        np.testing.assert_array_equal(rank, s[i])

    out = augment_partseg_augmented(jax.random.PRNGKey(4),
                                    {"points": pts, "seg": seg})
    assert np.isfinite(np.asarray(out["points"])).all()
    np.testing.assert_array_equal(np.asarray(out["seg"]), np.asarray(seg))
    # not a no-op across the batch (some augmentation fired)
    assert not np.allclose(np.asarray(out["points"]), np.asarray(pts))


def test_seg_batch_shuffles_points_and_labels_together():
    from dgcnn_tpu.data.datasets import S3DIS

    ds = S3DIS.__new__(S3DIS)
    rng = np.random.RandomState(1)
    ds.data = rng.randn(6, 32, 9).astype(np.float32)
    # make seg recoverable from the first channel ordering
    ds.seg = np.argsort(ds.data[..., 0], axis=1).argsort(axis=1).astype(np.int64)
    ds.num_points = 32
    ds.partition = "train"
    ds.rng = np.random.default_rng(42)
    pc, seg = ds.batch(np.arange(6), np.random.default_rng(2))
    # the (point, label) pairing must survive the shuffle
    for i in range(6):
        rank = np.argsort(pc[i, :, 0]).argsort()
        np.testing.assert_array_equal(rank, seg[i])
