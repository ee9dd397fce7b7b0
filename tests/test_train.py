"""Tests for loss / metrics / schedules / engine (SURVEY.md §4 gap-closing)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.train import (
    TrainState,
    accuracy_score,
    balanced_accuracy_score,
    calculate_sem_IoU,
    calculate_shape_IoU,
    cross_entropy,
    make_cls_steps,
    make_optimizer,
    make_schedule,
    shape_iou_device,
)
from tests.conftest import has_torch, requires_reference


@requires_reference
def test_loss_matches_reference():
    import sys
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from loss import cross_entropy as ref_ce

    rng = np.random.RandomState(0)
    logits = rng.randn(40, 13).astype(np.float32)
    gold = rng.randint(0, 13, size=40)
    for smoothing in [True, False]:
        want = ref_ce(
            torch.from_numpy(logits), torch.from_numpy(gold), smoothing
        ).item()
        got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(gold), smoothing))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_metrics_match_sklearn():
    import sklearn.metrics as skm

    rng = np.random.RandomState(1)
    y_true = rng.randint(0, 7, 300)
    y_pred = rng.randint(0, 7, 300)
    np.testing.assert_allclose(
        accuracy_score(y_true, y_pred), skm.accuracy_score(y_true, y_pred)
    )
    np.testing.assert_allclose(
        balanced_accuracy_score(y_true, y_pred),
        skm.balanced_accuracy_score(y_true, y_pred),
    )


def test_shape_iou_golden():
    # category 1 (bag): parts 4,5.  Shape 0: perfect -> IoU 1.
    pred = np.array([[4, 4, 5, 5], [4, 4, 4, 4]])
    seg = np.array([[4, 4, 5, 5], [4, 5, 5, 4]])
    label = np.array([[1], [1]])
    ious = calculate_shape_IoU(pred, seg, label, None)
    # shape 1: part4 I=2,U=4 -> .5 ; part5 I=0,U=3 -> 0 ; mean .25
    np.testing.assert_allclose(ious, [1.0, 0.25])


def test_shape_iou_device_matches_host():
    rng = np.random.RandomState(2)
    label = rng.randint(0, 16, size=(6, 1))
    from dgcnn_tpu.train.metrics import INDEX_START, SEG_NUM

    pred = np.stack([
        rng.randint(INDEX_START[int(c)], INDEX_START[int(c)] + SEG_NUM[int(c)],
                    size=32)
        for c in label[:, 0]
    ])
    seg = np.stack([
        rng.randint(INDEX_START[int(c)], INDEX_START[int(c)] + SEG_NUM[int(c)],
                    size=32)
        for c in label[:, 0]
    ])
    host = calculate_shape_IoU(pred, seg, label, None)
    dev = np.asarray(
        shape_iou_device(jnp.asarray(pred), jnp.asarray(seg),
                         jnp.asarray(label[:, 0]))
    )
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_sem_iou_golden():
    pred = np.array([[0, 0, 1, 2]])
    seg = np.array([[0, 1, 1, 1]])
    iou = calculate_sem_IoU(pred, seg)
    assert iou[0] == 0.5          # I=1, U=2
    np.testing.assert_allclose(iou[1], 1 / 3)  # I=1, U=3


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
@pytest.mark.parametrize("name", ["cos", "step", "cycle"])
def test_schedules_match_torch(name):
    import torch

    base_lr, epochs, spe = 0.001, 10, 7
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr * 100)
    if name == "cos":
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs, eta_min=1e-3)
    elif name == "step":
        sch = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.7)
    else:
        sch = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=base_lr * 100, epochs=epochs, steps_per_epoch=spe
        )
    ours = make_schedule(name, base_lr, epochs=epochs, steps_per_epoch=spe,
                         use_sgd=True)
    torch_lrs, our_lrs = [], []
    step = 0
    for _ in range(epochs):
        for _ in range(spe):
            torch_lrs.append(opt.param_groups[0]["lr"])
            our_lrs.append(float(ours(step)))
            if name == "cycle":
                opt.step()
                sch.step()
            step += 1
        if name != "cycle":
            opt.step()
            sch.step()
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=2e-4, atol=1e-8)


@pytest.mark.skipif(not has_torch(), reason="torch unavailable")
def test_one_cycle_momentum_matches_torch():
    """OneCycleLR's momentum cycling (cycle_momentum=True default, which
    the reference dist trainer inherits at main_partseg_dist.py:212):
    momentum anneals max->base->max inversely to the lr."""
    import torch

    from dgcnn_tpu.train.schedules import one_cycle_momentum

    base_lr, epochs, spe = 0.001, 10, 7
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr * 100, momentum=0.9)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=base_lr * 100, epochs=epochs, steps_per_epoch=spe)
    ours = one_cycle_momentum(epochs * spe)
    torch_ms, our_ms = [], []
    for step in range(epochs * spe):
        torch_ms.append(opt.param_groups[0]["momentum"])
        our_ms.append(float(ours(step)))
        opt.step()
        sch.step()
    np.testing.assert_allclose(our_ms, torch_ms, rtol=2e-4, atol=1e-8)


def test_cls_engine_overfits_two_samples():
    """2-sample overfit smoke loop — the reference's notebook verification
    strategy (test.ipynb cells 51-55, SURVEY.md §4)."""
    from dgcnn_tpu.models import DGCNNCls

    model = DGCNNCls(emb_dims=16, k=4, output_channels=4, dropout=0.0)
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3]))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, pts, train=False
    )
    tx = make_optimizer(use_sgd=False, schedule=lambda _: 5e-3)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    train_step, eval_step = make_cls_steps(model)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(60):
        state, m = train_step(state, pts, labels, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    out = eval_step(state, pts, labels)
    assert (np.asarray(out["preds"]) == np.asarray(labels)).all()


def test_checkpoint_roundtrip(tmp_path):
    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train import (
        load_train_checkpoint,
        save_train_checkpoint,
        save_model,
        load_model,
    )

    model = DGCNNCls(emb_dims=16, k=4, output_channels=4)
    rng = np.random.RandomState(4)
    pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    tx = make_optimizer(use_sgd=False, schedule=lambda _: 1e-3)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    p = str(tmp_path / "ckpt.checkpoint")
    save_train_checkpoint(p, state, epoch=7, loss=0.123)
    restored, epoch, loss = load_train_checkpoint(p, state)
    assert epoch == 7 and abs(loss - 0.123) < 1e-9
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    mp = str(tmp_path / "model.t7.msgpack")
    save_model(mp, variables)
    loaded = load_model(mp)
    assert set(loaded.keys()) == {"params", "batch_stats"}


def test_remat_train_matches_plain():
    """jax.checkpoint rematerialization must not change the math."""
    from dgcnn_tpu.models import DGCNNSemSeg
    from dgcnn_tpu.train import make_seg_steps

    model = DGCNNSemSeg(emb_dims=16, k=4, dropout=0.0)
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.rand(2, 16, 9).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 13, size=(2, 16)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    tx = make_optimizer(use_sgd=True, schedule=lambda _: 0.01)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    plain, _ = make_seg_steps(model, with_label=False)
    rem, _ = make_seg_steps(model, with_label=False, remat=True)
    s1, m1 = plain(state, pts, seg, jax.random.PRNGKey(1))
    s2, m2 = rem(state, pts, seg, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train.checkpoint import load_orbax, save_orbax

    model = DGCNNCls(emb_dims=16, k=4, output_channels=4)
    rng = np.random.RandomState(8)
    pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    tx = make_optimizer(use_sgd=False, schedule=lambda _: 1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    p = str(tmp_path / "orbax_ckpt")
    save_orbax(p, state, epoch=3, loss=0.5)
    restored, epoch, loss = load_orbax(p, state)
    assert epoch == 3 and abs(loss - 0.5) < 1e-9
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_rng_impl_and_step():
    """train_rng defaults to the rbg impl (TPU-hardware mask bits,
    engine.train_rng docstring); DGCNN_TPU_PALLAS_EXACT=1 keeps the
    backend-stable threefry stream.  A dropout-bearing train step must run
    with the rbg key and draw per-step-distinct masks via fold_in."""
    import os
    from unittest import mock

    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train import train_rng

    # on the CPU test backend train_rng must stay threefry (rbg deadlocks
    # XLA's in-process CPU collectives — engine.train_rng docstring); the
    # rbg TPU branch is exercised on-chip by tools/ubench_train.py
    k = train_rng(0)
    expected = "rbg" if jax.default_backend() == "tpu" else "threefry"
    assert expected in str(jax.random.key_impl(k))
    with mock.patch.dict(os.environ, {"DGCNN_TPU_PALLAS_EXACT": "1"}):
        ke = train_rng(0)
    assert "rbg" not in str(jax.random.key_impl(ke))

    model = DGCNNCls(emb_dims=16, k=4, output_channels=4, dropout=0.5)
    rng = np.random.RandomState(9)
    pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    lbl = jnp.asarray(rng.randint(0, 4, size=(2,)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    tx = make_optimizer(use_sgd=True, schedule=lambda _: 1e-3)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    train_step, _ = make_cls_steps(model)
    s1, m1 = train_step(state, pts, lbl, k)
    s2, m2 = train_step(s1, pts, lbl, k)  # same key: step fold_in differs
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # identical inputs + params moving: losses must differ (masks re-drawn)
    assert float(m1["loss"]) != float(m2["loss"])
