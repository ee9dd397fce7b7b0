"""Event-driven trainer (train/events.py) — the notebook's ignite workflow
(reference test.ipynb cells 49, 56-61)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgcnn_tpu.train.events import (
    ConfusionMatrix,
    Engine,
    Events,
    IoU,
    Loss,
    ModelCheckpoint,
    TensorboardLogger,
    create_supervised_evaluator,
    create_supervised_trainer,
    global_step_from_engine,
    mIoU,
)
from dgcnn_tpu.utils.tbevents import SummaryWriter, read_scalars


def test_engine_event_order_and_filters():
    seen = []
    engine = Engine(lambda e, b: seen.append(("proc", b)) or b)

    for ev in (Events.STARTED, Events.EPOCH_STARTED,
               Events.ITERATION_COMPLETED, Events.EPOCH_COMPLETED,
               Events.COMPLETED):
        engine.add_event_handler(
            ev, lambda e, name=ev.value: seen.append((name,)))

    @engine.on(Events.ITERATION_COMPLETED(every=2))
    def every_other(e):
        seen.append(("every2", e.state.iteration))

    state = engine.run([10, 20, 30], max_epochs=2)
    assert state.epoch == 2 and state.iteration == 6
    assert seen[0] == ("started",)
    assert seen.count(("epoch_started",)) == 2
    assert [s for s in seen if s[0] == "every2"] == [
        ("every2", 2), ("every2", 4), ("every2", 6)]
    assert seen[-1] == ("completed",)
    # iteration events interleave: proc fires before iteration_completed
    i_proc = seen.index(("proc", 10))
    assert seen[i_proc + 1] == ("iteration_completed",)


def test_confusion_matrix_miou_matches_host_metric():
    from dgcnn_tpu.train.metrics import calculate_sem_IoU

    rng = np.random.RandomState(0)
    preds = rng.randint(0, 13, size=(4, 64))
    y = rng.randint(0, 13, size=(4, 64))
    cm = ConfusionMatrix(13)
    miou = mIoU(cm)
    iou = IoU(cm)
    miou.reset()
    for i in range(4):
        miou.update({"preds": preds[i:i + 1], "y": y[i:i + 1]})
    expected = calculate_sem_IoU([preds], [y])
    per_class = iou.compute()
    np.testing.assert_allclose(per_class, expected, rtol=1e-12)
    assert miou.compute() == pytest.approx(float(np.nanmean(expected)))


def test_loss_metric_weighted_mean_and_mask():
    m = Loss()
    m.reset()
    m.update({"loss": 2.0, "y": np.zeros((3, 8))})
    m.update({"loss": 5.0, "y": np.zeros((1, 8))})
    assert m.compute() == pytest.approx((2.0 * 3 + 5.0) / 4)
    m.reset()
    m.update({"loss": 4.0, "y": np.zeros((4, 8)),
              "mask": np.array([1, 1, 0, 0])})
    assert m.compute() == pytest.approx(4.0)


def test_confusion_matrix_respects_mask():
    cm = ConfusionMatrix(3)
    cm.reset()
    preds = np.array([[0, 1], [2, 2]])
    y = np.array([[0, 1], [0, 0]])
    cm.update({"preds": preds, "y": y, "mask": np.array([1, 0])})
    assert cm.compute().sum() == 2          # padded row dropped
    assert cm.compute()[0, 0] == 1 and cm.compute()[1, 1] == 1


def test_confusion_matrix_mask_with_1d_targets():
    """Classification-shaped (B,) y with a (B,) row mask must drop padded
    rows instead of crashing on broadcast."""
    cm = ConfusionMatrix(3)
    cm.reset()
    cm.update({"preds": np.array([0, 1, 2, 2]), "y": np.array([0, 1, 1, 0]),
               "mask": np.array([1, 1, 1, 0])})
    assert cm.compute().sum() == 3
    assert cm.compute()[0, 0] == 1 and cm.compute()[1, 1] == 1


def test_shared_cm_metrics_update_once():
    """IoU + mIoU + the cm itself attached over ONE ConfusionMatrix update
    it once per iteration (ignite dedupes derived-metric sources)."""
    from dgcnn_tpu.train.events import IoU, mIoU

    cm = ConfusionMatrix(2)
    engine = Engine(lambda e, b: b)
    cm.attach(engine, "cm")
    IoU(cm).attach(engine, "IoU")
    mIoU(cm).attach(engine, "mIoU")
    out = {"preds": np.array([0, 1]), "y": np.array([0, 0])}
    engine.run([out], max_epochs=1)
    assert engine.state.metrics["cm"].sum() == 2   # not 6
    np.testing.assert_allclose(engine.state.metrics["IoU"], [0.5, 0.0])
    assert engine.state.metrics["mIoU"] == 0.25


def test_model_checkpoint_prunes_whole_groups(tmp_path):
    """A multi-object to_save is retained/pruned as a unit: n_saved counts
    checkpoint GROUPS, so no step ever loses half its state."""
    engine = Engine(lambda e, b: b)
    ckpt = ModelCheckpoint(
        str(tmp_path / "ck"), filename_prefix="g", n_saved=2,
        score_function=lambda e: e.state.metrics["IoU"], score_name="IoU",
        require_empty=False,
        global_step_transform=global_step_from_engine(engine))
    weights = {"params": {"w": np.zeros(2, np.float32)}}
    for epoch, score in enumerate([0.2, 0.5, 0.9], start=1):
        engine.state.epoch = epoch
        engine.state.metrics["IoU"] = score
        ckpt(engine, {"model": weights, "opt": weights})
    names = sorted(os.listdir(tmp_path / "ck"))
    assert len(names) == 4  # 2 groups x 2 files, never a half group
    for step, score in ((2, "0.5000"), (3, "0.9000")):
        for part in ("model", "opt"):
            assert f"g_{part}_{step}_IoU={score}.ckpt" in names


def test_model_checkpoint_retains_n_best(tmp_path):
    engine = Engine(lambda e, b: b)
    engine.state.metrics["IoU"] = 0.0
    ckpt = ModelCheckpoint(
        str(tmp_path / "ck"), filename_prefix="best", n_saved=2,
        score_function=lambda e: e.state.metrics["IoU"],
        score_name="IoU", require_empty=False,
        global_step_transform=global_step_from_engine(engine))
    weights = {"params": {"w": np.zeros(3, np.float32)}}
    for epoch, score in enumerate([0.2, 0.5, 0.1, 0.9], start=1):
        engine.state.epoch = epoch
        engine.state.metrics["IoU"] = score
        ckpt(engine, {"model": weights})
    names = sorted(os.listdir(tmp_path / "ck"))
    assert len(names) == 2
    assert any("IoU=0.9000" in n for n in names)
    assert any("IoU=0.5000" in n for n in names)
    assert ckpt.last_checkpoint.endswith("best_model_4_IoU=0.9000.ckpt")


def test_model_checkpoint_require_empty(tmp_path):
    d = tmp_path / "ck"
    d.mkdir()
    (d / "stale").write_text("x")
    with pytest.raises(ValueError):
        ModelCheckpoint(str(d))
    ModelCheckpoint(str(d), require_empty=False)  # opt-out works


def test_tbevents_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("training/batch_loss", 1.5, 10)
    w.add_scalar("validation/IoU", 0.75, 2)
    w.close()
    (path,) = [os.path.join(tmp_path, f) for f in os.listdir(tmp_path)]
    assert "tfevents" in path
    scalars = read_scalars(path)   # validates record CRCs
    assert (10, "training/batch_loss", pytest.approx(1.5)) in [
        (s, t, v) for s, t, v in scalars]
    assert (2, "validation/IoU", pytest.approx(0.75)) in [
        (s, t, v) for s, t, v in scalars]


def test_tbevents_readable_by_tensorboard(tmp_path):
    """Cross-check the hand-rolled encoding against the real reader."""
    tbr = pytest.importorskip("tensorboard.backend.event_processing"
                              ".event_file_loader")
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("t/x", 3.25, 7)
    w.close()
    (path,) = [os.path.join(tmp_path, f) for f in os.listdir(tmp_path)]
    events = list(tbr.LegacyEventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"
    ev = events[1]
    assert ev.step == 7
    assert ev.summary.value[0].tag == "t/x"
    assert ev.summary.value[0].simple_value == pytest.approx(3.25)


def test_supervised_trainer_end_to_end(tmp_path):
    """Cells 56-61 composed: trainer + evaluator with mIoU/Loss metrics,
    best-model checkpointing, tensorboard logging — on a tiny DGCNNCls."""
    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train import TrainState, make_cls_steps, make_optimizer

    model = DGCNNCls(emb_dims=16, k=4, output_channels=4, dropout=0.0)
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3]))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts,
                           train=False)
    tx = make_optimizer(use_sgd=False, schedule=lambda _: 5e-3)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    train_step, eval_step = make_cls_steps(model)

    trainer = create_supervised_trainer(state, train_step,
                                        jax.random.PRNGKey(1))
    cm = ConfusionMatrix(num_classes=4)
    val_metrics = {"IoU": mIoU(cm), "loss": Loss()}
    evaluator = create_supervised_evaluator(
        lambda: trainer.state.train_state, eval_step, metrics=val_metrics)

    logged = []

    @trainer.on(Events.ITERATION_COMPLETED(every=2))
    def log_loss(engine):
        logged.append(engine.state.output)

    ckpt = ModelCheckpoint(
        str(tmp_path / "ck"), filename_prefix="best", n_saved=2,
        score_function=lambda e: e.state.metrics["IoU"], score_name="IoU",
        require_empty=False,
        global_step_transform=global_step_from_engine(trainer))

    @trainer.on(Events.EPOCH_COMPLETED)
    def validate(engine):
        evaluator.run([(pts, labels)])
        ckpt(evaluator,
             {"model": {"params": engine.state.train_state.params}})

    tb = TensorboardLogger(str(tmp_path / "tb"))
    tb.attach_output_handler(
        trainer, event_name=Events.ITERATION_COMPLETED(every=2),
        tag="training",
        output_transform=lambda loss: {"batch_loss": loss})
    tb.attach_output_handler(
        evaluator, event_name=Events.EPOCH_COMPLETED, tag="validation",
        metric_names="all",
        global_step_transform=global_step_from_engine(trainer))

    final = trainer.run([(pts, labels)] * 2, max_epochs=3)
    tb.close()

    assert final.iteration == 6 and len(logged) == 3
    assert "IoU" in evaluator.state.metrics
    assert 0.0 <= evaluator.state.metrics["IoU"] <= 1.0
    assert evaluator.state.metrics["loss"] > 0
    assert final.train_state.step == 6     # TrainState was threaded
    assert os.listdir(tmp_path / "ck")     # best model written
    (tb_file,) = os.listdir(tmp_path / "tb")
    scalars = read_scalars(os.path.join(tmp_path / "tb", tb_file))
    tags = {t for _, t, _ in scalars}
    assert "training/batch_loss" in tags and "validation/IoU" in tags
    # epoch-completed validation scalars carry the trainer's epoch as step
    assert {s for s, t, _ in scalars if t == "validation/IoU"} == {1, 2, 3}
