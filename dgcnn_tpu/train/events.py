"""Event-driven trainer — the notebook's pytorch-ignite workflow, JAX-style.

The reference prototyping notebook (test.ipynb cells 49, 56-61) trains the
fusion Net with ``ignite``: an :class:`Engine` firing events, a
``ConfusionMatrix``-derived mIoU, ``ModelCheckpoint`` retaining the n best
models by score, and a ``TensorboardLogger``.  This module rebuilds that
capability natively: the engine threads an immutable
:class:`~dgcnn_tpu.train.engine.TrainState` through a jitted step function
instead of mutating an ``nn.Module``, metrics accumulate device-side
arrays, and TensorBoard files are written by the dependency-free
:mod:`dgcnn_tpu.utils.tbevents`.

Closes SURVEY.md §2 #33 (the last notebook capability).
"""
from __future__ import annotations

import enum
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from dgcnn_tpu.train.checkpoint import save_model
from dgcnn_tpu.utils.tbevents import SummaryWriter


class Events(enum.Enum):
    STARTED = "started"
    EPOCH_STARTED = "epoch_started"
    ITERATION_STARTED = "iteration_started"
    ITERATION_COMPLETED = "iteration_completed"
    EPOCH_COMPLETED = "epoch_completed"
    COMPLETED = "completed"

    def __call__(self, every: int = 1) -> "_FilteredEvent":
        """``Events.ITERATION_COMPLETED(every=2)`` — ignite's filter form."""
        return _FilteredEvent(self, every)


@dataclass(frozen=True)
class _FilteredEvent:
    event: Events
    every: int = 1


_EPOCH_SCOPED = (Events.EPOCH_STARTED, Events.EPOCH_COMPLETED,
                 Events.COMPLETED, Events.STARTED)


@dataclass
class State:
    """Engine run state (ignite ``engine.state`` surface subset)."""

    epoch: int = 0
    iteration: int = 0          # global, 1-based, survives across epochs
    max_epochs: int = 1
    output: Any = None          # last process-function output
    metrics: Dict[str, Any] = field(default_factory=dict)
    train_state: Any = None     # the threaded TrainState (trainer engines)


class Engine:
    """Minimal ignite-style engine.

    ``process_fn(engine, batch) -> output`` runs once per batch; handlers
    attach with :meth:`on`/:meth:`add_event_handler` and fire in
    registration order.
    """

    def __init__(self, process_fn: Callable[["Engine", Any], Any]):
        self._process = process_fn
        self._handlers: Dict[Events, List[Tuple[int, Callable, tuple]]] = {
            e: [] for e in Events}
        self.state = State()

    def add_event_handler(self, event, handler: Callable, *args) -> None:
        if isinstance(event, Events):
            event = _FilteredEvent(event, 1)
        self._handlers[event.event].append((event.every, handler, args))

    def on(self, event):
        """Decorator form: ``@engine.on(Events.EPOCH_COMPLETED)``."""

        def deco(fn):
            self.add_event_handler(event, fn)
            return fn

        return deco

    def _fire(self, event: Events) -> None:
        count = (self.state.epoch if event in _EPOCH_SCOPED
                 else self.state.iteration)
        for every, handler, args in self._handlers[event]:
            if count % max(every, 1) == 0:
                handler(self, *args)

    def run(self, data, max_epochs: int = 1) -> State:
        self.state.max_epochs = max_epochs
        self.state.epoch = 0
        self._fire(Events.STARTED)
        for _ in range(max_epochs):
            self.state.epoch += 1
            self._fire(Events.EPOCH_STARTED)
            for batch in data:
                self.state.iteration += 1
                self._fire(Events.ITERATION_STARTED)
                self.state.output = self._process(self, batch)
                self._fire(Events.ITERATION_COMPLETED)
            self._fire(Events.EPOCH_COMPLETED)
        self._fire(Events.COMPLETED)
        return self.state


def global_step_from_engine(engine: Engine) -> Callable:
    """Step provider reading the (other) engine's progress — epoch count
    for epoch-scoped events, global iteration otherwise (ignite cell 58)."""

    def step(_own_engine: Engine, event: Events) -> int:
        return (engine.state.epoch if event in _EPOCH_SCOPED
                else engine.state.iteration)

    return step


# ---------------------------------------------------------------------------
# Metrics.  Evaluator outputs are dicts {"preds", "y", "loss", ["mask"]};
# metrics accumulate numpy/device arrays and publish on EPOCH_COMPLETED.


class Metric:
    def reset(self) -> None:  # pragma: no cover - abstract
        raise NotImplementedError

    def update(self, output: Dict[str, Any]) -> None:  # pragma: no cover
        raise NotImplementedError

    def compute(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def _source(self) -> "Metric":
        """The object whose reset/update actually accumulate state.
        Derived metrics (IoU/mIoU over a shared ConfusionMatrix) return
        the shared source so attaching several of them to one engine
        updates it exactly ONCE per iteration (ignite's MetricsLambda
        dedupes its dependencies the same way)."""
        return self

    def attach(self, engine: Engine, name: str) -> None:
        src = self._source()
        attached = getattr(engine, "_metric_sources", None)
        if attached is None:
            attached = engine._metric_sources = set()
        if id(src) not in attached:  # one update per shared source
            attached.add(id(src))
            engine.add_event_handler(Events.EPOCH_STARTED,
                                     lambda e: src.reset())
            engine.add_event_handler(Events.ITERATION_COMPLETED,
                                     lambda e: src.update(e.state.output))
        engine.add_event_handler(
            Events.EPOCH_COMPLETED,
            lambda e: e.state.metrics.__setitem__(name, self.compute()))


class ConfusionMatrix(Metric):
    """Accumulated ``num_classes``² counts over flattened predictions."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self) -> None:
        self.cm = np.zeros((self.num_classes, self.num_classes), np.int64)

    def update(self, output: Dict[str, Any]) -> None:
        y_arr = np.asarray(output["y"])
        preds = np.asarray(output["preds"]).reshape(-1)
        y = y_arr.reshape(-1)
        mask = output.get("mask")
        if mask is not None:
            m = np.asarray(mask).astype(bool)
            # (B,) row mask against (B,) cls or (B, N, ...) seg targets
            m = m.reshape(m.shape + (1,) * (y_arr.ndim - m.ndim))
            keep = np.broadcast_to(m, y_arr.shape).reshape(-1)
            preds, y = preds[keep], y[keep]
        idx = y * self.num_classes + preds
        self.cm += np.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    def compute(self) -> np.ndarray:
        return self.cm.copy()


class IoU(Metric):
    """Per-class intersection-over-union derived from a shared
    :class:`ConfusionMatrix` (ignite's ``IoU(cm)`` lambda form)."""

    def __init__(self, cm: ConfusionMatrix):
        self.cm_metric = cm

    def _source(self) -> Metric:
        return self.cm_metric

    def reset(self) -> None:
        self.cm_metric.reset()

    def update(self, output: Dict[str, Any]) -> None:
        self.cm_metric.update(output)

    def compute(self) -> np.ndarray:
        cm = self.cm_metric.cm.astype(np.float64)
        inter = np.diag(cm)
        union = cm.sum(0) + cm.sum(1) - inter
        return np.where(union > 0, inter / np.maximum(union, 1), np.nan)


class mIoU(IoU):  # noqa: N801 - ignite's capitalisation
    def compute(self) -> float:
        per_class = super().compute()
        return float(np.nanmean(per_class))


class Loss(Metric):
    """Batch-size-weighted mean of the step outputs' ``loss``."""

    def reset(self) -> None:
        self.total, self.count = 0.0, 0

    def update(self, output: Dict[str, Any]) -> None:
        n = int(np.asarray(output["y"]).shape[0])
        mask = output.get("mask")
        if mask is not None:
            n = int(np.asarray(mask).sum())
        self.total += float(output["loss"]) * n
        self.count += n

    def compute(self) -> float:
        return self.total / max(self.count, 1)


# ---------------------------------------------------------------------------
# Supervised engine factories over the jitted step functions.


def create_supervised_trainer(train_state, train_step, rng) -> Engine:
    """Engine over ``train_step(state, *batch, rng) -> (state, aux)``.

    The TrainState is threaded functionally: each iteration reads
    ``engine.state.train_state`` and writes the updated one back.  The
    engine output is the scalar loss (matching ignite's default
    ``engine.state.output`` in cell 57's log handler).
    """

    def process(engine: Engine, batch) -> float:
        new_state, aux = train_step(engine.state.train_state, *batch, rng)
        engine.state.train_state = new_state
        return float(aux["loss"])

    engine = Engine(process)
    engine.state.train_state = train_state
    return engine


def create_supervised_evaluator(train_state, eval_step,
                                metrics: Optional[Dict[str, Metric]] = None
                                ) -> Engine:
    """Engine over ``eval_step(state, *batch) -> {"loss", "preds"}``.

    Each batch is ``(*inputs, y)``; the output dict feeds the metrics.
    The evaluator reads ``train_state`` lazily if given a callable, so the
    notebook pattern (evaluate the trainer's current weights each epoch)
    works without re-creating the engine.
    """

    def process(engine: Engine, batch) -> Dict[str, Any]:
        state = train_state() if callable(train_state) else train_state
        *inputs, y = batch
        out = eval_step(state, *inputs, y)
        return {"preds": out["preds"], "y": y, "loss": float(out["loss"])}

    engine = Engine(process)
    for name, metric in (metrics or {}).items():
        metric.attach(engine, name)
    return engine


# ---------------------------------------------------------------------------
# Handlers.


class ModelCheckpoint:
    """Retain the ``n_saved`` best checkpoints by ``score_function``.

    File naming follows ignite:
    ``{prefix}_{name}_{global_step}_{score_name}={score:.4f}.ckpt``
    (cell 58's handler saves ``best_model_<epoch>_IoU=<miou>.pt``).
    Checkpoints are msgpack variable dicts via
    :func:`dgcnn_tpu.train.checkpoint.save_model`.
    """

    def __init__(self, dirname: str, filename_prefix: str = "",
                 n_saved: int = 1,
                 score_function: Optional[Callable[[Engine], float]] = None,
                 score_name: str = "score", require_empty: bool = True,
                 global_step_transform: Optional[Callable] = None):
        self.dirname = dirname
        self.prefix = filename_prefix
        self.n_saved = n_saved
        self.score_function = score_function
        self.score_name = score_name
        self.global_step_transform = global_step_transform
        self._saved: List[Tuple[float, List[str]]] = []
        if require_empty and os.path.isdir(dirname) and os.listdir(dirname):
            raise ValueError(
                f"checkpoint dir {dirname!r} is not empty "
                "(pass require_empty=False to reuse it)")
        os.makedirs(dirname, exist_ok=True)

    def __call__(self, engine: Engine, to_save: Dict[str, Any]) -> None:
        score = (self.score_function(engine) if self.score_function
                 else -float(engine.state.iteration))
        if (len(self._saved) >= self.n_saved
                and score <= min(s for s, _ in self._saved)):
            return
        step = (self.global_step_transform(engine, Events.EPOCH_COMPLETED)
                if self.global_step_transform else engine.state.iteration)
        paths = []
        for name, variables in to_save.items():
            parts = [p for p in (self.prefix, name, str(step)) if p]
            fname = "_".join(parts)
            if self.score_function is not None:
                fname += f"_{self.score_name}={score:.4f}"
            path = os.path.join(self.dirname, fname + ".ckpt")
            save_model(path, variables)
            paths.append(path)
        # one slot per CALL (a checkpoint GROUP, like ignite): a multi-object
        # to_save is retained or pruned as a unit, never half-deleted
        self._saved.append((score, paths))
        self._saved.sort(key=lambda sp: sp[0], reverse=True)
        while len(self._saved) > self.n_saved:
            _, stale_paths = self._saved.pop()
            for stale in stale_paths:
                if os.path.exists(stale):
                    os.remove(stale)

    @property
    def last_checkpoint(self) -> Optional[str]:
        return self._saved[0][1][0] if self._saved else None


class TensorboardLogger:
    """Scalar logging to TensorBoard event files (cell 59's surface)."""

    def __init__(self, log_dir: str):
        self.writer = SummaryWriter(log_dir)

    def attach_output_handler(self, engine: Engine, event_name, tag: str,
                              output_transform: Optional[Callable] = None,
                              metric_names="all",
                              global_step_transform: Optional[Callable] = None
                              ) -> None:
        if isinstance(event_name, Events):
            event_name = _FilteredEvent(event_name, 1)

        def handler(e: Engine) -> None:
            step_fn = global_step_transform or global_step_from_engine(e)
            step = step_fn(e, event_name.event)
            scalars: Dict[str, float] = {}
            if output_transform is not None:
                scalars.update(output_transform(e.state.output))
            elif metric_names == "all":
                scalars.update({k: v for k, v in e.state.metrics.items()
                                if np.isscalar(v) or np.ndim(v) == 0})
            elif metric_names:
                scalars.update({k: e.state.metrics[k] for k in metric_names
                                if k in e.state.metrics})
            for name, value in scalars.items():
                self.writer.add_scalar(f"{tag}/{name}", float(value), step)
            self.writer.flush()

        engine.add_event_handler(event_name, handler)

    def log_scalars(self, tag: str, scalars: Dict[str, float],
                    step: int) -> None:
        """Direct (engine-less) logging surface for the CLI train loops
        (``--tensorboard``, cli/common.py::make_tb_logger): one call per
        epoch phase writes ``<tag>/<name>`` curves readable by TensorBoard
        and by utils/tbevents.read_scalars."""
        for name, value in scalars.items():
            self.writer.add_scalar(f"{tag}/{name}", float(value), step)
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
