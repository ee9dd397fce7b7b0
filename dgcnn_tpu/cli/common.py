"""Shared CLI plumbing (SURVEY.md §2 #32 output scaffolding, §5 config system).

Flag surfaces of the four entry points mirror the reference argparse blocks.
One conscious fix (SURVEY.md §7 quirk 6): the reference's ``type=bool`` flags
parse any non-empty string as True (``--eval=False`` evaluates True!); here
boolean flags parse "true/false/1/0" properly.
"""
from __future__ import annotations

import argparse
import os
import shutil
from typing import List, Optional

import numpy as np


def add_runtime_flags(parser: argparse.ArgumentParser) -> None:
    """Framework extensions beyond the reference flag surface (SURVEY.md §5:
    the reference ships no tracing or sanitizers)."""
    parser.add_argument(
        "--profile", type=str, default="",
        help="capture an XLA profiler trace of the first epoch to this "
             "directory ('auto' = outputs/<exp>/profile)")
    parser.add_argument(
        "--debug_nans", type=str2bool, default=False,
        help="enable jax_debug_nans (fail at the op producing a NaN)")
    parser.add_argument(
        "--remat", type=str2bool, default=False,
        help="rematerialize the forward under grad (jax.checkpoint): trades "
             "FLOPs for activation memory on large N")
    parser.add_argument(
        "--num_workers", type=int, default=None,
        help="input-pipeline worker processes (reference DataLoader "
             "num_workers=8, main_cls.py:45-48); 0 = inline vectorized "
             "batch assembly (data/pipeline.py — the right default for "
             "few-core hosts).  Unset: the DGCNN_TPU_WORKERS env (0 if "
             "absent); an explicit value overrides and resets the env")
    parser.add_argument(
        "--tensorboard", type=str2bool, default=False,
        help="write per-epoch TensorBoard scalar event files under "
             "outputs/<exp>/tb/ (train/test loss, acc, iou) — the "
             "reference prototyped this with ignite's TensorboardLogger "
             "(test.ipynb cells 56-61); here the from-scratch event "
             "writer (utils/tbevents.py) needs no tensorboard package")
    parser.add_argument(
        "--orbax", type=str2bool, default=False,
        help="use orbax for the partseg trainer's checkpoints — both the "
             "periodic resume checkpoint and the best-model save (cls/"
             "semseg keep bare .t7.msgpack model files, mirroring the "
             "reference's bare state_dict saves there)")


def apply_runtime_flags(args) -> None:
    if getattr(args, "num_workers", None) is not None:
        # make_loader (data/pipeline.py) reads this at construction time;
        # an explicit flag (including --num_workers=0) overrides and resets
        # any value left by an earlier main() in the same process; with the
        # flag unset the DGCNN_TPU_WORKERS env workflow keeps working
        os.environ["DGCNN_TPU_WORKERS"] = str(args.num_workers)
    if getattr(args, "debug_nans", False):
        from dgcnn_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging()
    if getattr(args, "profile", ""):
        if args.profile == "auto":
            args.profile = os.path.join("outputs", args.exp_name, "profile")


def make_tb_logger(args):
    """``--tensorboard``: a TensorboardLogger writing to outputs/<exp>/tb
    (train/events.py on top of the from-scratch event writer,
    utils/tbevents.py), or None when the flag is off."""
    if not getattr(args, "tensorboard", False):
        return None
    from dgcnn_tpu.train.events import TensorboardLogger

    return TensorboardLogger(os.path.join("outputs", args.exp_name, "tb"))


def profile_epoch(args, epoch: int):
    """Context manager tracing epoch 0 when --profile is set."""
    import contextlib

    if getattr(args, "profile", "") and epoch == 0:
        from dgcnn_tpu.utils.profiling import trace

        return trace(args.profile)
    return contextlib.nullcontext()


def band_arg(v: str) -> int:
    """argparse type for ``--fast_extract``: a band width that the banded
    kernels can actually honour (ops/pallas_banded.banded_applicable needs a
    positive multiple of TILE_N=128; 0 pins the exact path).  Rejecting at
    parse time replaces the old silent exact fallback for e.g. band=1000."""
    try:
        band = int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(f"integer band expected, got {v!r}")
    if band < 0 or band % 128:
        raise argparse.ArgumentTypeError(
            f"band must be 0 (exact) or a positive multiple of 128, "
            f"got {band}")
    return band


def fast_extract_pin(band: Optional[int], num_points: int = 0):
    """Scope DGCNN_TPU_FAST_EXTRACT for one CLI entry point (the banded
    approximate-kNN opt-in is a trace-time env, ops/pallas_banded.py).

    ``None``  (flag not given)   — leave any inherited env in effect;
    ``0``     (--fast_extract=0) — force the EXACT path: strip an inherited
                                   band for the call's duration;
    ``band>0``                   — pin that band.
    The pre-existing env value is restored on exit either way, so looping
    over CLIs in one process cannot leak a pin."""
    import contextlib
    import sys as _sys

    if band is None:
        return contextlib.nullcontext()
    if band and num_points and band >= num_points:
        print(f"WARNING: --fast_extract={band} >= num_points={num_points}: "
              f"banding cannot prune anything; running the exact path",
              file=_sys.stderr)

    @contextlib.contextmanager
    def _pin():
        old = os.environ.get("DGCNN_TPU_FAST_EXTRACT")
        if band:
            os.environ["DGCNN_TPU_FAST_EXTRACT"] = str(band)
        else:
            os.environ.pop("DGCNN_TPU_FAST_EXTRACT", None)
        try:
            yield
        finally:
            if old is None:
                os.environ.pop("DGCNN_TPU_FAST_EXTRACT", None)
            else:
                os.environ["DGCNN_TPU_FAST_EXTRACT"] = old

    return _pin()


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def init_output_dir(exp_name: str, entry_file: str) -> str:
    """outputs/<exp>/{models,visualization,checkpoints} + source snapshot
    backups (reference main_cls.py:32-42)."""
    exp_dir = os.path.join("outputs", exp_name)
    for sub in ["models", "visualization", "checkpoints"]:
        os.makedirs(os.path.join(exp_dir, sub), exist_ok=True)
    for src in [entry_file]:
        if os.path.exists(src):
            shutil.copyfile(
                src, os.path.join(exp_dir, os.path.basename(src) + ".backup")
            )
    return exp_dir


def pick_devices(no_accelerator: bool = False):
    """Device selection; ``--no_cuda`` maps to forcing the CPU backend."""
    import jax

    if no_accelerator:
        cpus = jax.devices("cpu")
        return cpus
    return jax.devices()


def build_data_parallel_call(step_fn, devices, batch_size: int,
                             n_sharded: int, donate: bool = False):
    """Jit a step with the batch sharded over a 1-D mesh when the batch size
    divides the device count; otherwise plain jit on the first device
    (the reference's DataParallel analogue, main_cls.py:62).

    ``donate=True`` donates the state buffer — use only for train steps where
    the caller rebinds the returned state."""
    import jax

    from dgcnn_tpu.parallel import jit_data_parallel, make_mesh

    if len(devices) > 1 and batch_size % len(devices) == 0:
        mesh = make_mesh(devices)
        return jit_data_parallel(step_fn, mesh, n_sharded,
                                 donate_state=donate)
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def call(state, *args):
        return jitted(state, *args)

    return call


class MeterAccumulator:
    """Host-side metric accumulation mirroring the reference engines' lists
    (e.g. main_cls.py:87-119) with padded-row masking."""

    def __init__(self):
        self.loss_sum = 0.0
        self.count = 0
        self.true: List[np.ndarray] = []
        self.pred: List[np.ndarray] = []
        self.true_seg: List[np.ndarray] = []
        self.pred_seg: List[np.ndarray] = []
        self.label_seg: List[np.ndarray] = []

    def add_cls(self, loss: float, preds: np.ndarray, labels: np.ndarray,
                mask: np.ndarray) -> None:
        real = int(mask.sum())
        self.loss_sum += float(loss) * real
        self.count += real
        self.true.append(np.asarray(labels)[mask])
        self.pred.append(np.asarray(preds)[mask])

    def add_seg(self, loss: float, preds: np.ndarray, seg: np.ndarray,
                labels: Optional[np.ndarray], mask: np.ndarray) -> None:
        real = int(mask.sum())
        self.loss_sum += float(loss) * real
        self.count += real
        p = np.asarray(preds)[mask]
        s = np.asarray(seg)[mask]
        self.true.append(s.reshape(-1))
        self.pred.append(p.reshape(-1))
        self.true_seg.append(s)
        self.pred_seg.append(p)
        if labels is not None:
            self.label_seg.append(np.ravel(np.asarray(labels)[mask]))

    @property
    def mean_loss(self) -> float:
        return self.loss_sum / max(self.count, 1)

    def concat(self):
        return np.concatenate(self.true), np.concatenate(self.pred)

    def concat_seg(self):
        return (
            np.concatenate(self.true_seg, 0),
            np.concatenate(self.pred_seg, 0),
            np.concatenate(self.label_seg) if self.label_seg else None,
        )
