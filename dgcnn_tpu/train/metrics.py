"""Evaluation metrics (SURVEY.md §2 #23, #24 and the sklearn metrics the
engines print).

Host (numpy) implementations match the reference exactly:
  * ``calculate_shape_IoU`` — per-shape IoU over that category's part window
    (reference main_partseg.py:57-80); U == 0 counts as IoU 1.
  * ``calculate_sem_IoU`` — global per-class I/U accumulators over 13 classes
    (reference main_semseg.py:47-61).
  * ``accuracy_score`` / ``balanced_accuracy_score`` — sklearn semantics
    (mean recall over classes present in y_true) without the sklearn import.

Device implementations (``shape_iou_device``) compute the same numbers inside
jit with one-hot masks instead of python loops (SURVEY.md §7 hard-part 5) so
eval metrics never force a host round-trip per batch.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

# ShapeNetPart category tables (reference data.py:303-304)
SEG_NUM = [4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3]
INDEX_START = [0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47]
CLASS_CHOICES = [
    "airplane", "bag", "cap", "car", "chair", "earphone", "guitar", "knife",
    "lamp", "laptop", "motorbike", "mug", "pistol", "rocket", "skateboard",
    "table",
]


def accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    return float((y_true == y_pred).mean())


def balanced_accuracy_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Mean per-class recall over the classes present in y_true (sklearn)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    classes = np.unique(y_true)
    recalls = [
        (y_pred[y_true == c] == c).mean() for c in classes
    ]
    return float(np.mean(recalls))


def calculate_shape_IoU(
    pred_np: np.ndarray,
    seg_np: np.ndarray,
    label: np.ndarray,
    class_choice: Optional[str],
    visual: bool = False,
) -> List[float]:
    """Per-shape mean-over-parts IoU (reference main_partseg.py:57-80)."""
    label = np.asarray(label)
    if not visual:
        label = label.squeeze()
    shape_ious: List[float] = []
    for shape_idx in range(seg_np.shape[0]):
        if not class_choice:
            start = INDEX_START[int(np.ravel(label)[shape_idx])]
            num = SEG_NUM[int(np.ravel(label)[shape_idx])]
            parts = range(start, start + num)
        else:
            parts = range(SEG_NUM[int(np.ravel(label)[0])])
        part_ious = []
        for part in parts:
            i = np.sum((pred_np[shape_idx] == part) & (seg_np[shape_idx] == part))
            u = np.sum((pred_np[shape_idx] == part) | (seg_np[shape_idx] == part))
            part_ious.append(1.0 if u == 0 else i / float(u))
        shape_ious.append(float(np.mean(part_ious)))
    return shape_ious


def calculate_sem_IoU(
    pred_np: np.ndarray, seg_np: np.ndarray, visual: bool = False,
    num_classes: int = 13,
) -> np.ndarray:
    """Global per-class IoU across all blocks (reference main_semseg.py:47-61)."""
    i_all = np.zeros(num_classes)
    u_all = np.zeros(num_classes)
    pred_np = np.asarray(pred_np)
    seg_np = np.asarray(seg_np)
    for sem in range(num_classes):
        i_all[sem] = np.sum((pred_np == sem) & (seg_np == sem))
        u_all[sem] = np.sum((pred_np == sem) | (seg_np == sem))
    if visual:
        empty = u_all == 0
        i_all[empty] = 1
        u_all[empty] = 1
    # Non-visual mode keeps the reference's exact semantics (0/0 -> nan for
    # classes absent from both pred and gt, main_semseg.py:61); only the
    # RuntimeWarning is suppressed.
    with np.errstate(divide="ignore", invalid="ignore"):
        return i_all / u_all


def shape_iou_device(
    pred: jax.Array, seg: jax.Array, label: jax.Array
) -> jax.Array:
    """Jit-friendly per-shape IoU: one-hot masks over the 50 part ids windowed
    by each shape's category (no data-dependent ranges — SURVEY.md §7 #5).

    Args:
      pred, seg: (B, N) int part ids in [0, 50).
      label: (B,) int category ids in [0, 16).
    Returns:
      (B,) per-shape IoU.
    """
    nparts = 50
    p = jax.nn.one_hot(pred, nparts, dtype=jnp.float32)   # (B, N, P)
    s = jax.nn.one_hot(seg, nparts, dtype=jnp.float32)
    inter = jnp.sum(p * s, axis=1)                        # (B, P)
    union = jnp.sum(jnp.maximum(p, s), axis=1)
    iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))
    starts = jnp.asarray(INDEX_START)[label]              # (B,)
    nums = jnp.asarray(SEG_NUM)[label]
    part_ids = jnp.arange(nparts)[None, :]
    window = (part_ids >= starts[:, None]) & (part_ids < (starts + nums)[:, None])
    return jnp.sum(jnp.where(window, iou, 0.0), axis=1) / nums


def sem_iou_accumulate_device(
    pred: jax.Array, seg: jax.Array, num_classes: int = 13
) -> tuple[jax.Array, jax.Array]:
    """Per-class (I, U) partial sums for streaming semantic IoU inside jit."""
    p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.float32)
    s = jax.nn.one_hot(seg.reshape(-1), num_classes, dtype=jnp.float32)
    inter = jnp.sum(p * s, axis=0)
    union = jnp.sum(jnp.maximum(p, s), axis=0)
    return inter, union
