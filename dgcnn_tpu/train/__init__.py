from dgcnn_tpu.train.checkpoint import (
    load_model,
    load_orbax,
    load_train_checkpoint,
    save_model,
    save_orbax,
    save_train_checkpoint,
)
from dgcnn_tpu.train.engine import (
    TrainState,
    make_cls_steps,
    make_optimizer,
    make_seg_steps,
)
from dgcnn_tpu.train.loss import cross_entropy
from dgcnn_tpu.train.metrics import (
    accuracy_score,
    balanced_accuracy_score,
    calculate_sem_IoU,
    calculate_shape_IoU,
    sem_iou_accumulate_device,
    shape_iou_device,
)
from dgcnn_tpu.train.schedules import (
    cosine_annealing,
    make_schedule,
    one_cycle,
    step_decay,
)

__all__ = [
    "load_model",
    "load_orbax",
    "load_train_checkpoint",
    "save_orbax",
    "save_model",
    "save_train_checkpoint",
    "TrainState",
    "make_cls_steps",
    "make_optimizer",
    "make_seg_steps",
    "cross_entropy",
    "accuracy_score",
    "balanced_accuracy_score",
    "calculate_sem_IoU",
    "calculate_shape_IoU",
    "sem_iou_accumulate_device",
    "shape_iou_device",
    "cosine_annealing",
    "make_schedule",
    "one_cycle",
    "step_decay",
]
