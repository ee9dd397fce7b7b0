"""Generic train/eval step factories (SURVEY.md §7 layer 4).

One step-fn factory covers every reference engine (main_cls.py:44-153,
main_partseg_dist.py:159-361, main_semseg.py:150-277): forward + label-smoothed
CE + backward + optimizer + per-batch schedule, all inside a single jit with
device-side metric outputs (the reference does per-batch D2H copies for its
metric accumulation — SURVEY.md §3.5 #6).

The reference's AMP fp16 + GradScaler (main_partseg_dist.py:221, 253-265) has
no TPU equivalent or need: matmuls run with bf16 multiplies under XLA's default
precision while parameters, accumulations and the optimizer stay f32, so there
is no loss-scale underflow problem to manage.

Data parallelism: jit these steps with a batch-sharded in_sharding over a
``Mesh`` (see dgcnn_tpu.parallel) — gradient all-reduce and global BatchNorm
statistics are inserted by GSPMD, replacing DDP + SyncBatchNorm.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from dgcnn_tpu.train.loss import (
    cross_entropy,
    cross_entropy_per_example,
    masked_mean_loss,
)


def train_rng(seed: int) -> jax.Array:
    """Key for the training-step rng stream (dropout masks, and — under the
    device pipeline — shuffle/augment draws).

    Default impl is ``rbg``: mask bits come from XLA's ``RngBitGenerator``
    (the TPU hardware generator) instead of threefry2x32.  The fusion-Net
    train step draws ~700M Bernoulli samples per step (14 residual/FF
    dropout masks over (2B, N, 512)); threefry computes them on the VPU at
    ~42 ms/step at the run.sh config while rbg is near-free
    (transformer-stack fwd+bwd 173.9 -> 132.1 ms, B24 N2048,
    tools/ubench_partseg_parts.py --grad --rng_impl).  Same Bernoulli
    distribution, different stream — the reference's torch streams never
    matched bitwise anyway (PARITY.md).  ``DGCNN_TPU_PALLAS_EXACT=1`` keeps
    threefry: its stream is backend-stable, which the pinned-trajectory
    tests rely on.

    rbg is TPU-only: on the CPU backend, a GSPMD-partitioned train step
    containing ``RngBitGenerator`` deadlocks XLA's in-process collectives
    (``AwaitAndLogIfStuck`` inside ``InProcessCommunicator::AllReduce``,
    observed on the 8-virtual-device test mesh) — so tests and the CPU
    dryrun keep threefry.
    """
    import os

    forced = os.environ.get("DGCNN_TPU_RNG", "")  # rbg | threefry | ""
    if forced == "threefry" or (
            not forced and os.environ.get("DGCNN_TPU_PALLAS_EXACT")):
        return jax.random.PRNGKey(seed)
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if forced != "rbg" and not on_tpu:
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl="rbg")


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def make_optimizer(
    *,
    use_sgd: bool,
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    adamw: bool = False,
    grad_accum: int = 1,
    momentum_schedule: Callable | None = None,
) -> optax.GradientTransformation:
    """Reference optimizer configs: SGD(lr*100, momentum, wd 1e-4) with
    L2-coupled decay (main_cls.py:67), Adam(lr, wd 1e-4) L2-coupled
    (main_cls.py:70), AdamW(lr, wd 1e-4) decoupled (main_partseg_dist.py:205).
    The lr x100 convention is applied by the schedule (schedules.make_schedule).
    ``grad_accum > 1`` enables gradient accumulation (the reference's
    commented-out accum_iter, main_partseg_dist.py:237-238) via
    optax.MultiSteps.

    ``momentum_schedule``: per-step momentum (SGD) / beta1 (Adam[W]) values,
    overriding the constant ``momentum`` — torch's OneCycleLR cycles these
    alongside the lr (``cycle_momentum=True`` default, which the reference's
    dist trainer inherits at main_partseg_dist.py:212); pass
    schedules.make_momentum_schedule's result.
    """
    if use_sgd:
        trace = (optax.inject_hyperparams(optax.trace)(
                     decay=momentum_schedule, nesterov=False)
                 if momentum_schedule is not None
                 else optax.trace(decay=momentum, nesterov=False))
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            trace,
            optax.scale_by_learning_rate(schedule),
        )
    elif adamw:
        if momentum_schedule is not None:
            tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=schedule, b1=momentum_schedule,
                weight_decay=weight_decay)
        else:
            tx = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        adam = (optax.inject_hyperparams(optax.scale_by_adam)(
                    b1=momentum_schedule)
                if momentum_schedule is not None else optax.scale_by_adam())
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            adam,
            optax.scale_by_learning_rate(schedule),
        )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def make_cls_steps(model, smoothing: bool = True, remat: bool = False):
    """(train_step, eval_step) for classification models taking (points,).

    train_step(state, points, labels, rng) -> (state, {loss, preds})
    eval_step(state, points, labels)       -> {loss, preds}
    ``remat``: rematerialize the forward under grad (jax.checkpoint) — trades
    FLOPs for activation memory on large N (SURVEY.md TPU-design notes).
    """

    def fwd_train(params, batch_stats, points, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            points,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )

    if remat:
        fwd_train = jax.checkpoint(fwd_train)

    def loss_fn(params, batch_stats, points, labels, rng):
        logits, updates = fwd_train(params, batch_stats, points, rng)
        return cross_entropy(logits, labels, smoothing), (
            logits,
            updates["batch_stats"],
        )

    @jax.jit
    def train_step(state: TrainState, points, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, points, labels, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return state, {"loss": loss, "preds": jnp.argmax(logits, -1)}

    @jax.jit
    def eval_step(state: TrainState, points, labels, mask=None):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            points,
            train=False,
        )
        # padded eval rows (static-shape remainder batches) are masked out
        # of the reported loss, not just the accuracy
        per_ex = cross_entropy_per_example(logits, labels, smoothing)
        return {
            "loss": masked_mean_loss(per_ex, mask),
            "preds": jnp.argmax(logits, -1),
        }

    return train_step, eval_step


def make_seg_steps(model, smoothing: bool = True, with_label: bool = True,
                   remat: bool = False):
    """(train_step, eval_step) for segmentation models.

    ``with_label``: partseg models take (points, category_one_hot); semseg
    models take (points,) only.  Logits are per-point (B, N, C); loss flattens
    (reference main_partseg_dist.py:256).
    ``remat``: rematerialize the forward under grad (jax.checkpoint).
    """

    def fwd(params, batch_stats, points, label_one_hot, train, rng):
        args = (points, label_one_hot) if with_label else (points,)
        kwargs = dict(train=train)
        if train:
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                *args,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
                **kwargs,
            )
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, *args, **kwargs
        ), None

    fwd_train = (jax.checkpoint(
        lambda p, bs, pts, lbl, rng: fwd(p, bs, pts, lbl, True, rng),
        static_argnums=()) if remat
        else (lambda p, bs, pts, lbl, rng: fwd(p, bs, pts, lbl, True, rng)))

    def loss_fn(params, batch_stats, points, label_one_hot, seg, rng):
        logits, updates = fwd_train(params, batch_stats, points,
                                    label_one_hot, rng)
        loss = cross_entropy(logits, seg, smoothing)
        return loss, (logits, updates["batch_stats"])

    def _train(state: TrainState, points, label_one_hot, seg, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, points, label_one_hot, seg, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return state, {"loss": loss, "preds": jnp.argmax(logits, -1)}

    def _eval(state: TrainState, points, label_one_hot, seg, mask):
        logits, _ = fwd(
            state.params, state.batch_stats, points, label_one_hot, False, None
        )
        per_ex = cross_entropy_per_example(logits, seg, smoothing)
        return {
            "loss": masked_mean_loss(per_ex, mask),
            "preds": jnp.argmax(logits, -1),
        }

    if with_label:
        def train_step(state, points, label_one_hot, seg, rng):
            return _train(state, points, label_one_hot, seg, rng)

        def eval_step(state, points, label_one_hot, seg, mask=None):
            return _eval(state, points, label_one_hot, seg, mask)
    else:
        def train_step(state, points, seg, rng):
            return _train(state, points, None, seg, rng)

        def eval_step(state, points, seg, mask=None):
            return _eval(state, points, None, seg, mask)

    return jax.jit(train_step), jax.jit(eval_step)
