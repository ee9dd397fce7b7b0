"""Data-parallel execution over a device mesh (SURVEY.md §2.2, §5 distributed).

Replaces the reference's DDP + DistributedSampler + SyncBatchNorm + explicit
loss all-reduce (main_partseg_dist.py:151-156, 189-196, 291, 343) with GSPMD:
the train step is jitted with the batch sharded over the ``data`` axis and the
state replicated.  XLA then inserts
  * the gradient all-reduce (because the loss mean contracts the sharded
    batch axis),
  * global BatchNorm moments (batch-axis reductions inside BN see the full
    logical batch — SyncBatchNorm for free),
  * the loss-meter reduction.
No communication code appears here at all — that is the point.

``shard_map_train_step`` is the explicit-collectives variant of the same
computation (per-shard compute + lax.pmean of grads/metrics + axis_name'd BN)
for users who want visible communication structure; both paths are tested
against each other on the virtual CPU mesh.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from dgcnn_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated
from dgcnn_tpu.train.engine import TrainState
from dgcnn_tpu.train.loss import cross_entropy


def jit_data_parallel(step_fn: Callable, mesh: Mesh, n_sharded: int,
                      donate_state: bool = True):
    """Jit a step whose signature is (state, *batch_args[, rng]) with the
    first ``n_sharded`` batch args sharded on their leading axis.

    The global batch must be divisible by the mesh size (the engine's loaders
    pad to fixed shapes, so this holds by construction).
    """
    data = batch_sharding(mesh)
    repl = replicated(mesh)
    cache = {}

    def call(state, *args):
        nargs = len(args)
        if nargs not in cache:
            shardings = (repl,) + tuple(
                data if i < n_sharded else repl for i in range(nargs)
            )
            cache[nargs] = jax.jit(
                step_fn,
                in_shardings=shardings,
                donate_argnums=(0,) if donate_state else (),
            )
        return cache[nargs](state, *args)

    return call


def make_shard_map_seg_train_step(model, mesh: Mesh, smoothing: bool = True):
    """Explicit shard_map data-parallel train step for a segmentation model
    built with ``axis_name=DATA_AXIS`` (cross-replica BN via pmean inside the
    model).  Gradients and loss are psum-averaged across the axis — the
    explicit spelling of what GSPMD inserts automatically."""

    def loss_fn(params, batch_stats, points, label_one_hot, seg, rng):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            points,
            label_one_hot,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        return cross_entropy(logits, seg, smoothing), (
            logits, updates["batch_stats"],
        )

    def shard_step(state, points, label_one_hot, seg, rng):
        # per-shard rng so dropout differs across replicas
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, points, label_one_hot, seg, rng)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return state, {"loss": loss, "preds": jnp.argmax(logits, -1)}

    from jax import shard_map

    state_specs_cache = {}

    def step(state: TrainState, points, label_one_hot, seg, rng):
        state_spec = jax.tree.map(lambda _: P(), state)
        mapped = shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(state_spec, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(state_spec, {"loss": P(), "preds": P(DATA_AXIS)}),
            check_vma=False,
        )
        return jax.jit(mapped)(state, points, label_one_hot, seg, rng)

    return step
