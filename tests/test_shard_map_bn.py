"""Explicit shard_map data parallelism with cross-replica BatchNorm
(axis_name) vs single-device global-batch training — must agree exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.models import DGCNNSemSeg
from dgcnn_tpu.parallel import DATA_AXIS, make_mesh
from dgcnn_tpu.parallel.data_parallel import make_shard_map_seg_train_step
from dgcnn_tpu.train import TrainState, make_optimizer, make_seg_steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_shard_map_crossreplica_bn_matches_global():
    n_dev = 8
    rng = np.random.RandomState(0)
    b = 2 * n_dev
    pts = jnp.asarray(rng.rand(b, 16, 9).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 13, size=(b, 16)))

    def make_state(model):
        variables = model.init({"params": jax.random.PRNGKey(0)}, pts,
                               train=False)
        tx = make_optimizer(use_sgd=True, schedule=lambda _: 0.01)
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables["batch_stats"], tx=tx,
        )

    # single device, global batch
    plain = DGCNNSemSeg(emb_dims=16, k=4, dropout=0.0)
    state0 = make_state(plain)
    train_step, _ = make_seg_steps(plain, with_label=False)
    s1, m1 = jax.jit(train_step)(state0, pts, seg, jax.random.PRNGKey(1))

    # shard_map across 8 devices with axis_name'd BN (explicit SyncBatchNorm)
    sharded = DGCNNSemSeg(emb_dims=16, k=4, dropout=0.0, axis_name=DATA_AXIS)
    state = make_state(sharded)

    # dropout=0 so the per-shard rng fold has no effect; wrap via the
    # partseg-style step (takes label arg) is not applicable — build inline
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import optax
    from dgcnn_tpu.train.loss import cross_entropy

    mesh = make_mesh(jax.devices()[:n_dev])

    def shard_step(state, points, seg, rng):
        def loss_fn(params, stats):
            logits, updates = sharded.apply(
                {"params": params, "batch_stats": stats},
                points, train=True, mutable=["batch_stats"],
            )
            # global mean loss: per-shard mean pmean'd
            return jax.lax.pmean(cross_entropy(logits, seg), DATA_AXIS), (
                logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt,
        ), loss

    state_spec = jax.tree.map(lambda _: P(), state)
    mapped = shard_map(
        shard_step, mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    s2, loss2 = jax.jit(mapped)(state, pts, seg, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(loss2), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(s1.batch_stats),
                     jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
