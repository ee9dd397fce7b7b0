"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4: the
JAX-native fake backend for sharded code paths)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgcnn_tpu.models import DGCNNSemSeg
from dgcnn_tpu.parallel import jit_data_parallel, make_mesh
from dgcnn_tpu.train import TrainState, make_optimizer, make_seg_steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tiny_state_and_batch(n_dev):
    model = DGCNNSemSeg(emb_dims=16, k=4, dropout=0.0)
    rng = np.random.RandomState(0)
    b = 2 * n_dev
    pts = jnp.asarray(rng.rand(b, 16, 9).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 13, size=(b, 16)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts, train=False)
    tx = make_optimizer(use_sgd=True, schedule=lambda _: 0.01)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    return model, state, pts, seg


def test_sharded_train_step_matches_single_device():
    """GSPMD-sharded step == single-device step bit-for-bit-tolerant: global
    BN stats and grad all-reduce must reproduce the unsharded computation."""
    n_dev = 8
    model, state, pts, seg = _tiny_state_and_batch(n_dev)
    train_step, _ = make_seg_steps(model, with_label=False)

    single = jax.jit(train_step)
    s1, m1 = single(state, pts, seg, jax.random.PRNGKey(1))

    mesh = make_mesh(jax.devices()[:n_dev])
    call = jit_data_parallel(train_step, mesh, n_sharded=2, donate_state=False)
    s2, m2 = call(state, pts, seg, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # BN running stats (SyncBatchNorm semantics) must also agree
    for a, b in zip(
        jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s2.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


_MULTIHOST_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["DGCNN_REPO"])
import jax
# axon plugin ignores the JAX_PLATFORMS env var; select CPU via config
jax.config.update("jax_platforms", "cpu")

from dgcnn_tpu.parallel.mesh import distributed_init, make_mesh, DATA_AXIS

distributed_init()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

rank = jax.process_index()
mesh = make_mesh()
sharding = NamedSharding(mesh, P(DATA_AXIS))
local = np.array([float(rank + 1)], np.float32)
garr = jax.make_array_from_process_local_data(sharding, local,
                                              global_shape=(2,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
val = float(np.asarray(total.addressable_shards[0].data))
assert val == 3.0, val  # cross-process psum: 1 + 2
print("MULTIHOST_OK", rank, flush=True)
"""


def test_distributed_init_two_process_smoke(tmp_path):
    """2-process jax.distributed bring-up on localhost: distributed_init
    forms the rendezvous from env vars (the reference's MASTER_ADDR/RANK
    equivalent, main_partseg_dist.py:481-486) and a cross-process reduction
    executes over the global mesh."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_MULTIHOST_WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   DGCNN_REPO=repo,
                   JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2",
                   JAX_PROCESS_ID=str(rank))
        env.pop("COORDINATOR_ADDRESS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST_OK {rank}" in out


def test_resident_epoch_mesh_matches_single_device():
    """Device-pipeline epochs under a mesh (sharding-constrained batches)
    == the same epochs unsharded: GSPMD inserts grad all-reduce + global
    BN without changing the math."""
    from dgcnn_tpu.data.device_pipeline import resident_train_epoch_fn

    n_dev = 8
    model, state, pts, seg = _tiny_state_and_batch(n_dev)
    train_step, _ = make_seg_steps(model, with_label=False)
    arrays = {"points": pts, "seg": seg}

    def step(st, batch, rng):
        return train_step(st, batch["points"], batch["seg"], rng)

    key = jax.random.PRNGKey(5)
    s1, m1 = resident_train_epoch_fn(step)(state, arrays, key, 8)

    # rebuild state (the first call donated it)
    _, state2, _, _ = _tiny_state_and_batch(n_dev)
    mesh = make_mesh(jax.devices()[:n_dev])
    s2, m2 = resident_train_epoch_fn(step, mesh=mesh)(
        state2, arrays, key, 8)

    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
