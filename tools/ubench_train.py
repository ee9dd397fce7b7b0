#!/usr/bin/env python
"""DGCNN-cls TRAIN-step throughput (fwd + bwd + optimizer update) on the
real chip — the number behind CLAUDE.md's train-path notes.  Same
chained-fori_loop + host-readback harness as bench.py (axon's
block_until_ready returns early).

Default config: B=32 (reference main_cls.py batch_size), N=1024, k=20.
DGCNN_TPU_PALLAS_EXACT=1 measures the exact-selection train path.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--epoch", action="store_true",
                   help="also measure a ModelNet40-scale (9840-sample) "
                        "resident train epoch (--device_pipeline path: "
                        "shuffle+gather+augment+step in one lax.scan)")
    p.add_argument("--items", type=int, default=9840)
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.models import DGCNNCls
    from dgcnn_tpu.train import TrainState, make_cls_steps, make_optimizer

    model = DGCNNCls(emb_dims=1024, k=args.k, output_channels=40)
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, size=(args.batch,)))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        points, train=False)
    tx = make_optimizer(use_sgd=True, schedule=lambda _: 1e-3)
    state0 = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)
    train_step, _ = make_cls_steps(model)

    def chained(state, pts, iters):
        def body(_, carry):
            st, p = carry
            st, m = train_step(st, p, labels, jax.random.PRNGKey(2))
            return st, p + m["loss"] * 1e-12
        st, p = jax.lax.fori_loop(0, iters, body, (state, pts))
        # readback must depend on the trained params AND the chained input
        # (st.step alone is a counter XLA computes without the model)
        psum = jax.tree.reduce(
            lambda a, b: a + jnp.sum(b) * 1e-12, st.params, jnp.float32(0))
        return psum + jnp.sum(p) * 1e-12

    run = jax.jit(chained, static_argnums=(2,))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        float(run(state0, points, iters))
        return time.perf_counter() - t0

    timed(1)
    timed(args.iters)
    base = min(timed(1) for _ in range(3))
    total = min(timed(args.iters) for _ in range(3))
    per_iter = (total - base) / (args.iters - 1)
    print(json.dumps({
        "metric": "DGCNN-cls TRAIN step clouds/sec/chip",
        "shape": f"B{args.batch} N{args.n} k{args.k}",
        "mode": ("exact" if os.environ.get("DGCNN_TPU_PALLAS_EXACT")
                 else "amp"),
        "ms_per_step": round(per_iter * 1e3, 2),
        "clouds_per_sec": round(args.batch / per_iter, 1),
    }), flush=True)

    if args.epoch:
        from dgcnn_tpu.data.device_pipeline import (
            augment_cls,
            resident_train_epoch_fn,
        )

        arrays = {
            "points": jnp.asarray(
                rng.randn(args.items, args.n, 3).astype(np.float32)),
            "label": jnp.asarray(
                rng.randint(0, 40, size=(args.items,)).astype(np.int32)),
        }

        def step(st, batch, r):
            return train_step(st, batch["points"], batch["label"], r)

        epoch_fn = resident_train_epoch_fn(step, augment_cls)
        nb = args.items // args.batch

        def run_epoch(st, e):
            st, mets = epoch_fn(st, arrays,
                                jax.random.fold_in(jax.random.PRNGKey(7), e),
                                args.batch)
            float(jnp.sum(mets["loss"]))  # completion readback
            return st

        st = run_epoch(state0, 0)  # warm compile
        best = float("inf")
        for e in range(1, 3):
            t0 = time.perf_counter()
            st = run_epoch(st, e)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": "resident TRAIN epoch clouds/sec/chip",
            "shape": f"M{args.items} B{args.batch} N{args.n} k{args.k}",
            "clouds_per_sec": round(nb * args.batch / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
