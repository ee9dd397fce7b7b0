#!/usr/bin/env python
"""TRAIN-step throughput (fwd + bwd + optimizer update) on the real chip —
the number behind CLAUDE.md's train-path notes.  Same chained-fori_loop +
host-readback harness as bench.py (axon's block_until_ready returns early).

--model cls     (default) DGCNN-cls, B=32 N=1024 k=20 (main_cls.py config)
--model partseg fusion Net at the fork's run.sh hyperparams
                (B=24 global, N=2048, k=32, emb 512, heads 2, blocks 2)
--model semseg  DGCNN-semseg on 4096-pt 9-channel blocks, B=32

DGCNN_TPU_PALLAS_EXACT=1 measures the exact-selection train path.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULTS = {  # (batch, n, k) per model
    "cls": (32, 1024, 20),
    "partseg": (24, 2048, 32),
    "semseg": (32, 4096, 20),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("cls", "partseg", "semseg"),
                   default="cls")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dropout", type=float, default=None,
                   help="override model dropout (partseg: 0 turns flash "
                        "attention on in training — bounds the win of a "
                        "dropout-capable flash kernel)")
    p.add_argument("--epoch", action="store_true",
                   help="also measure a ModelNet40-scale (9840-sample) "
                        "resident train epoch (--device_pipeline path: "
                        "shuffle+gather+augment+step in one lax.scan)")
    p.add_argument("--items", type=int, default=9840)
    args = p.parse_args()
    db, dn, dk = DEFAULTS[args.model]
    args.batch = db if args.batch is None else args.batch
    args.n = dn if args.n is None else args.n
    args.k = dk if args.k is None else args.k

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.train import (
        TrainState,
        make_cls_steps,
        make_optimizer,
        make_seg_steps,
        train_rng,
    )

    rng = np.random.RandomState(0)
    if args.model == "cls":
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=1024, k=args.k, output_channels=40)
        points = jnp.asarray(
            rng.randn(args.batch, args.n, 3).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 40, size=(args.batch,)))
        init_args, extra = (points,), (labels,)
        make_steps = make_cls_steps
        name = "DGCNN-cls"
    elif args.model == "partseg":
        from dgcnn_tpu.models import Net

        kw = {} if args.dropout is None else {"dropout": args.dropout}
        model = Net(emb_dim=512, k=args.k, n_heads=2, n_blocks=2,
                    ff_dims=512, d_qkv=64, nclasses=50, **kw)
        points = jnp.asarray(
            rng.randn(args.batch, args.n, 3).astype(np.float32))
        lbl1h = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, args.batch)])
        seg = jnp.asarray(rng.randint(0, 50, size=(args.batch, args.n)))
        init_args, extra = (points, lbl1h), (lbl1h, seg)
        make_steps = make_seg_steps
        name = "fusion-Net partseg"
    else:
        from dgcnn_tpu.models import DGCNNSemSeg

        model = DGCNNSemSeg(emb_dims=1024, k=args.k)
        points = jnp.asarray(
            rng.rand(args.batch, args.n, 9).astype(np.float32))
        seg = jnp.asarray(rng.randint(0, 13, size=(args.batch, args.n)))
        init_args, extra = (points,), (seg,)

        def make_steps(m):
            return make_seg_steps(m, with_label=False)

        name = "DGCNN-semseg"

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *init_args, train=False)
    tx = make_optimizer(use_sgd=True, schedule=lambda _: 1e-3)
    state0 = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx)
    train_step, _ = make_steps(model)

    def chained(state, pts, iters):
        def body(_, carry):
            st, p = carry
            st, m = train_step(st, p, *extra, train_rng(2))
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
        "metric": f"{name} TRAIN step clouds/sec/chip",
        "shape": f"B{args.batch} N{args.n} k{args.k}",
        "mode": ("exact" if os.environ.get("DGCNN_TPU_PALLAS_EXACT")
                 else "amp"),
        "ms_per_step": round(per_iter * 1e3, 2),
        "clouds_per_sec": round(args.batch / per_iter, 1),
    }), flush=True)

    if args.epoch:
        assert args.model == "cls", "--epoch measures the cls resident path"
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
                                jax.random.fold_in(train_rng(7), e),
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
