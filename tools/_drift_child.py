#!/usr/bin/env python
"""Child process of tools/parity_drift.py: one eval forward of one model
config on the current backend, logits saved to .npy.

Runs in its own process because the Pallas extraction variant / exact mode
(DGCNN_TPU_PALLAS_EXACT, DGCNN_TPU_EXTRACT) are read at TRACE time and some
fused kernels (e.g. fused_knn_edge2) have no mode-distinguishing static
argument — two modes in one process would hit a stale jit cache.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["cls", "partseg", "semseg"])
    p.add_argument("out")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--points", type=int, default=0)  # 0 = config default
    p.add_argument("--k", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train", action="store_true",
                   help="one TRAIN-mode forward+grad instead (dropout=0 so "
                        "exact/AMP differ only in kernel numerics, not in "
                        "mask streams); saves loss + flat grad vector")
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    defaults = {"cls": (1024, 20), "partseg": (2048, 32), "semseg": (4096, 20)}
    n = args.points or defaults[args.model][0]
    k = args.k or defaults[args.model][1]
    rng = np.random.RandomState(args.seed)

    drop = dict(dropout=0.0) if args.train else {}
    if args.model == "cls":
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=1024, k=k, output_channels=40, **drop)
        inputs = (jnp.asarray(rng.randn(args.batch, n, 3).astype(np.float32)),)
        targets = jnp.asarray(rng.randint(0, 40, size=(args.batch,)))
    elif args.model == "partseg":
        from dgcnn_tpu.models import Net

        model = Net(emb_dim=512, k=k, n_heads=2, n_blocks=2, ff_dims=512,
                    d_qkv=64, nclasses=50, **drop)
        pts = jnp.asarray(rng.randn(args.batch, n, 3).astype(np.float32))
        lbl = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, args.batch)])
        inputs = (pts, lbl)
        targets = jnp.asarray(rng.randint(0, 50, size=(args.batch, n)))
    else:
        from dgcnn_tpu.models import DGCNNSemSeg

        model = DGCNNSemSeg(emb_dims=1024, k=k, **drop)
        pts = rng.rand(args.batch, n, 9).astype(np.float32)
        pts[:, n - n // 4:] = pts[:, :n // 4]  # S3DIS-style duplicates
        inputs = (jnp.asarray(pts),)
        targets = jnp.asarray(rng.randint(0, 13, size=(args.batch, n)))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *inputs, train=False)

    if args.train:
        # TRAIN-mode numerics drift: loss + grads through the training
        # kernel path (bf16x3 scores, packed-v2 extraction, bf16 selection
        # on AMP; HIGHEST + v1 under DGCNN_TPU_PALLAS_EXACT=1).  Dropout
        # is 0 so both paths see identical (deterministic) computation.
        from dgcnn_tpu.train.loss import cross_entropy

        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                *inputs, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return cross_entropy(logits, targets, smoothing=True)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"])
        flat = jnp.concatenate(
            [g.reshape(-1).astype(jnp.float32)
             for g in jax.tree.leaves(grads)])
        np.savez(args.out, loss=np.asarray(loss, np.float32),
                 grad=np.asarray(flat))
        return

    logits = jax.jit(
        lambda v, i: model.apply(v, *i, train=False))(variables, inputs)
    np.save(args.out, np.asarray(logits, dtype=np.float32))


if __name__ == "__main__":
    main()
