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

    if args.model == "cls":
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=1024, k=k, output_channels=40)
        inputs = (jnp.asarray(rng.randn(args.batch, n, 3).astype(np.float32)),)
    elif args.model == "partseg":
        from dgcnn_tpu.models import Net

        model = Net(emb_dim=512, k=k, n_heads=2, n_blocks=2, ff_dims=512,
                    d_qkv=64, nclasses=50)
        pts = jnp.asarray(rng.randn(args.batch, n, 3).astype(np.float32))
        lbl = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, args.batch)])
        inputs = (pts, lbl)
    else:
        from dgcnn_tpu.models import DGCNNSemSeg

        model = DGCNNSemSeg(emb_dims=1024, k=k)
        pts = rng.rand(args.batch, n, 9).astype(np.float32)
        pts[:, n - n // 4:] = pts[:, :n // 4]  # S3DIS-style duplicates
        inputs = (jnp.asarray(pts),)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *inputs, train=False)
    logits = jax.jit(
        lambda v, i: model.apply(v, *i, train=False))(variables, inputs)
    np.save(args.out, np.asarray(logits, dtype=np.float32))


if __name__ == "__main__":
    main()
