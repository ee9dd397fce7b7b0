#!/usr/bin/env python
"""Headline benchmark: ModelNet40 DGCNN classification inference throughput,
1024 points, k=20 (BASELINE.json config 1), on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measurement notes:
  * On the axon-tunnelled TPU, ``block_until_ready`` returns before remote
    execution completes, so naive dispatch loops measure nothing.  The bench
    chains ``ITERS`` forwards inside one jitted ``lax.fori_loop`` (each
    iteration's input perturbed by the previous output so nothing folds away)
    and forces a scalar host readback; RPC overhead is removed by
    differencing a 1-iteration run.
  * vs_baseline: the reference publishes no throughput numbers (SURVEY.md
    §6); the denominator is the commonly measured DGCNN inference rate on the
    CUDA-10-era GPUs the reference targeted (~batch 32 in ~60 ms on a
    1080Ti-class card => ~500 clouds/sec).  BASELINE.json's north-star is
    >=10x that on a v5e chip, i.e. vs_baseline >= 10.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Per-config PyTorch-GPU denominators (the reference publishes no throughput
# numbers, SURVEY.md §6; these are order-of-magnitude estimates for the
# CUDA-10-era GPUs it targeted):
#   cls      ~500 clouds/s  (batch 32 in ~60 ms, 1080Ti-class)
#   partseg  ~30 clouds/s   (the fusion Net round-trips a CPU LAPACK SVD over
#                            B*N 3xk neighbourhoods every batch,
#                            model_partseg.py:36-47 — it dominates)
#   semseg   ~120 clouds/s  (4x the cls point count, O(N^2) knn)
REF_GPU_CLOUDS_PER_SEC = {"cls": 500.0, "partseg": 30.0, "semseg": 120.0}

MODEL = os.environ.get("BENCH_MODEL", "cls")  # cls | partseg | semseg
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
NUM_POINTS = int(os.environ.get(
    "BENCH_POINTS", {"cls": "1024", "partseg": "2048", "semseg": "4096"}[MODEL]))
K = int(os.environ.get("BENCH_K", {"cls": "20", "partseg": "32",
                                   "semseg": "20"}[MODEL]))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))


def main() -> None:
    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    if MODEL == "cls":
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=1024, k=K, output_channels=40)
        points = jnp.asarray(
            rng.randn(BATCH, NUM_POINTS, 3).astype(np.float32))
        args = (points,)
        name = "DGCNN-cls"
    elif MODEL == "partseg":
        from dgcnn_tpu.models import Net

        model = Net(emb_dim=512, k=K, n_heads=2, n_blocks=2, ff_dims=512,
                    d_qkv=64, nclasses=50)
        points = jnp.asarray(
            rng.randn(BATCH, NUM_POINTS, 3).astype(np.float32))
        lbl = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, BATCH)])
        args = (points, lbl)
        name = "fusion-Net partseg"
    else:
        from dgcnn_tpu.models import DGCNNSemSeg

        model = DGCNNSemSeg(emb_dims=1024, k=K)
        points = jnp.asarray(
            rng.rand(BATCH, NUM_POINTS, 9).astype(np.float32))
        args = (points,)
        name = "DGCNN-semseg"

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, train=False)

    def chained(v, args, iters):
        def body(_, carry):
            acc, a0 = carry
            out = model.apply(v, a0, *args[1:], train=False)
            s = jnp.sum(out) * 1e-12
            # feed a data dependency back so iterations can't be elided
            return acc + s, args[0] + s
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), args[0]))
        return acc

    run = jax.jit(chained, static_argnums=(2,))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        float(run(variables, args, iters))  # host readback = completion
        return time.perf_counter() - t0

    timed(1)            # compile 1-iter variant
    timed(ITERS)        # compile N-iter variant
    base = min(timed(1) for _ in range(3))
    total = min(timed(ITERS) for _ in range(3))
    per_iter = (total - base) / (ITERS - 1)

    clouds_per_sec = BATCH / per_iter
    print(json.dumps({
        "metric": f"{name} inference clouds/sec/chip "
                  f"({NUM_POINTS} pts, k={K}, batch {BATCH})",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(
            clouds_per_sec / REF_GPU_CLOUDS_PER_SEC[MODEL], 2),
    }))


if __name__ == "__main__":
    main()
