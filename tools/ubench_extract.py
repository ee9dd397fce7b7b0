#!/usr/bin/env python
"""Micro-benchmark for the index-emitting Pallas kNN reduce kernel.

Times ``fused_knn_reduce`` on the real chip.  --exact selects the f32
path (HIGHEST scores + v1 extraction); default is the AMP path (bf16x3
scores + packed v2).  DGCNN_TPU_EXTRACT=v1|v2 overrides the loop for
A/B runs; use tools/ubench_stage.py for the eval kernels (v1/v2/v3).

Uses the same chained-fori_loop + host-readback timing as bench.py (naive
block_until_ready returns early through the axon tunnel).
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--c", type=int, default=3)
    p.add_argument("--co", type=int, default=64)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--sumsq", action="store_true")
    p.add_argument("--exact", action="store_true",
                   help="f32 select_dtype: HIGHEST scores + v1 extraction")
    p.add_argument("--dups", action="store_true",
                   help="duplicate half the points (distance ties in every "
                        "row -> v7 pays its tie-repair region)")
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.pallas_knn import fused_knn_reduce

    rng = np.random.RandomState(0)
    xn = rng.randn(args.batch, args.n, args.c).astype(np.float32)
    if args.dups:
        xn[:, args.n // 2:] = xn[:, :args.n // 2]
    x = jnp.asarray(xn)
    a = jnp.asarray(rng.randn(args.batch, args.n, args.co).astype(np.float32))

    sel_dt = jnp.float32 if args.exact else jnp.bfloat16

    def chained(x0, a0, iters):
        def body(_, carry):
            acc, xc = carry
            out = fused_knn_reduce(xc, a0, args.k, select_dtype=sel_dt,
                                   with_sumsq=args.sumsq)
            s = jnp.sum(out[1]) * 1e-12
            return acc + s, x0 + s
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))
        return acc

    run = jax.jit(chained, static_argnums=(2,))

    def timed(iters: int) -> float:
        t0 = time.perf_counter()
        float(run(x, a, iters))
        return time.perf_counter() - t0

    timed(1)
    timed(args.iters)
    base = min(timed(1) for _ in range(3))
    total = min(timed(args.iters) for _ in range(3))
    per_iter = (total - base) / (args.iters - 1)
    print(json.dumps({
        "variant": ("v1" if args.exact
                    else os.environ.get("DGCNN_TPU_EXTRACT", "v2")),
        "shape": f"B{args.batch} N{args.n} C{args.c} Co{args.co} k{args.k}",
        "ms_per_call": round(per_iter * 1e3, 3),
        "clouds_per_sec": round(args.batch / per_iter, 1),
    }))


if __name__ == "__main__":
    main()
