#!/usr/bin/env python
"""Micro-benchmark one fused_edge_conv_eval stage (the DGCNNCls hot block).
The extraction variant defaults to the kernel's auto plan (select_x_plan);
force one with DGCNN_TPU_EXTRACT=v1|v2|v3.  Run each variant in a fresh
process (the variant is read at trace time)."""
from __future__ import annotations

import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--cg", type=int, default=64)
    p.add_argument("--co", type=int, default=64)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax, jax.numpy as jnp, numpy as np
    from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.n, args.cg).astype(np.float32))
    wn = jnp.asarray(rng.randn(args.cg, args.co).astype(np.float32) * 0.1)
    wc = jnp.asarray(rng.randn(args.cg, args.co).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.rand(args.co).astype(np.float32) + 0.5)
    bi = jnp.asarray(rng.randn(args.co).astype(np.float32) * 0.1)

    def chained(x0, iters):
        def body(_, carry):
            acc, xc = carry
            out = fused_edge_conv_eval(xc, xc, wn, wc, sc, bi, args.k)
            s = jnp.sum(out) * 1e-12
            return acc + s, x0 + s
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), x0))
        return acc

    run = jax.jit(chained, static_argnums=(1,))
    def timed(iters):
        t0 = time.perf_counter(); float(run(x, iters)); return time.perf_counter() - t0
    timed(1); timed(args.iters)
    base = min(timed(1) for _ in range(3))
    total = min(timed(args.iters) for _ in range(3))
    per_iter = (total - base) / (args.iters - 1)
    print(json.dumps({"variant": os.environ.get("DGCNN_TPU_EXTRACT", "auto"),
                      "shape": f"B{args.batch} N{args.n} Cg{args.cg} Co{args.co} k{args.k}",
                      "ms_per_call": round(per_iter * 1e3, 3)}))


if __name__ == "__main__":
    main()
