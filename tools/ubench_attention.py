#!/usr/bin/env python
"""Attention kernel shoot-out on the real chip: dense XLA vs library
flash (tuned blocks) vs the fused whole-KV-resident kernel
(ops/pallas_attention.py), fwd-only and fwd+bwd, at the fusion-Net
stack shape.  Chained-fori_loop harness (axon's block_until_ready
returns early)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128,
                   help="stacked batch (the Net runs 2x its data batch)")
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--rate", type=float, default=0.0)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--grad", action="store_true", help="time fwd+bwd")
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.pallas_attention import fused_attention

    b, h, n, d = args.batch, args.heads, args.n, args.d
    scale = 1.0 / d**0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)).astype(
        jnp.bfloat16)
    seed = jnp.asarray([7], jnp.int32)

    def dense(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_,
                       preferred_element_type=jnp.float32) * scale
        p_ = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p_.astype(q_.dtype), v_)

    def flash(q_, k_, v_):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        def blk(m):
            return max(x for x in (1024, 512, 256, 128) if m % x == 0)

        bq, bk = blk(n), blk(n)
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq, block_k_major_dq=bk,
                        block_k_dq=bk, block_q_dq=bq)
        return flash_attention(q_, k_, v_, sm_scale=scale, block_sizes=bs)

    def fused(q_, k_, v_):
        return fused_attention(q_, k_, v_, sm_scale=scale,
                               dropout_rate=args.rate,
                               seed=seed if args.rate else None)

    kernels = {"dense": dense, "flash": flash, "fused": fused}
    if args.rate > 0.0:
        kernels.pop("flash")  # no prob-dropout support

    results = {}
    for name, fn in kernels.items():
        if args.grad:
            def step(x, fn=fn):
                def loss(x_):
                    return jnp.sum(fn(x_, x_, x_).astype(jnp.float32) ** 2)
                return jax.grad(loss)(x)
        else:
            def step(x, fn=fn):
                return fn(x, x, x)

        def chained(x, iters):
            def body(_, c):
                o = step(c)
                return c + o.astype(c.dtype) * jnp.asarray(
                    1e-6, c.dtype)
            y = jax.lax.fori_loop(0, iters, body, x)
            return jnp.sum(y.astype(jnp.float32)) * 1e-9

        run = jax.jit(chained, static_argnums=(1,))

        def timed(iters):
            t0 = time.perf_counter()
            float(run(q, iters))
            return time.perf_counter() - t0

        try:
            timed(1)
            base = min(timed(1) for _ in range(3))
            total = min(timed(args.iters) for _ in range(2))
            ms = (total - base) / (args.iters - 1) * 1e3
        except Exception as e:  # noqa: BLE001 - report per-kernel failure
            results[name] = f"error: {type(e).__name__}"
            continue
        results[name] = round(ms, 3)

    print(json.dumps({
        "metric": "attention ms/call" + ("+grad" if args.grad else ""),
        "shape": f"B{b} h{h} N{n} d{d} rate{args.rate}",
        **results,
    }), flush=True)


if __name__ == "__main__":
    main()
