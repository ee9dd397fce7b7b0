#!/usr/bin/env python
"""Sweep flash-attention block sizes at the fusion-Net bench shape
(B=128 after the batched two-pass stack, h=2, N=2048, d=256) plus the
XLA dense fallback.  The library default (128) was 2x slower than XLA at
this shape in r2; 1024 won.  Usage: python tools/ubench_flash.py"""
from __future__ import annotations

import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgcnn_tpu.utils import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    b, h, n, d = 128, 2, 2048, 256
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)).astype(
        jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)).astype(
        jnp.bfloat16)
    sm = 1.0 / float(d) ** 0.5

    def timed(fn):
        run = jax.jit(fn, static_argnums=(3,))

        def t(iters):
            t0 = time.perf_counter()
            float(run(q, k, v, iters))
            return time.perf_counter() - t0

        t(1); t(6)
        base = min(t(1) for _ in range(3))
        tot = min(t(6) for _ in range(3))
        return (tot - base) / 5 * 1e3

    def chain(att):
        def fn(q0, k0, v0, iters):
            def body(_, carry):
                acc, qc = carry
                o = att(qc, k0, v0)
                s = jnp.sum(o).astype(jnp.float32) * 1e-12
                return acc + s, q0 + s.astype(q0.dtype)
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), q0))
            return acc
        return fn

    def xla(qc, k0, v0):
        s = jnp.einsum("bhqd,bhkd->bhqk", qc, k0,
                       preferred_element_type=jnp.float32) * sm
        p = jax.nn.softmax(s, axis=-1).astype(qc.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v0)

    print(json.dumps({"impl": "xla_dense",
                      "ms": round(timed(chain(xla)), 2)}), flush=True)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    for bq, bk in [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
                   (2048, 1024), (1024, 2048), (2048, 2048)]:
        if n % bq or n % bk:
            continue
        bs = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq)

        def fl(qc, k0, v0, bs=bs):
            return flash_attention(qc, k0, v0, sm_scale=sm, block_sizes=bs)

        try:
            ms = timed(chain(fl))
        except Exception as e:  # VMEM overflow at big blocks
            print(json.dumps({"impl": f"flash_q{bq}_k{bk}",
                              "error": str(e)[:120]}), flush=True)
            continue
        print(json.dumps({"impl": f"flash_q{bq}_k{bk}", "ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
