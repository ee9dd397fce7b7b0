#!/usr/bin/env python
"""On-chip oracle for the fused dropout-attention kernel
(ops/pallas_attention.py) — the half of its test matrix that cannot run
under the CPU suite (pltpu.prng_* interprets to zeros off-TPU).

Checks, at the fusion-Net train shape by default:
  1. keep-rate: the materialized mask's mean is within 4 sigma of 1-rate;
  2. determinism: same seed -> identical mask and output; different seed
     -> different mask;
  3. fwd oracle: dense XLA attention given the kernel's OWN mask
     (dropout_mask) reproduces the fused output;
  4. bwd oracle: dq/dk/dv of the dense-given-mask computation match the
     custom VJP's.

Prints one JSON line; exits nonzero on any gate failure.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--rate", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgcnn_tpu.ops.pallas_attention import dropout_mask, fused_attention

    b, h, n, d, rate = args.batch, args.heads, args.n, args.d, args.rate
    scale = 1.0 / d**0.5
    rng = np.random.RandomState(0)

    def mk(shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(
            jnp.bfloat16)

    q, k, v, do = (mk((b, h, n, d)) for _ in range(4))
    seed = jnp.asarray([args.seed], jnp.int32)

    # 1-2: mask statistics + determinism
    mask = np.asarray(dropout_mask((b, h, n, n), seed, rate, d))
    keep = float(mask.mean())
    sigma = (rate * (1 - rate) / mask.size) ** 0.5
    stat_ok = abs(keep - (1 - rate)) < 4 * sigma
    mask2 = np.asarray(dropout_mask((b, h, n, n), seed, rate, d))
    mask3 = np.asarray(
        dropout_mask((b, h, n, n), seed + 1, rate, d))
    det_ok = bool((mask == mask2).all()) and not bool((mask == mask3).all())

    # 3-4: fused vs dense-given-mask, fwd and bwd (all bf16 like the AMP
    # train path; the oracle applies the identical f32 softmax + masked
    # scaling + bf16 prob matmul)
    maskj = jnp.asarray(mask)

    def dense_with_mask(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_,
                       preferred_element_type=jnp.float32) * scale
        p_ = jax.nn.softmax(s, axis=-1)
        p_ = jnp.where(maskj > 0, p_ * (1.0 / (1.0 - rate)), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p_.astype(q_.dtype), v_)

    def fused(q_, k_, v_):
        return fused_attention(q_, k_, v_, sm_scale=scale,
                               dropout_rate=rate, seed=seed)

    out_f, vjp_f = jax.vjp(fused, q, k, v)
    out_d, vjp_d = jax.vjp(dense_with_mask, q, k, v)
    gf, gd = vjp_f(do), vjp_d(do)

    def maxdiff(a, b_):
        return float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32))))

    fwd_diff = maxdiff(out_f, out_d)
    g_diff = {f"d{nm}": maxdiff(a, b_)
              for nm, a, b_ in zip("qkv", gf, gd)}
    # bf16 matmuls against a f32-einsum oracle: tolerances are bf16-scale
    tol = 0.05 * float(jnp.max(jnp.abs(out_d.astype(jnp.float32)))) + 1e-3
    fwd_ok = fwd_diff <= tol
    g_ok = all(
        dv <= 0.05 * float(jnp.max(jnp.abs(g.astype(jnp.float32)))) + 1e-3
        for dv, g in zip(g_diff.values(), gd))

    ok = stat_ok and det_ok and fwd_ok and g_ok
    print(json.dumps({
        "metric": "fused dropout-attention on-chip oracle",
        "shape": f"B{b} h{h} N{n} d{d} rate{rate}",
        "keep_rate": round(keep, 5),
        "keep_rate_ok": stat_ok,
        "deterministic": det_ok,
        "fwd_maxdiff": fwd_diff,
        "grad_maxdiff": g_diff,
        "ok": ok,
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
