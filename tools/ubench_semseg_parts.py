#!/usr/bin/env python
"""Break down the DGCNNSemSeg forward: time each sub-block at the bench
config (B=64, N=4096, k=20, 9-d blocks with ~1/4 duplicate rows) with the
chained-readback harness.  Usage: python tools/ubench_semseg_parts.py
[--part stage1|stage2|stage3|head|full|all]"""
from __future__ import annotations

import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--part", default="all")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    # bench semseg pins the duplicate-exact packed extraction (bench.py)
    os.environ.setdefault("DGCNN_TPU_EXTRACT", "v2")

    from dgcnn_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import flax.linen as nn
    import jax, jax.numpy as jnp, numpy as np

    from dgcnn_tpu.models.dgcnn import _edge_block2, _embed_max_pool
    from dgcnn_tpu.models.nn_layers import ConvBN, EdgeConv

    rng = np.random.RandomState(0)
    pts = rng.rand(args.batch, args.n, 9).astype(np.float32)
    dup = args.n // 4
    pts[:, args.n - dup:] = pts[:, :dup]
    x9 = jnp.asarray(pts)
    x64 = jnp.asarray(rng.randn(args.batch, args.n, 64).astype(np.float32))
    cat = jnp.asarray(rng.randn(args.batch, args.n, 192).astype(np.float32))
    kk = args.k

    class Block2(nn.Module):
        slice69: bool = False

        @nn.compact
        def __call__(self, x, train=False):
            g = x[..., 6:9] if self.slice69 else x
            return _edge_block2(EdgeConv(64, pool=False, name="ec"),
                                ConvBN(64, name="cb"), x, g, kk, train)

    class Stage3(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return EdgeConv(64, name="ec")(x, train=train, graph=x, k=kk)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, c, train=False):
            b, n, _ = c.shape
            g = _embed_max_pool(ConvBN(1024, name="conv6"), c, train,
                                keepdims=True)
            g = jnp.broadcast_to(g, (b, n, g.shape[-1]))
            h = jnp.concatenate([g, c], axis=-1)
            h = ConvBN(512, name="conv7")(h, train)
            h = ConvBN(256, name="conv8")(h, train)
            return nn.Dense(13, use_bias=False, name="conv9")(h)

    def chain(model_apply):
        def chained(x0, iters):
            def body(_, carry):
                acc, xc = carry
                out = model_apply(xc)
                s = jnp.sum(out) * 1e-12
                return acc + s, x0 + s
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), x0))
            return acc
        return jax.jit(chained, static_argnums=(1,))

    def timed(run, x0):
        def t(n):
            t0 = time.perf_counter()
            float(run(x0, n))
            return time.perf_counter() - t0
        t(1); t(args.iters)
        base = min(t(1) for _ in range(3))
        total = min(t(args.iters) for _ in range(3))
        return (total - base) / (args.iters - 1)

    parts = {}
    if args.part in ("all", "stage1"):
        m = Block2(slice69=True)
        v = m.init({"params": jax.random.PRNGKey(0)}, x9[:1])
        parts["stage1"] = (chain(lambda xc, m=m, v=v: m.apply(v, xc)), x9)
    if args.part in ("all", "stage2"):
        m = Block2()
        v = m.init({"params": jax.random.PRNGKey(0)}, x64[:1])
        parts["stage2"] = (chain(lambda xc, m=m, v=v: m.apply(v, xc)), x64)
    if args.part in ("all", "stage3"):
        m = Stage3()
        v = m.init({"params": jax.random.PRNGKey(0)}, x64[:1])
        parts["stage3"] = (chain(lambda xc, m=m, v=v: m.apply(v, xc)), x64)
    if args.part in ("all", "head"):
        m = Head()
        v = m.init({"params": jax.random.PRNGKey(0)}, cat[:1])
        parts["head"] = (chain(lambda xc, m=m, v=v: m.apply(v, xc)), cat)
    if args.part in ("all", "full"):
        from dgcnn_tpu.models import DGCNNSemSeg

        m = DGCNNSemSeg(emb_dims=1024, k=kk)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x9[:1], train=False)
        parts["full"] = (chain(
            lambda xc, m=m, v=v: m.apply(v, xc, train=False)), x9)

    for name, (run, x0) in parts.items():
        ms = timed(run, x0) * 1e3
        print(json.dumps({"part": name, "ms_per_batch": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
