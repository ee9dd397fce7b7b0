#!/usr/bin/env python
"""Break down the fusion-Net partseg forward: time each sub-block at the
bench config (B=64, N=2048, k=32, emb=512) with the chained-readback
harness.  Usage: python tools/ubench_partseg_parts.py [--part all]

--grad times TRAIN-mode fwd+bwd per sub-block instead (grads w.r.t.
params, dropout active, batch_stats mutable) — the train-step
decomposition; use --batch 24 to match the run.sh global batch."""
from __future__ import annotations

import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(run, args, iters):
    import jax.numpy as jnp

    def t(n):
        t0 = time.perf_counter(); float(run(*args, n)); return time.perf_counter() - t0
    t(1); t(iters)
    base = min(t(1) for _ in range(3))
    total = min(t(iters) for _ in range(3))
    return (total - base) / (iters - 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--part", default="all")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--grad", action="store_true",
                   help="train-mode fwd+bwd per part (see docstring)")
    p.add_argument("--dropout", type=float, default=None,
                   help="override the xform-part dropout rate (default "
                        "0.5 under --grad, 0 otherwise) — isolates the "
                        "dropout-mask cost in the train decomposition")
    p.add_argument("--rng_impl", default="threefry2x32",
                   help="PRNG impl for the xform dropout stream "
                        "(threefry2x32|rbg) — rbg draws bits with the "
                        "TPU hardware generator")
    args = p.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax, jax.numpy as jnp, numpy as np

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.n, 3).astype(np.float32) * 0.5)
    train = args.grad

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

    def chain_grad(m, v, *extra):
        """TRAIN fwd+bwd: grads of sum(out) w.r.t. params, dropout rng,
        batch_stats mutable.  Readback depends on the grad tree."""
        params, rest = v["params"], {k_: v_ for k_, v_ in v.items()
                                     if k_ != "params"}

        def loss(p_, xc):
            out, _ = m.apply({"params": p_, **rest}, xc, *extra,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out.astype(jnp.float32)) * 1e-12

        gfn = jax.grad(loss)

        def chained(x0, iters):
            def body(_, carry):
                acc, xc = carry
                g = gfn(params, xc)
                s = jax.tree.reduce(
                    lambda a, b: a + jnp.sum(b) * 1e-12, g, jnp.float32(0))
                return acc + s, x0 + s
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), x0))
            return acc
        return jax.jit(chained, static_argnums=(1,))

    parts = {}

    if args.part in ("all", "dgcnn"):
        from dgcnn_tpu.models.dgcnn import DGCNN

        m = DGCNN(emb_dims=512, k=args.k)
        v = m.init({"params": jax.random.PRNGKey(0)}, x[:1], train=False)
        parts["dgcnn_backbone"] = (chain_grad(m, v) if train else chain(
            lambda xc, m=m, v=v: m.apply(v, xc, train=False)))
    if args.part in ("all", "hog"):
        from dgcnn_tpu.ops.hog import compute_hog

        parts["hog"] = chain(lambda xc: compute_hog(xc, k=args.k))
    if args.part in ("all", "posemb"):
        from dgcnn_tpu.models.dgcnn import PositionEmbedding

        m = PositionEmbedding(k=args.k)
        v = m.init({"params": jax.random.PRNGKey(0)}, x[:1], train=False)
        parts["pos_embedding"] = (chain_grad(m, v) if train else chain(
            lambda xc, m=m, v=v: m.apply(v, xc, train=False)))
    if args.part in ("all", "xform"):
        from dgcnn_tpu.models.torch_transformer import (
            TorchMultiheadAttention,
            TorchTransformer,
        )

        emb = 512
        drop = (0.5 if train else 0.0) if args.dropout is None else args.dropout
        xf = TorchTransformer(
            d_model=emb, nhead=2, num_encoder_layers=2,
            num_decoder_layers=2, dim_feedforward=512, dropout=drop,
            encoder_activation="leaky_relu", decoder_activation="relu",
            dtype=jnp.bfloat16)
        att = TorchMultiheadAttention(emb, 2, drop, dtype=jnp.bfloat16)
        se = jnp.asarray(rng.randn(args.batch, args.n, emb)
                         .astype(np.float32) * 0.2)
        te = jnp.asarray(rng.randn(args.batch, args.n, emb)
                         .astype(np.float32) * 0.2)
        vx = xf.init({"params": jax.random.PRNGKey(0)}, se[:1], te[:1])
        va = att.init({"params": jax.random.PRNGKey(0)}, se[:1], se[:1],
                      se[:1])

        # se/te must be ARGUMENTS of the jitted fn: closing over them bakes
        # 2x 256 MB constants into the program, which the axon tunnel's
        # remote-compile endpoint rejects (HTTP 413)
        def mkkey(s):
            return jax.random.key(s, impl=args.rng_impl)

        def stack(vx_, va_, se_a, te_a):
            both = xf.apply(
                vx_, jnp.concatenate([se_a, te_a], 0),
                jnp.concatenate([te_a, se_a], 0), train=train,
                rngs={"dropout": mkkey(2)} if train else None)
            sp, tp = jnp.split(both, 2, axis=0)
            return att.apply(
                va_, tp, sp, sp, train=train,
                rngs={"dropout": mkkey(3)} if train else None)

        if train:
            def loss(ps, se_a, te_a, vx=vx, va=va):
                out = stack({**vx, "params": ps[0]},
                            {**va, "params": ps[1]}, se_a, te_a)
                return jnp.sum(out.astype(jnp.float32)) * 1e-12

            gfn = jax.grad(loss)

            def chained_xf(se_a, te_a, iters, vx=vx, va=va):
                def body(_, carry):
                    acc, s_c = carry
                    g = gfn((vx["params"], va["params"]), se_a + s_c, te_a)
                    s = jax.tree.reduce(
                        lambda a, b: a + jnp.sum(b) * 1e-12, g,
                        jnp.float32(0))
                    return acc + s, s
                acc, _ = jax.lax.fori_loop(
                    0, iters, body, (jnp.float32(0), jnp.float32(0)))
                return acc
        else:
            def chained_xf(se_a, te_a, iters, vx=vx, va=va):
                def body(_, carry):
                    acc, s_c = carry
                    out = stack(vx, va, se_a + s_c, te_a)
                    s = jnp.sum(out).astype(jnp.float32) * 1e-12
                    return acc + s, s
                acc, _ = jax.lax.fori_loop(
                    0, iters, body, (jnp.float32(0), jnp.float32(0)))
                return acc

        parts["transformer_stack"] = (
            jax.jit(chained_xf, static_argnums=(2,)), (se, te))
    if args.part in ("all", "net"):
        from dgcnn_tpu.models import Net

        m = Net(emb_dim=512, k=args.k, n_heads=2, n_blocks=2, ff_dims=512,
                d_qkv=64, nclasses=50)
        lbl = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, args.batch)])
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x[:1], lbl[:1],
                   train=False)
        parts["net_full"] = (chain_grad(m, v, lbl) if train else chain(
            lambda xc, m=m, v=v: m.apply(v, xc, lbl, train=False)))

    for name, entry in parts.items():
        run, call_args = entry if isinstance(entry, tuple) else (entry, (x,))
        ms = _timed(run, call_args, args.iters) * 1e3
        print(json.dumps({"part": name, "ms_per_call": round(ms, 2),
                          "shape": f"B{args.batch} N{args.n} k{args.k}"}),
              flush=True)


if __name__ == "__main__":
    main()
