"""Serving benchmark: latency/throughput of the deployment stack.

Exports the cls model at the requested batch (or loads --artifact), then
measures on the REAL device, through the full serving path (host->device,
compute, device->host readback — np.asarray forces a real readback, so
these timings are honest through the axon tunnel):

  1. ServingModel.predict at full batch      -> offline throughput
  2. ServingModel.predict batch 1            -> unbatched latency floor
  3. BatchingServer under closed-loop load   -> coalesced online serving

Usage: python tools/serve_bench.py [--batch 64] [--num_points 1024]
       [--k 20] [--clients 64] [--requests 512] [--artifact path.shlo]
"""
import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--emb_dims", type=int, default=1024)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--max_delay_ms", type=float, default=2.0)
    ap.add_argument("--pipeline_depth", type=int, default=2)
    ap.add_argument("--artifact", type=str, default="")
    args = ap.parse_args()

    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from dgcnn_tpu.serve import BatchingServer, ServingModel

    if args.artifact:
        path = args.artifact
    else:
        import jax
        import jax.numpy as jnp

        from dgcnn_tpu.export import export_model, save_exported
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=args.emb_dims, k=args.k,
                         output_channels=40)
        pts = jnp.zeros((args.batch, args.num_points, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, pts,
                               train=False)
        ex = export_model(model, variables, (pts,), polymorphic_batch=True)
        path = "/tmp/serve_bench_cls.shlo"
        save_exported(path, ex)
        print(f"exported polymorphic cls artifact -> {path}")

    m = ServingModel(path, max_batch=args.batch)
    print(f"platform={m.platforms[0]} buckets={m._buckets}")
    t0 = time.monotonic()
    m.warmup()
    print(f"warmup (all buckets compiled): {time.monotonic() - t0:.1f}s")

    rng = np.random.RandomState(0)
    full = rng.randn(args.batch, args.num_points, 3).astype(np.float32)

    # 1. offline full-batch throughput
    iters = 20
    m.predict(full)
    t0 = time.monotonic()
    for _ in range(iters):
        m.predict(full)
    dt = (time.monotonic() - t0) / iters
    print(f"offline: batch {args.batch} in {dt * 1e3:.2f} ms = "
          f"{args.batch / dt:.0f} clouds/s (incl. H2D+D2H each call)")

    # 2. batch-1 latency
    one = full[:1]
    m.predict(one)
    lat = []
    for _ in range(50):
        t0 = time.monotonic()
        m.predict(one)
        lat.append(time.monotonic() - t0)
    print(f"batch-1 latency: p50 {pct(lat, 50) * 1e3:.2f} ms  "
          f"p99 {pct(lat, 99) * 1e3:.2f} ms")

    # 3. online closed-loop through the BatchingServer
    srv = BatchingServer(m, max_delay_ms=args.max_delay_ms,
                         pipeline_depth=args.pipeline_depth)
    clouds = [rng.randn(args.num_points, 3).astype(np.float32)
              for _ in range(64)]
    lats = []
    done = [0]

    def client(i):
        n = args.requests // args.clients
        for j in range(n):
            t0 = time.monotonic()
            srv.submit(clouds[(i * n + j) % len(clouds)]).result(timeout=300)
            lats.append(time.monotonic() - t0)
            done[0] += 1

    t0 = time.monotonic()
    with ThreadPoolExecutor(args.clients) as pool:
        list(pool.map(client, range(args.clients)))
    wall = time.monotonic() - t0
    served = done[0]
    sizes = srv.batch_log
    srv.shutdown()
    print(f"online: {served} reqs, {args.clients} clients -> "
          f"{served / wall:.0f} clouds/s; request latency p50 "
          f"{pct(lats, 50) * 1e3:.1f} ms p99 {pct(lats, 99) * 1e3:.1f} ms; "
          f"mean device batch {np.mean(sizes):.1f} over {len(sizes)} calls")


if __name__ == "__main__":
    main()
