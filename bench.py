#!/usr/bin/env python
"""Headline benchmark: ModelNet40 DGCNN classification inference throughput,
1024 points, k=20 (BASELINE.json config 1), on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} for the
headline config; ``python bench.py --all`` (or BENCH_MODEL=all) prints one
line per config (cls / partseg / semseg).

Measurement notes:
  * On the axon-tunnelled TPU, ``block_until_ready`` returns before remote
    execution completes, so naive dispatch loops measure nothing.  The bench
    chains ``ITERS`` forwards inside one jitted ``lax.fori_loop`` (each
    iteration's input perturbed by the previous output so nothing folds away)
    and forces a scalar host readback; RPC overhead is removed by
    differencing a 1-iteration run.
  * vs_baseline: the reference publishes no throughput numbers (SURVEY.md
    §6), so the denominators below are order-of-magnitude ESTIMATES for the
    CUDA-10-era GPUs it targeted ("denominator_estimated": true in the
    output):
      cls      ~500 clouds/s  (batch 32 in ~60 ms, 1080Ti-class)
      partseg  ~30 clouds/s   (the fusion Net round-trips a CPU LAPACK SVD
                               over B*N 3xk neighbourhoods every batch,
                               reference models/model_partseg.py:36-47)
      semseg   ~120 clouds/s  (4x the cls point count, O(N^2) knn)
  * mfu: analytic model FLOPs per cloud divided by the v5e bf16 peak
    (197 TFLOP/s).  FLOPs counted as executed on the MXU — including the
    one-hot selection matmuls of the fused kNN kernel, which is how this
    design buys its speed (selection rides the MXU instead of an HBM
    gather).  A "useful-FLOPs-only" MFU (conv/matmul math a naive
    implementation would also do) is reported as mfu_algorithmic.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_GPU_CLOUDS_PER_SEC = {"cls": 500.0, "cls2048": 125.0, "partseg": 30.0,
                          "semseg": 120.0}
V5E_PEAK_BF16 = 197e12

# cls2048 = BASELINE.json config 2 (2048 pts, k=40: 4x the N^2 distance
# matrix, 2x the top-k winners; reference README.md:87-88).  Its GPU
# denominator estimate scales the cls one by the 4x N^2 work.
MODEL = os.environ.get("BENCH_MODEL", "cls")  # cls | partseg | semseg | all
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = int(os.environ.get("BENCH_ITERS", "30"))
POINTS = {"cls": 1024, "cls2048": 2048, "partseg": 2048, "semseg": 4096}
KS = {"cls": 20, "cls2048": 40, "partseg": 32, "semseg": 20}


def _edge_conv_flops(n: int, k: int, c_graph: int, cins: list[int],
                     couts: list[int]) -> float:
    """Per-cloud MXU FLOPs of fused EdgeConv stages: distance-scores matmul
    (N^2 C), k one-hot selection matmuls over the narrower of the projected
    (Co) / raw (Cin) payload (select-x mode adds k tiny per-selection
    projections — mirrors ops/pallas_knn._edge_conv1_kernel's lane plan),
    and the weight projections (2 N C Co)."""
    from dgcnn_tpu.ops.pallas_knn import select_x_plan

    total = 0.0
    cg = c_graph
    for cin, co in zip(cins, couts):
        select_x, _ = select_x_plan(cin, co)
        total += 2.0 * n * n * cg          # scores (graph feature dim cg)
        if select_x:
            total += 2.0 * k * n * n * cin   # selection matmuls (raw feats)
            total += 2.0 * k * n * cin * co  # per-selection projections
            total += 2.0 * n * cin * co      # w_ctr projection
        else:
            total += 2.0 * k * n * n * co      # selection matmuls
            total += 2.0 * 2.0 * n * cin * co  # w_nbr / w_ctr projections
        cg = co
    return total


def _algorithmic_flops(n: int, k: int, cins: list[int],
                       couts: list[int]) -> float:
    """FLOPs a naive EdgeConv would spend on conv math alone (edge tensor
    conv: N*k*2C*Co MACs per stage) — excludes knn selection."""
    return sum(2.0 * n * k * 2 * cin * co for cin, co in zip(cins, couts))


def model_flops_per_cloud(model: str, n: int, k: int) -> tuple[float, float]:
    """(mxu_flops, algorithmic_flops) per cloud for the bench model configs."""
    if model == "cls2048":
        model = "cls"  # same architecture, (n, k) carry the config
    if model == "cls":
        mxu = _edge_conv_flops(n, k, 3, [3, 64, 64, 128], [64, 64, 128, 256])
        mxu += 2.0 * n * 512 * 1024            # conv5
        alg = _algorithmic_flops(n, k, [3, 64, 64, 128], [64, 64, 128, 256])
        alg += 2.0 * n * 512 * 1024
        return mxu, alg
    if model == "semseg":
        mxu = _edge_conv_flops(n, k, 3, [9, 64, 64], [64, 64, 64])
        mxu += 2.0 * 2.0 * k * n * 64 * 64  # per-edge conv2 of stages 1-2
        mxu += 2.0 * n * (192 * 1024 + 1216 * 512 + 512 * 256 + 256 * 13)
        alg = _algorithmic_flops(n, k, [9, 64, 64], [64, 64, 64])
        alg += 2.0 * 2.0 * k * n * 64 * 64
        alg += 2.0 * n * (192 * 1024 + 1216 * 512 + 512 * 256 + 256 * 13)
        return mxu, alg
    if model == "partseg":
        # fusion Net at the bench config (emb=512, heads=2, blocks=2,
        # ff=512); algorithmic counts exclude kNN selection matmuls
        emb, ff, blocks = 512, 512, 2
        bb_mxu = _edge_conv_flops(n, k, 3, [3, 64, 64, 128],
                                  [64, 64, 128, 256])
        bb_alg = _algorithmic_flops(n, k, [3, 64, 64, 128],
                                    [64, 64, 128, 256])
        conv5 = 2.0 * n * 512 * emb
        # HOG: scores + ONE multi-hot moment-sum matmul (27 lanes: the
        # 3-way-split hi|mid|lo concat of the 9 moments — fused_knn_sum
        # replaced the k-pass selection in r3) + multi-hot vote matmul
        hog_sel = 2.0 * n * n * 3 + 2.0 * n * n * 27 + 2.0 * n * n * 18
        hog_alg = 2.0 * n * k * (9 + 18)  # gathered sums a naive impl does
        # TransformNet trunk: scores + selection + per-edge conv2 + pool
        tn_sel = 2.0 * n * n * 3 + 2.0 * k * n * n * 64
        tn_common = (2.0 * k * n * 64 * 128 + 2.0 * n * 128 * 1024
                     + 2.0 * n * 2 * 3 * 64)
        tn_alg = 2.0 * n * k * (6 * 64) + tn_common
        grads_emb = 2.0 * n * (18 * 64 + 64 * 128 + 128 * 256 + 256 * emb)
        pos_conv = 2.0 * n * 3 * emb
        attn = 4.0 * 2.0 * n * emb * emb + 2.0 * 2.0 * n * n * emb
        layer_ff = 2.0 * 2.0 * n * emb * ff
        # transformer applied TWICE (swapped src/tgt): blocks enc (1 attn)
        # + blocks dec (2 attn) + FFs, plus the final scoring attention
        xf = 2.0 * (blocks * (attn + layer_ff) + blocks * (2 * attn + layer_ff))
        xf += attn
        head = 2.0 * n * ((emb + 64) * emb // 2 + emb // 2 * emb // 4
                          + emb // 4 * emb // 8 + emb // 8 * 50)
        common = (conv5 + grads_emb + pos_conv + xf + head + tn_common)
        mxu = bb_mxu + hog_sel + tn_sel + common
        alg = bb_alg + hog_alg + tn_alg + common - tn_common
        return mxu, alg
    return 0.0, 0.0


def run_config(model_key: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    num_points = int(os.environ.get("BENCH_POINTS", POINTS[model_key]))
    k = int(os.environ.get("BENCH_K", KS[model_key]))

    rng = np.random.RandomState(0)
    if model_key in ("cls", "cls2048"):
        from dgcnn_tpu.models import DGCNNCls

        model = DGCNNCls(emb_dims=1024, k=k, output_channels=40)
        points = jnp.asarray(
            rng.randn(BATCH, num_points, 3).astype(np.float32))
        args = (points,)
        name = "DGCNN-cls"
    elif model_key == "partseg":
        from dgcnn_tpu.models import Net

        model = Net(emb_dim=512, k=k, n_heads=2, n_blocks=2, ff_dims=512,
                    d_qkv=64, nclasses=50)
        points = jnp.asarray(
            rng.randn(BATCH, num_points, 3).astype(np.float32))
        lbl = jnp.asarray(
            np.eye(16, dtype=np.float32)[rng.randint(0, 16, BATCH)])
        args = (points, lbl)
        name = "fusion-Net partseg"
    else:
        from dgcnn_tpu.models import DGCNNSemSeg

        # Honest semseg input: S3DIS blocks are sampled with replacement, so
        # ~1/4 of rows are duplicates; pin the packed member-exact
        # extraction the semseg CLI defaults to for such data
        # (cli/semseg.py).  An explicit user DGCNN_TPU_EXTRACT wins;
        # restored by main() after this config.
        os.environ.setdefault("DGCNN_TPU_EXTRACT", "v2")
        model = DGCNNSemSeg(emb_dims=1024, k=k)
        pts = rng.rand(BATCH, num_points, 9).astype(np.float32)
        dup = num_points // 4
        pts[:, num_points - dup:] = pts[:, :dup]
        points = jnp.asarray(pts)
        args = (points,)
        name = "DGCNN-semseg"

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, train=False)

    def measure() -> float:
        # a FRESH closure per measurement: jit re-traces it, so trace-time
        # env flags (extraction variant, banded band) are re-read
        def chained(v, args, iters):
            def body(_, carry):
                acc, a0 = carry
                out = model.apply(v, a0, *args[1:], train=False)
                s = jnp.sum(out) * 1e-12
                # feed a data dependency back so iterations can't be elided
                return acc + s, args[0] + s
            acc, _ = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), args[0]))
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
        return BATCH * (ITERS - 1) / (total - base)

    def pin_band(band):
        old = os.environ.get("DGCNN_TPU_FAST_EXTRACT")
        if band is None:
            os.environ.pop("DGCNN_TPU_FAST_EXTRACT", None)
        else:
            os.environ["DGCNN_TPU_FAST_EXTRACT"] = str(band)
        return old

    old_band = pin_band(None)   # the exact path, regardless of inherited env
    try:
        clouds_per_sec = measure()
        banded_cps = None
        if model_key == "semseg" and jax.default_backend() == "tpu":
            # semseg's exact path is VPU-extraction-floor-bound (PERF.md
            # "Measured ceilings"); the banded-1024 approximate path is
            # promoted into this line because its drift gate rides the SAME
            # artifact (parity_banded_semseg_b1024, 0.999996 argmax
            # agreement on duplicate-heavy blocks) — parity_ok flags any
            # regression in the same JSON object as the number
            pin_band(1024)
            banded_cps = measure()
    finally:
        pin_band(old_band)

    result = {
        "metric": f"{name} inference clouds/sec/chip "
                  f"({num_points} pts, k={k}, batch {BATCH})",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(
            clouds_per_sec / REF_GPU_CLOUDS_PER_SEC[model_key], 2),
        "denominator_clouds_per_sec": REF_GPU_CLOUDS_PER_SEC[model_key],
        "denominator_estimated": True,
    }
    if banded_cps is not None:
        result["metric"] += " [banded-1024 approx kNN, drift-gated]"
        result["value"] = round(banded_cps, 1)
        result["vs_baseline"] = round(
            banded_cps / REF_GPU_CLOUDS_PER_SEC[model_key], 2)
        result["value_exact"] = round(clouds_per_sec, 1)
        result["vs_baseline_exact"] = round(
            clouds_per_sec / REF_GPU_CLOUDS_PER_SEC[model_key], 2)
    mxu_flops, alg_flops = model_flops_per_cloud(model_key, num_points, k)
    if mxu_flops:
        # utilization is reported for the EXACT path (the FLOP model counts
        # the full candidate set; the banded path intentionally does less)
        achieved = clouds_per_sec * mxu_flops
        result["tflops"] = round(achieved / 1e12, 1)
        result["mfu"] = round(achieved / V5E_PEAK_BF16, 3)
        result["mfu_algorithmic"] = round(
            clouds_per_sec * alg_flops / V5E_PEAK_BF16, 4)
    return result


def main() -> None:
    from dgcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    configs = (["cls", "cls2048", "partseg", "semseg"]
               if (MODEL == "all" or "--all" in sys.argv) else [MODEL])
    had_extract = os.environ.get("DGCNN_TPU_EXTRACT")
    for i, key in enumerate(configs):
        try:
            result = run_config(key)
            if i == 0 and os.environ.get("BENCH_GATES", "1") != "0":
                # correctness gates ride the driver-visible artifact: eval +
                # train drift agreement and the fused-attention on-chip
                # oracle, cached on a source hash (tools/gates.py) so a
                # re-bench on unchanged code stays fast
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "tools"))
                import gates

                try:
                    result.update(gates.gate_summary())
                except Exception as e:  # noqa: BLE001
                    # the gates are individually hardened (tools/gates.py)
                    # but the headline line must survive even a summary-level
                    # failure — r4's artifact died rc=1 on one gate child
                    result["parity_ok"] = False
                    result["gates_error"] = repr(e)[-300:]
            if "--parity" in sys.argv and key in ("cls", "partseg",
                                                  "semseg"):
                # exact-vs-AMP drift gate (tools/parity_drift.py): proves
                # the AMP headline path preserves predictions
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "tools"))
                import parity_drift

                d = parity_drift.measure(key, BATCH)
                result["amp_argmax_agreement"] = d["argmax_agreement"]
                result["amp_max_abs_logit_delta"] = d["max_abs_logit_delta"]
            print(json.dumps(result), flush=True)
        finally:
            # run_config("semseg") pins the extraction variant; restore so
            # later configs (reordered lists, repeated calls) are unaffected
            if had_extract is None:
                os.environ.pop("DGCNN_TPU_EXTRACT", None)
            else:
                os.environ["DGCNN_TPU_EXTRACT"] = had_extract


if __name__ == "__main__":
    main()
