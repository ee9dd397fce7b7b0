"""On-chip oracle tier (``pytest -m tpu``; VERDICT r3 #7).

The CPU suite cannot cover: the fused dropout-attention mask path
(pltpu.prng_* interprets to zeros off-TPU), the measured exact-vs-AMP drift
gates at bench scale, and the learnability runs that substitute for the
environment-blocked real-data accuracy gates.  Each test shells out to its
tool so the child picks up the REAL backend while this process keeps the
conftest-pinned CPU backend (the axon plugin must not be initialized twice
in-process).

Excluded from the default run by pyproject's ``addopts = -m "not tpu"``.
Budget on a warm compile cache: oracles ~2 min, learn runs ~3/10/4 min.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env(extra=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # conftest pins cpu; children use the chip
    if extra:
        env.update(extra)
    return env


def _run(args, timeout=2400, env_extra=None):
    return subprocess.run([sys.executable] + args, env=_child_env(env_extra),
                          cwd=ROOT, capture_output=True, text=True,
                          timeout=timeout)


@pytest.fixture(scope="session")
def tpu_present():
    probe = _run(["-c", "import jax; print(jax.default_backend())"],
                 timeout=300)
    if "tpu" not in probe.stdout:
        pytest.skip("no TPU chip reachable from this host")


def _last_json(proc):
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no output; stderr tail: {proc.stderr[-1000:]}"
    return json.loads(lines[-1])


def test_attention_oracle(tpu_present):
    proc = _run([os.path.join(ROOT, "tools", "attention_check.py")])
    out = _last_json(proc)
    assert proc.returncode == 0, out
    assert out["ok"] and out["deterministic"] and out["keep_rate_ok"]


def test_eval_drift_gate(tpu_present):
    proc = _run([os.path.join(ROOT, "tools", "parity_drift.py"),
                 "--model", "all", "--batch", "32"])
    rows = [json.loads(ln) for ln in proc.stdout.strip().splitlines()]
    assert proc.returncode == 0, rows
    assert {r["model"] for r in rows} == {"cls", "partseg", "semseg"}
    assert all(r["argmax_agreement"] >= 0.995 for r in rows)


@pytest.mark.parametrize("family,band", [("partseg", 512), ("semseg", 1024)])
def test_banded_drift_gate(tpu_present, family, band):
    """The opt-in --fast_extract banded path (ops/pallas_banded.py) holds the
    drift gate at its documented sweet-spot bands (PERF.md): banded-AMP vs
    exact — parity_drift's exact side strips DGCNN_TPU_FAST_EXTRACT."""
    proc = _run([os.path.join(ROOT, "tools", "parity_drift.py"),
                 "--model", family, "--batch", "32"],
                env_extra={"DGCNN_TPU_FAST_EXTRACT": str(band)})
    out = _last_json(proc)
    assert proc.returncode == 0, out
    assert out["argmax_agreement"] >= 0.995


# Per-family grad-cosine thresholds calibrated against the models'
# intrinsic gradient sensitivity at random init (tools/gates.py TRAIN_GATE
# rationale: in the fully EXACT path, rounding just the INPUT to bf16
# drops the cls/semseg self-cosine to 0.69/0.71 — EdgeConv max-over-k +
# kNN argmax routing is chaotic; the AMP path beats that floor).
TRAIN_GATES = {"cls": 0.80, "partseg": 0.995, "semseg": 0.85}


@pytest.mark.parametrize("family", ["cls", "partseg", "semseg"])
def test_train_drift_gate(tpu_present, family):
    """Exact-vs-AMP TRAIN fwd+bwd on chip for every family (r4 gated
    partseg only).  The exact side runs f32 HIGHEST kernels and — for the
    fusion Net — the dense XLA attention branch (DGCNN_TPU_PALLAS_EXACT
    disables fused AND flash, models/torch_transformer.py), the dispatch
    hole that crashed BENCH_r04."""
    proc = _run([os.path.join(ROOT, "tools", "parity_drift.py"),
                 "--model", family, "--train", "--batch", "8",
                 "--gate", str(TRAIN_GATES[family])])
    out = _last_json(proc)
    assert proc.returncode == 0, out
    assert out["grad_cosine"] >= TRAIN_GATES[family]
    assert out["loss_rel_delta"] <= 0.01


def test_flash_branch_train(tpu_present):
    """The library flash-attention branch (fused kernel disabled) passes the
    TRAIN drift gate at chip shapes: AMP side runs flash fwd+bwd in bf16
    (dropout=0 so flash is eligible), exact side the dense fallback.
    Covers the remaining TorchMultiheadAttention dispatch branch the other
    gates don't reach."""
    proc = _run([os.path.join(ROOT, "tools", "parity_drift.py"),
                 "--model", "partseg", "--train", "--batch", "8"],
                env_extra={"DGCNN_TPU_FUSED_ATTN": "0"})
    out = _last_json(proc)
    assert proc.returncode == 0, out
    assert out["grad_cosine"] >= 0.995


@pytest.mark.parametrize("family", ["cls", "partseg", "semseg"])
def test_learnability(tpu_present, family):
    """Full-size training on structured synthetic data generalizes to a
    held-out test set (proxy for reference README.md:86/146/285)."""
    proc = _run([os.path.join(ROOT, "tools", "learn_check.py"),
                 "--family", family])
    out = _last_json(proc)
    assert proc.returncode == 0, out
    assert out["ok"] and out["best_test_acc"] >= 0.9
