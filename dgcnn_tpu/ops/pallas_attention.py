"""Fused multi-head softmax attention with in-kernel probability dropout.

Why this kernel exists: the fusion ``Net``'s transformer trains with
dropout on the attention probabilities (torch ``nn.MultiheadAttention``
semantics — reference models/model_partseg.py:167-171 — under fp16
autocast, main_partseg_dist.py:221).  The library flash kernel has no
prob-dropout, so the training path previously fell back to dense XLA
attention, which materializes the (B, h, Nq, Nk) score, prob AND dropout
mask tensors in HBM for the backward (~1.6 GB of f32 per attention at
B24 h2 N2048 d256; the fusion Net runs six of them per step) — the
dominant cost of the partseg train step.

Design (TPU-first): at these shapes the whole K/V for one (batch, head)
pair fits comfortably in VMEM (Nk*d*2 bytes ~ 1 MB), so none of flash
attention's online-softmax bookkeeping (m/l carries, k-block loop) is
needed.  Each grid program owns one (TQ, d) query tile: it computes the
full (TQ, Nk) score tile on the MXU, softmaxes it in f32, applies
Bernoulli dropout drawn from the on-core PRNG, and contracts with V —
the probs never touch HBM.

Backward (custom VJP) saves only (q, k, v, seed): it recomputes the
probs (one extra QK^T per tile) and REGENERATES the identical dropout
mask by reseeding ``pltpu.prng_seed`` with the same (seed, b, h, tile)
tuple, then writes dq per tile and accumulates dk/dv across the
sequential innermost grid axis.

Numerics (mirrors torch autocast): matmuls run input-dtype x input-dtype
with f32 accumulation (bf16 on the AMP path), softmax and the
1/(1-rate) keep-scaling in f32.  The Bernoulli stream is the TPU core
PRNG, not torch's RNG (documented deviation, like every dropout here);
tests pin the math by materializing the kernel's own mask
(``dropout_mask``) and comparing against dense XLA attention given that
mask — see tests/test_pallas_attention.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dgcnn_tpu.ops.pallas_knn import _auto_interpret


def _pick_tile_q(nq: int, nk: int, d: int, live: int = 5) -> int:
    """Largest query tile keeping ``live`` (TQ, Nk) f32 temporaries plus
    the K/V slabs within a ~48 MB scoped-VMEM budget.  With dropout the
    bwd kernel holds five such temporaries (scores, probs, mask, dprobs,
    dscores) and the fwd/bwd tiles MUST agree (the per-tile PRNG streams
    align by flat tile id), so both pick with live=5; the dropout-free
    forward holds two and the dropout-free bwd four, each free to pick
    its own tile.  DGCNN_TPU_ATTN_TILE overrides (trace-time
    experiments)."""
    import os

    forced = os.environ.get("DGCNN_TPU_ATTN_TILE")
    if forced and forced.isdigit() and int(forced) and nq % int(forced) == 0:
        return int(forced)
    # 2048 (whole-Nq programs) measured no better than 1024 at the Net
    # eval shape (8.32 vs 8.22 ms) — fewer grid programs lose DMA overlap
    for tq in (1024, 512, 256, 128):
        if nq % tq == 0 and (live * tq * nk + 4 * nk * d) * 4 <= 48 * 1024 * 1024:
            return tq
    return 0


def supported(qshape, kshape) -> bool:
    """True if fused_attention handles these (B, h, N, d) shapes."""
    _, _, nq, d = qshape
    nk = kshape[2]
    return (
        d % 128 == 0
        and nk % 128 == 0
        and _pick_tile_q(nq, nk, d) > 0
    )


def _keep_mask(shape, rate: float):
    """Bernoulli(1 - rate) keep mask from the (already seeded) core PRNG.

    The uint32 stream is compared in int32 space: bits are uniform over
    [-2^31, 2^31), so P(bits >= t) = 1 - rate for t = rate*2^32 - 2^31.
    """
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    thresh = np.int32(min(round(rate * 2.0**32) - 2**31, 2**31 - 1))
    return bits >= thresh


def _probs(q, k, scale):
    """(TQ, Nk) f32 softmax probs from input-dtype matmul, f32 accumulate."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _attn_fwd_kernel(rate, scale, q_ref, k_ref, v_ref, seed_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu

    p = _probs(q_ref[0, 0], k_ref[0, 0], scale)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl_program_id3())
        keep = _keep_mask(p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    v = v_ref[0, 0]
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def pl_program_id3() -> jax.Array:
    """Flat (b, h, tile) program index — the per-tile PRNG stream offset.

    Folding the three ids into ONE seed scalar (rather than passing all
    three to prng_seed) keeps the fwd/bwd streams aligned by construction:
    both kernels run the identical (grid, tile) decomposition."""
    from jax.experimental import pallas as pl

    return (
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    ) * pl.num_programs(2) + pl.program_id(2)


def _attn_bwd_kernel(rate, scale, q_ref, k_ref, v_ref, seed_ref, do_ref,
                     dq_ref, dk_ref, dv_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    p = _probs(q, k, scale)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl_program_id3())
        keep = _keep_mask(p.shape, rate)
        pt = jnp.where(keep, p * inv, 0.0)
    else:
        pt = p

    # dv += p~^T dO   (contract the TQ rows; p~ cast like the fwd matmul)
    dv_c = jax.lax.dot_general(
        pt.astype(v.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp~ = dO V^T ; chain the dropout mask; softmax VJP
    dpt = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.where(keep, dpt * inv, 0.0) if rate > 0.0 else dpt
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dsb = (ds * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_c = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    ti = pl.program_id(2)

    @pl.when(ti == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] = dk_ref[0, 0] + dk_c.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_ref[0, 0] + dv_c.astype(dv_ref.dtype)


def _specs(b, h, nq, nk, d, tq):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q_spec = pl.BlockSpec((1, 1, tq, d), lambda bi, hi, ti: (bi, hi, ti, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, nk, d), lambda bi, hi, ti: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return q_spec, kv_spec, seed_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_attention(q, k, v, seed, rate, scale, interpret):
    return _attn_fwd_impl(q, k, v, seed, rate, scale, interpret)


@functools.partial(jax.jit,
                   static_argnames=("rate", "scale", "interpret"))
def _attn_fwd_impl(q, k, v, seed, rate, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, d = q.shape
    nk = k.shape[2]
    tq = _pick_tile_q(nq, nk, d, live=5 if rate > 0.0 else 2)
    q_spec, kv_spec, seed_spec = _specs(b, h, nq, nk, d, tq)
    flops = 2 * b * h * nq * nk * d * 2
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, rate, scale),
        grid=(b, h, nq // tq),
        in_specs=[q_spec, kv_spec, kv_spec, seed_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=q.size * q.dtype.itemsize * 2
            + 2 * k.size * k.dtype.itemsize * (nq // tq),
            transcendentals=b * h * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(q, k, v, seed)


def _fa_fwd(q, k, v, seed, rate, scale, interpret):
    out = _attn_fwd_impl(q, k, v, seed, rate, scale, interpret)
    return out, (q, k, v, seed)


@functools.partial(jax.jit,
                   static_argnames=("rate", "scale", "interpret"))
def _attn_bwd_impl(q, k, v, seed, do, rate, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, d = q.shape
    nk = k.shape[2]
    tq = _pick_tile_q(nq, nk, d, live=5 if rate > 0.0 else 4)
    q_spec, kv_spec, seed_spec = _specs(b, h, nq, nk, d, tq)
    flops = 5 * b * h * nq * nk * d * 2
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, rate, scale),
        grid=(b, h, nq // tq),
        in_specs=[q_spec, kv_spec, kv_spec, seed_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, nk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * q.size * q.dtype.itemsize
            + 4 * k.size * k.dtype.itemsize * (nq // tq),
            transcendentals=b * h * nq * nk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(q, k, v, seed, do)


def _fa_bwd(rate, scale, interpret, res, do):
    q, k, v, seed = res
    dq, dk, dv = _attn_bwd_impl(q, k, v, seed, do, rate, scale, interpret)
    return dq, dk, dv, np.zeros(seed.shape, dtype=jax.dtypes.float0)


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    sm_scale: float,
    dropout_rate: float = 0.0,
    seed: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Softmax attention over (B, h, N, d) with optional prob-dropout.

    ``seed``: int32 (1,) array; required when ``dropout_rate > 0``.  The
    same seed reproduces the same mask (callers draw a fresh one per
    step from their dropout RNG stream).
    """
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _fused_attention(q, k, v, seed, float(dropout_rate),
                            float(sm_scale), interpret)


@functools.partial(jax.jit,
                   static_argnames=("shape", "rate", "d", "interpret"))
def dropout_mask(shape, seed, rate: float, d: int,
                 interpret: bool | None = None):
    """Materialize the exact keep mask ``fused_attention`` draws for
    (B, h, Nq, Nk) = ``shape`` and head dim ``d`` under ``seed`` — the test
    oracle: dense XLA attention given this mask must match the fused
    kernel's output and gradients.  Regenerates via the same
    (seed, flat tile id) stream, so ``d`` must match the attention call's
    (it fixes the tile size)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, nq, nk = shape
    tq = _pick_tile_q(nq, nk, d)

    def kern(seed_ref, m_ref):
        pltpu.prng_seed(seed_ref[0], pl_program_id3())
        m_ref[0, 0] = _keep_mask((tq, nk), rate).astype(jnp.float32)

    m_spec = pl.BlockSpec((1, 1, tq, nk), lambda bi, hi, ti: (bi, hi, ti, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, h, nq // tq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=m_spec,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=_auto_interpret(interpret),
    )(seed)
