"""Fused Pallas kNN kernels — the hot loop of every DGCNN forward
(SURVEY.md §3.5 #1-#2; BASELINE.json north-star).

Why XLA's path is slow here: ``lax.top_k`` sorts each N-row (~20 ms for
(64, 1024, 1024) on v5e) and the neighbour gather scatters 300+ MB of edge
features through HBM (~8 ms).  This kernel computes, per batch item, the
score tile on the MXU and then extracts the k nearest neighbours by
**iterative masked argmax in VMEM** — and instead of gathering rows by index,
it selects each neighbour's projected features with a one-hot (TILE_N, N) x
(N, Co) **matmul**, accumulating the EdgeConv reductions (max/min/sum) on the
fly.  The (B, N, k, C) edge tensor never exists anywhere, and the only HBM
traffic is x, a in and (idx, reductions) out.

Numerics: with f32 ``select_dtype`` (parity tests, HOG covariance) or
DGCNN_TPU_PALLAS_EXACT=1, kernels compute scores at HIGHEST (f32-exact)
and extract with the exact v1 loop, so neighbour sets AND tie order match
the XLA/torch reference exactly (torch.topk: lowest index among ties).
The default is an AMP-style mode mirroring the reference's fp16 autocast
training (main_partseg_dist.py:221): bf16 feature selection, 3-pass
bf16x3 scores, and the packed single-reduce v2 extraction (_pack_keys —
torch tie order on bit-equal scores, index-emitting) or the v3 class-walk
(eval-only kernels whose payload width leaves a free count lane).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 128


def _supported(n: int) -> bool:
    return n % TILE_N == 0


def _pick_tile(n: int) -> int:
    """Largest query tile whose (tile, N) f32 score block stays ~2 MB — bigger
    tiles amortize per-program overhead (measured: 512 is ~25% faster than 128
    at N=1024) while leaving VMEM room for the x/a slabs and pipelining.
    Tried and rejected (r2): a 4 MB cap (tile 1024 at N=1024, 256 at N=4096)
    wins 2-9% at single-stage ubench but is flat at cls model level and
    REGRESSES semseg 353->310 clouds/s — fewer grid programs lose more
    DMA/compute overlap than the per-program overhead saved.
    DGCNN_TPU_TILE overrides for experiments (trace-time)."""
    import os

    forced = os.environ.get("DGCNN_TPU_TILE")
    if forced and forced.isdigit() and int(forced) > 0 and n % int(forced) == 0:
        return int(forced)
    for tile in (512, 256, 128):
        if n % tile == 0 and tile * n * 4 <= 2 * 1024 * 1024:
            return tile
    return TILE_N


def _extract_loop_v1(scores, k, n, payload_fn, onehot_dtype=jnp.float32):
    """Masked-rewrite iterative top-k extraction (unrolled: measured 2x faster
    than a fori_loop body).  Mosaic fuses the mask-out into the next
    max-reduce, leaving ~4 block traversals per iteration, VPU-bound.

    scores: (TILE_N, N) f32.  payload_fn(onehot, t) consumes the one-hot
    selection of iteration t, cast directly to ``onehot_dtype`` (casting to
    the selection dtype here avoids an f32 intermediate pass).  Returns the
    (TILE_N, k) int32 indices.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    idx_cols = []
    for t in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores == m
        # lowest index among ties — torch.topk ordering
        jsel = jnp.min(jnp.where(is_max, col, n), axis=1, keepdims=True)
        sel_mask = col == jsel
        payload_fn(sel_mask.astype(onehot_dtype), t)
        idx_cols.append(jsel)
        if t + 1 < k:
            scores = jnp.where(sel_mask, -jnp.inf, scores)
    return jnp.concatenate(idx_cols, axis=1).astype(jnp.int32)


def _index_bits(n: int) -> int:
    return max((n - 1).bit_length(), 1)


def _pack_keys(scores, n):
    """Pack each f32 score row into monotonic int32 keys whose low
    ``_index_bits(n)`` bits carry the NEGATED column index, so that a single
    integer max-reduce yields the (score, lowest-index-among-ties) winner —
    the torch.topk tie rule (reference models/dgcnn.py:12) — in one pass.

    32 bits cannot hold a full f32 score plus an index, so the score is
    quantized to a per-row fixed-point grid: q = round(s * (2^(31-b)-1) /
    |min_row|), b = _index_bits(n).  The quantization step is
    |min_row| * 2^-(31-b) — within ~2x of the f32 rounding noise the
    score computation itself carries (the 2x'tx - |x|^2 - |x|^2T form
    loses ~2^-23 * scale to cancellation), so v2 deviates from exact f32
    ordering only where the reference's own arithmetic is already
    noise-dominated.  BIT-EQUAL scores (duplicated points — the S3DIS
    case) quantize equal and resolve by lowest index, exactly like torch.

    Key layout: q * 2^b + (n-1-col); q in [-(2^(31-b)-1), 0] keeps the sum
    within int32, and the masked rewrite value INT32_MIN stays strictly
    below every real key.  Rows with all-zero scores (fully degenerate
    clouds) get scale 0 and walk columns in index order — torch's order
    for an all-tied row.
    """
    b = _index_bits(n)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    rmin = jnp.min(scores, axis=1, keepdims=True)
    lim = float(2 ** (31 - b) - 1)
    scale = jnp.where(rmin < 0, -lim / rmin, 0.0)
    # clamp: the row-min score times the f32-rounded scale can round to
    # -(lim+1), and -(lim+1) * 2^b + (n-1-(n-1)) == INT32_MIN exactly —
    # colliding with the masked-rewrite sentinel (a spurious member in any
    # consumer that tests keys == sentinel, e.g. _knn_sum_kernel's
    # multi-hot, and a duplicate key after rewrites in the v2 walk)
    q = jnp.maximum(jnp.round(scores * scale), -lim).astype(jnp.int32)
    return q * jnp.int32(2 ** b) + (jnp.int32(n - 1) - col)


def _extract_loop_v2(scores, k, n, payload_fn, onehot_dtype=jnp.float32):
    """Single-reduce packed extraction (see _pack_keys): per iteration ONE
    integer max-reduce, one compare (the guaranteed-single-hot selection
    mask — keys are unique by construction) and one masked rewrite — v3's
    per-iteration cost WITH a per-member index stream, so index-emitting
    kernels (training, semseg) can run it.  Same payload/return contract
    as _extract_loop_v1.  (Tried and rejected r3: a v3-style read-only walk
    ``m = max(keys < m)`` — 6% SLOWER than rewrite-and-re-reduce; Mosaic
    fuses the masked rewrite into the next reduce, and the walk's masked
    reduce does not fuse as tightly.  Also rejected r3: a paired "v2p"
    loop extracting TWO winners per traversal via an elementwise top-2
    chunk fold (3 VPU ops/element) — 8% slower at N=4096 and 17% at
    N=1024 for any fold width; the loop is ALU-bound, not traversal-
    bound, and the per-winner eq mask + rewrite don't halve, so the
    merge's extra ops outweigh the saved reduce.)"""
    mask = jnp.int32(2 ** _index_bits(n) - 1)
    keys = _pack_keys(scores, n)
    idx_cols = []
    for t in range(k):
        m = jnp.max(keys, axis=1, keepdims=True)
        sel_mask = keys == m
        payload_fn(sel_mask.astype(onehot_dtype), t)
        idx_cols.append(jnp.int32(n - 1) - (m & mask))
        if t + 1 < k:
            keys = jnp.where(sel_mask, jnp.iinfo(jnp.int32).min, keys)
    return jnp.concatenate(idx_cols, axis=1)


def _extract_loop_v3(scores, k, n, a_parts, state, consume_fn, onehot_dtype):
    """Single-reduction "class-walk" selection — the fast eval default.

    Per iteration: one masked max-reduce (the next strictly-smaller score
    value) and one selection matmul of the candidate mask, with a ones lane
    appended into the payload operand's lane padding so the per-row
    candidate count accumulates in the same MXU pass.  That is the entire
    VPU cost — ~0.55 ms/call cheaper than v1 at every DGCNNCls stage shape
    whose payload width leaves lane padding (tools/ubench_stage.py).

    Semantics: rows whose top-k scores are all distinct (every row, for
    clouds without f32 distance collisions) take cnt==1 every iteration, and
    ``sel / 1.0`` is an IEEE no-op — bit-identical to v1.  A row where c > 1
    candidates tie walks the tied *class* in one iteration, consuming the
    average of the tied members' features (bounded — a convex combination,
    exact when the tie comes from duplicated points) and then continues to
    the next-smaller class, so its effective neighbourhood is its top-k
    score *classes*.  Use v1 (DGCNN_TPU_EXTRACT=v1, or any kernel that
    outputs indices) for bit-exact torch.topk member-by-member order —
    duplicate-heavy data (S3DIS blocks) is pinned to v1 by cli/semseg.py.

    Tried and rejected alternatives for exact-at-this-cost (r2): per-
    iteration ``lax.cond`` tie repair pays both branches in Mosaic (v4);
    per-iteration ``pl.when`` scratch rewrites serialize (v6); a whole-loop
    ``pl.when`` repair region costs ~60% even when EMPTY and never taken
    (v7) — predicated regions are not free on this hardware.  f32 score
    collisions between distinct points are inherent at deeper stages
    (scalar birthday collisions at 2^-24), so per-call XLA-level repair
    would always trigger at batch scale.
    """
    ones = jnp.ones((n, 1), jnp.float32)
    m = jnp.max(scores, axis=1, keepdims=True)
    for t in range(k):
        cand = (scores == m).astype(onehot_dtype)
        sel, aux = _sel_dot(cand, a_parts, ones)
        cnt = jnp.maximum(aux[:, 0:1], 1.0)
        state = consume_fn(state, sel / cnt, t)
        if t + 1 < k:
            mnext = jnp.max(jnp.where(scores < m, scores, -jnp.inf),
                            axis=1, keepdims=True)
            # a row with fewer than k distinct classes re-walks its last
            # (farthest) class instead of consuming phantom zeros —
            # idempotent for the max/min consumers v3 serves, and exact
            # reference behaviour when that class is a singleton
            m = jnp.where(mnext > -jnp.inf, mnext, m)
    return state


def _sel_dot(mask, parts, aux=None):
    """Selection matmul of a 0/1 mask against split operand ``parts`` (see
    _onehot_dot); when ``aux`` (N, A) is given it is appended to the first
    part's lanes so its columns (e.g. a ones lane -> per-row count)
    accumulate in the same MXU pass — free whenever Co + A stays within the
    payload's 128-lane padding.  Returns (sel (TILE, Co) f32,
    auxout (TILE, A) f32 | None)."""
    dims = (((1,), (0,)), ((), ()))
    if not parts:
        out = jax.lax.dot_general(mask, aux.astype(mask.dtype),
                                  dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
        return None, out
    if aux is None:
        return _onehot_dot(mask, parts, dims), None
    first = jnp.concatenate([parts[0], aux.astype(parts[0].dtype)], axis=1)
    out = jax.lax.dot_general(mask, first, dimension_numbers=dims,
                              preferred_element_type=jnp.float32)
    co = parts[0].shape[1]
    sel, auxout = out[:, :co], out[:, co:]
    for p in parts[1:]:
        sel = sel + jax.lax.dot_general(mask, p, dimension_numbers=dims,
                                        preferred_element_type=jnp.float32)
    return sel, auxout


def _extract_version(default: str, allow: tuple[str, ...]) -> str:
    """Extraction-loop variant for one kernel: an explicit DGCNN_TPU_EXTRACT
    override (read at TRACE time — set before the first forward) when it is
    in ``allow`` for this kernel; else v1 whenever exact mode
    (DGCNN_TPU_PALLAS_EXACT) is on — bit-level parity includes torch's
    member-by-member tie order; else ``default``.  Kernels that output
    neighbour indices allow v1 (exact) and v2 (packed single-reduce, torch
    tie order on bit-equal scores); v3 walks tied classes and has no
    per-member index stream, so only non-index kernels allow it."""
    import os

    env = os.environ.get("DGCNN_TPU_EXTRACT")
    if env in allow:
        return env
    if os.environ.get("DGCNN_TPU_PALLAS_EXACT"):
        return "v1"
    return default


def select_x_plan(cin: int, co: int) -> tuple[bool, str]:
    """The eval EdgeConv selection plan for payload widths (Cin raw, Co
    projected): (select_x, variant).  select-x selects raw features and
    projects per selection; it pays only when it removes a whole 128-lane
    selection pass (measured — see _edge_conv1_kernel docstring).  Payload
    widths with lane padding left take v3 (its count lane rides the
    padding); exact multiples of 128 take v2, whose packed extraction
    needs no count lane (r2's v1 fallback is gone — v2 matches v3's
    per-iteration cost).  Since v2 ~= v3 in cost, equal-pass shapes stay
    project-first (no per-selection projection matmuls).  bench.py's FLOPs
    model imports this so the reported MFU tracks the implementation."""

    def lane_plan(width):
        v = "v3" if width % 128 else "v2"
        return v, -(-(width + (v == "v3")) // 128)

    va, pa = lane_plan(co)
    vb, pb = lane_plan(cin)
    select_x = pb < pa
    return select_x, (vb if select_x else va)


def _run_select(scores, k, n, a_parts, init_state, consume_fn, finalize_fn,
                onehot_dtype, variant="v1"):
    """Selection engine: extracts the k nearest columns of each score row,
    folds the payload's selected features ``sel = onehot @ sum(a_parts)``
    through ``state = consume_fn(state, sel, t)`` and hands the final state
    to ``finalize_fn(state, idx)``.  variant v1 = exact torch.topk order
    (idx (TILE, k) int32); v2 = packed single-reduce (idx emitted, torch
    tie order on bit-equal scores — see _pack_keys); v3 = fast class-walk
    (idx is None — only valid for kernels that do not output indices)."""
    if variant == "v3":
        st = _extract_loop_v3(scores, k, n, a_parts, init_state, consume_fn,
                              onehot_dtype)
        finalize_fn(st, None)
        return

    box = {"s": init_state}

    def payload(onehot, t):
        if a_parts:
            sel, _ = _sel_dot(onehot, a_parts)
            box["s"] = consume_fn(box["s"], sel, t)

    loop = _extract_loop_v2 if variant == "v2" else _extract_loop_v1
    idx = loop(scores, k, n, payload, onehot_dtype)
    finalize_fn(box["s"], idx)


def _scores(xq, xall, exact: bool = True):
    """Negative squared distances (torch-compatible form).  ``exact`` (the
    default) runs the inner-product matmul at HIGHEST (6-pass, f32-exact) —
    index-emitting kernels need torch-exact neighbour sets.  The AMP-style
    eval kernels pass exact=False: a hand-rolled 3-pass bf16x3 (hi*hi +
    hi*lo + lo*hi — Mosaic does not lower Precision.HIGH), ~2^-22 relative,
    the same error class as their bf16 feature selection, with near-tie
    flips absorbed by the v3 class-walk semantics."""
    dims = (((1,), (1,)), ((), ()))
    if exact:
        inner = jax.lax.dot_general(
            xq, xall, dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    elif xq.dtype == jnp.bfloat16 and xall.dtype == jnp.bfloat16:
        # inputs already bf16-rounded (bf16 inter-stage features): the
        # low-order split parts are exactly zero — one pass IS bf16x3
        inner = jax.lax.dot_general(
            xq, xall, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
    else:
        qh = xq.astype(jnp.bfloat16)
        ql = (xq - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        ah = xall.astype(jnp.bfloat16)
        al = (xall - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        inner = None
        for a, b in ((qh, ah), (qh, al), (ql, ah)):
            d = jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32,
            )
            inner = d if inner is None else inner + d
    qq = jnp.sum(jnp.square(xq.astype(jnp.float32)), axis=1, keepdims=True)
    aa = jnp.sum(jnp.square(xall.astype(jnp.float32)), axis=1, keepdims=True)
    return 2.0 * inner - qq - aa.T


def _split3(a: jax.Array) -> tuple[jax.Array, ...]:
    """Exact 3-way bf16 split of an f32 array: a == hi + mid + lo (the 24
    mantissa bits land in three 8-bit bf16 chunks, all sums exactly
    representable)."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot_dot(onehot, parts, dims=(((1,), (0,)), ((), ()))):
    """Sum of single-pass bf16 matmuls against the split operand.  With a
    0/1 one-hot (exact in bf16) this reconstructs the f32 selection exactly
    at 3 MXU passes — half the cost of a Precision.HIGHEST f32 matmul, which
    needlessly splits the one-hot operand too.  Narrow payloads (total
    split lanes within one 128-lane pass) concatenate the parts along lanes
    instead: ONE matmul, summed by slicing — 3x cheaper for Co <= 42."""
    co = parts[0].shape[1]
    if len(parts) > 1 and len(parts) * co <= 128:
        cat = jnp.concatenate(parts, axis=1)
        sel = jax.lax.dot_general(
            onehot, cat, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = sel[:, :co]
        for p in range(1, len(parts)):
            out = out + sel[:, p * co:(p + 1) * co]
        return out
    out = None
    for p in parts:
        d = jax.lax.dot_general(
            onehot, p, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        out = d if out is None else out + d
    return out


def _knn_reduce_kernel(k, select_dtype, with_sumsq, extract, q_ref, x_ref,
                       a_ref, idx_ref, amax_ref, amin_ref, asum_ref,
                       *maybe_sq_ref):
    n = x_ref.shape[1]
    co = a_ref.shape[2]
    tile = q_ref.shape[1]
    # f32 select = the exact contract (parity tests, HOG covariance):
    # HIGHEST 6-pass scores + v1 torch-order extraction + 3-way-split
    # selection.  bf16 select = the AMP/training default, mirroring the
    # reference's fp16 autocast training (main_partseg_dist.py:221):
    # 3-pass bf16x3 scores + packed v2 extraction + single-pass selection
    # (feature values bf16-rounded — argmax-stable).  ``extract`` pins the
    # loop regardless (e.g. HOG: exact scores/selection + v2 loop).
    exact = select_dtype == jnp.float32
    scores = _scores(q_ref[0], x_ref[0], exact=exact)
    variant = extract or _extract_version("v1" if exact else "v2",
                                          ("v1", "v2"))
    a_parts = (_split3(a_ref[0]) if exact
               else (a_ref[0].astype(jnp.bfloat16),))

    init = (
        jnp.full((tile, co), -jnp.inf, jnp.float32),
        jnp.full((tile, co), jnp.inf, jnp.float32),
        jnp.zeros((tile, co), jnp.float32),
        jnp.zeros((tile, co), jnp.float32),
    )

    def consume(st, sel, t):
        amax, amin, asum, asq = st
        return (jnp.maximum(amax, sel), jnp.minimum(amin, sel), asum + sel,
                asq + jnp.square(sel) if with_sumsq else asq)

    def finalize(st, idx):
        amax, amin, asum, asq = st
        idx_ref[0] = idx
        amax_ref[0] = amax
        amin_ref[0] = amin
        asum_ref[0] = asum
        if with_sumsq:
            maybe_sq_ref[0][0] = asq

    _run_select(scores, k, n, a_parts, init, consume, finalize,
                onehot_dtype=jnp.bfloat16, variant=variant)


def _knn_reduce_xw_kernel(k, select_dtype, with_sumsq, q_ref, x_ref, xf_ref,
                          w_ref, idx_ref, amax_ref, amin_ref, asum_ref,
                          *maybe_sq_ref):
    """select-x variant of _knn_reduce_kernel: selects the RAW features
    (Cin lanes) and projects each selection with ``w`` before the
    reductions — identical outputs (selection commutes with the linear
    map; squares taken after projection), half the selection-matmul lanes
    whenever ceil(Cin/128) < ceil(Co/128) (the training-path analogue of
    _edge_conv1_kernel's select-x mode).  Score/extraction precision keys
    off select_dtype like _knn_reduce_kernel (exact f32 vs AMP bf16x3+v2)."""
    n = x_ref.shape[1]
    co = w_ref.shape[1]
    tile = q_ref.shape[1]
    exact = select_dtype == jnp.float32
    scores = _scores(q_ref[0], x_ref[0], exact=exact)
    variant = _extract_version("v1" if exact else "v2", ("v1", "v2"))
    a_parts = _parts(xf_ref[0], exact)
    w = w_ref[:]

    init = (
        jnp.full((tile, co), -jnp.inf, jnp.float32),
        jnp.full((tile, co), jnp.inf, jnp.float32),
        jnp.zeros((tile, co), jnp.float32),
        jnp.zeros((tile, co), jnp.float32),
    )

    def consume(st, sel_x, t):
        sel = jax.lax.dot_general(
            sel_x, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if select_dtype != jnp.float32:
            # AMP: keep the reduced values bf16-representable so the
            # backward kernel's re-extraction of bf16(x @ w) rows finds
            # the exact same max/min values (tie detection sel == amax)
            sel = sel.astype(jnp.bfloat16).astype(jnp.float32)
        amax, amin, asum, asq = st
        return (jnp.maximum(amax, sel), jnp.minimum(amin, sel), asum + sel,
                asq + jnp.square(sel) if with_sumsq else asq)

    def finalize(st, idx):
        amax, amin, asum, asq = st
        idx_ref[0] = idx
        amax_ref[0] = amax
        amin_ref[0] = amin
        asum_ref[0] = asum
        if with_sumsq:
            maybe_sq_ref[0][0] = asq

    _run_select(scores, k, n, a_parts, init, consume, finalize,
                onehot_dtype=jnp.bfloat16, variant=variant)


@functools.partial(
    jax.jit, static_argnames=("k", "select_dtype", "interpret", "with_sumsq")
)
def fused_knn_reduce_xw(
    x: jax.Array,
    xf: jax.Array,
    w: jax.Array,
    k: int,
    *,
    select_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    with_sumsq: bool = False,
):
    """fused_knn_reduce over the virtual projection ``a = xf @ w`` without
    materializing it in the selection: raw rows are selected (Cin lanes)
    and projected per selection.  Same outputs/contract as
    ``fused_knn_reduce(x, xf @ w, k, ...)``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    cin = xf.shape[2]
    co = w.shape[1]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)

    kernel = functools.partial(_knn_reduce_xw_kernel, k, select_dtype,
                               with_sumsq)
    red = jax.ShapeDtypeStruct((b, n, co), jnp.float32)
    red_spec = pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, n, k), jnp.int32), red, red, red]
    out_specs = [
        pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        red_spec, red_spec, red_spec,
    ]
    if with_sumsq:
        out_shape.append(red)
        out_specs.append(red_spec)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cin), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(x, x, xf, w)


def _train_exact() -> bool:
    """Training selection precision: bf16 single-pass by default (AMP-style,
    mirroring the reference's fp16 autocast training,
    main_partseg_dist.py:221); DGCNN_TPU_PALLAS_EXACT=1 forces the exact
    3-way-split f32 selection (parity tests)."""
    import os

    return bool(os.environ.get("DGCNN_TPU_PALLAS_EXACT"))


def _parts(x, exact: bool):
    """Split operand for _onehot_dot: exact 3-way f32 or single bf16."""
    return _split3(x) if exact else (x.astype(jnp.bfloat16),)


def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


@functools.partial(
    jax.jit, static_argnames=("k", "select_dtype", "interpret", "with_sumsq",
                              "extract")
)
def fused_knn_reduce(
    x: jax.Array,
    a: jax.Array,
    k: int,
    *,
    select_dtype=jnp.bfloat16,
    interpret: bool | None = None,
    with_sumsq: bool = False,
    extract: str | None = None,
):
    """Fused kNN + neighbour-feature reductions.

    Args:
      x: (B, N, C) points/features defining the graph.
      a: (B, N, Co) projected features to reduce over each neighbourhood
         (EdgeConv's ``x @ w_nbr``).
      with_sumsq: also return the per-neighbourhood sum of squares (training
         BatchNorm statistics).
    Returns:
      idx  (B, N, k) int32 neighbour indices (self first, torch tie order),
      amax (B, N, Co) max  over the k neighbours of a,
      amin (B, N, Co) min  over the k neighbours of a,
      asum (B, N, Co) sum  over the k neighbours of a,
      [asumsq (B, N, Co) when with_sumsq].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    co = a.shape[2]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)
    grid = (b, n // tile)

    kernel = functools.partial(_knn_reduce_kernel, k, select_dtype,
                               with_sumsq, extract)
    red = jax.ShapeDtypeStruct((b, n, co), jnp.float32)
    red_spec = pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, n, k), jnp.int32), red, red, red]
    out_specs = [
        pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
        red_spec, red_spec, red_spec,
    ]
    if with_sumsq:
        out_shape.append(red)
        out_specs.append(red_spec)
    flops_sel = 2 * b * n * k * co + 2 * b * n * n * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops_sel,
            bytes_accessed=4 * (b * n * c + b * n * co * 4),
            transcendentals=0,
        ),
        # raise the scoped-vmem ceiling: XLA sometimes VMEM-places a whole
        # output tensor of this call at larger batch (observed OOM at 16M)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(x, x, a)


def knn_edge_reduce(xg: jax.Array, a: jax.Array, k: int):
    """Differentiable fused kNN + reductions for the training path.

    Forward = the Pallas kernel (with sum-of-squares for BN statistics);
    backward = the no-gather Pallas scatter kernel.  Precision follows
    _train_exact(): the default is AMP-style — bf16 selection, 3-pass
    bf16x3 scores, packed v2 extraction — mirroring the reference, which
    TRAINS under fp16 autocast (main_partseg_dist.py:221), so its training
    neighbour sets are half-precision too; DGCNN_TPU_PALLAS_EXACT=1 forces
    exact f32 selection + HIGHEST scores + v1 torch-order extraction
    (neighbour indices are non-differentiable either way, like torch.topk).

    Returns (idx, amax, amin, asum, asumsq).
    """
    return _knn_edge_reduce(xg, a, k, _train_exact())


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _knn_edge_reduce(xg: jax.Array, a: jax.Array, k: int, exact: bool):
    """custom-vjp core of knn_edge_reduce (exact is a static flag).

    """
    dt = jnp.float32 if exact else jnp.bfloat16
    return fused_knn_reduce(xg, a, k, select_dtype=dt, with_sumsq=True)


def _ker_fwd(xg, a, k, exact):
    out = _knn_edge_reduce(xg, a, k, exact)
    idx, amax, amin = out[0], out[1], out[2]
    return out, (xg, a, idx, amax, amin)


def _edge_reduce_bwd_kernel(k, exact, idx_ref, a_ref, amax_ref, amin_ref,
                            ctmax_ref, ctmin_ref, ctsum_ref, ctsq_ref,
                            da_ref, sel_scratch):
    """Backward of the fused kNN reductions without any HBM gather.

    One-hots come straight from the saved indices (a compare, no extraction),
    selections are recomputed exactly (one-hot matmul at HIGHEST precision =
    exact row extraction), max/min cotangents split evenly among ties
    (matching jax.lax.reduce_max/min VJP), and the scatter back to ``da`` is
    a transposed one-hot matmul accumulated across the tile grid.
    """
    from jax.experimental import pallas as pl

    n = a_ref.shape[1]
    co = a_ref.shape[2]
    tile = idx_ref.shape[1]
    ti = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    a = a_ref[0]
    amax = amax_ref[0]
    amin = amin_ref[0]
    idx = idx_ref[0]

    # pass 1: recompute selections, count max/min ties per (row, channel)
    a_parts = _parts(a, exact)
    cmax = jnp.zeros((tile, co), jnp.float32)
    cmin = jnp.zeros((tile, co), jnp.float32)
    for t in range(k):
        onehot = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        sel = _onehot_dot(onehot, a_parts)
        sel_scratch[t] = sel
        cmax = cmax + (sel == amax).astype(jnp.float32)
        cmin = cmin + (sel == amin).astype(jnp.float32)

    gmax = ctmax_ref[0] / cmax
    gmin = ctmin_ref[0] / cmin
    gsum = ctsum_ref[0]
    gsq2 = 2.0 * ctsq_ref[0]

    @pl.when(ti == 0)
    def _():
        da_ref[0] = jnp.zeros((n, co), jnp.float32)

    # pass 2: per-edge cotangent, scattered via the transposed one-hot
    for t in range(k):
        sel = sel_scratch[t]
        w = (jnp.where(sel == amax, gmax, 0.0)
             + jnp.where(sel == amin, gmin, 0.0)
             + gsum + sel * gsq2)
        onehot = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        da_ref[0] = da_ref[0] + _onehot_dot(
            onehot, _parts(w, exact), dims=(((0,), (0,)), ((), ())))


@functools.partial(jax.jit, static_argnames=("k", "exact", "interpret"))
def edge_reduce_bwd(idx, a, amax, amin, ct_max, ct_min, ct_sum, ct_sumsq,
                    k: int, *, exact: bool = True,
                    interpret: bool | None = None):
    """da of (amax, amin, asum, asumsq) w.r.t. ``a`` — see bwd kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, co = a.shape
    # tile bounded by the (k, tile, co) selection scratch (~4MB budget)
    tile = _pick_tile_scratch(n, k, co)
    red_spec = pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_edge_reduce_bwd_kernel, k, exact),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            red_spec, red_spec, red_spec, red_spec, red_spec, red_spec,
        ],
        out_specs=pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, tile, co), jnp.float32)],


        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(idx, a, amax, amin, ct_max, ct_min, ct_sum, ct_sumsq)


def _ker_bwd_xla(a, idx, cts):
    """XLA fallback backward: gather-recompute + autodiff (the pre-Pallas
    path; kept as the reference semantics and the small-N fallback)."""
    from dgcnn_tpu.ops.graph import gather_neighbors

    _, ct_max, ct_min, ct_sum, ct_sumsq = cts

    def reductions(a_):
        ag = gather_neighbors(a_, idx)
        return (
            jnp.max(ag, axis=2),
            jnp.min(ag, axis=2),
            jnp.sum(ag, axis=2),
            jnp.sum(jnp.square(ag), axis=2),
        )

    _, vjp = jax.vjp(reductions, a)
    (da,) = vjp((ct_max, ct_min, ct_sum, ct_sumsq))
    return da


def _ker_bwd(k, exact, res, cts):
    xg, a, idx, amax, amin = res
    _, ct_max, ct_min, ct_sum, ct_sumsq = cts
    da = edge_reduce_bwd(idx, a, amax, amin, ct_max, ct_min, ct_sum,
                         ct_sumsq, k, exact=exact)
    # graph tensor receives no gradient through the (non-diff) neighbour
    # selection — torch.topk semantics
    return jnp.zeros_like(xg), da


_knn_edge_reduce.defvjp(_ker_fwd, _ker_bwd)


def knn_edge_reduce_xw(xg: jax.Array, x: jax.Array, w: jax.Array, k: int):
    """Differentiable select-x form of knn_edge_reduce: same outputs as
    ``knn_edge_reduce(xg, x @ w, k)`` but the selection runs over the raw
    Cin-lane features (use when ceil(Cin/128) < ceil(Co/128) — e.g. the
    128->256 stage).  Backward recomputes the projection and chains the
    no-gather Pallas scatter through it (d_x = d_a w^T, d_w = x^T d_a)."""
    return _knn_edge_reduce_xw(xg, x, w, k, _train_exact())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _knn_edge_reduce_xw(xg, x, w, k, exact):
    dt = jnp.float32 if exact else jnp.bfloat16
    return fused_knn_reduce_xw(xg, x, w, k, select_dtype=dt,
                               with_sumsq=True)


def _ker_xw_fwd(xg, x, w, k, exact):
    out = _knn_edge_reduce_xw(xg, x, w, k, exact)
    idx, amax, amin = out[0], out[1], out[2]
    return out, (xg, x, w, idx, amax, amin)


def _ker_xw_bwd(k, exact, res, cts):
    from dgcnn_tpu.ops.edge_conv import _project

    xg, x, w, idx, amax, amin = res
    _, ct_max, ct_min, ct_sum, ct_sumsq = cts
    # recompute the projection the forward never materialized; the scatter
    # kernel's tie detection (sel == amax) matches because both sides are
    # the same rounded row dot
    a = _project(x, w)
    da = edge_reduce_bwd(idx, a, amax, amin, ct_max, ct_min, ct_sum,
                         ct_sumsq, k, exact=exact)
    dx = jnp.einsum("bno,co->bnc", da, w)
    dw = jnp.einsum("bnc,bno->co", x, da)
    return jnp.zeros_like(xg), dx, dw


_knn_edge_reduce_xw.defvjp(_ker_xw_fwd, _ker_xw_bwd)


def _edge_conv1_kernel(k, slope, select_dtype, q_ref, x_ref, xf_ref, xq_ref,
                       wn_ref, wc_ref, aff_ref, out_ref):
    """Whole single-conv EdgeConv stage in one program (eval): projections,
    kNN selection, max/min reduction, folded-BN affine + LeakyReLU epilogue.
    Inputs are the raw graph/features — the (B,N,Co) projections, the idx and
    the per-reduction tensors never touch HBM.

    Two selection modes, chosen per shape (measured, tools/ubench_stage.py):

    * project-first — select the projected features ``a = xf @ w_nbr`` (Co
      lanes).  Best when Co (+ v3's count lane) fits one 128-lane pass.
    * select-x — select the RAW input features (Cin lanes) and project each
      selected row afterwards with a tiny (TILE, Cin) x (Cin, Co) matmul.
      Mathematically identical (row selection commutes with a linear map);
      the big (TILE, N) x (N, ·) selection matmul shrinks from Co to Cin
      lanes, but every per-iteration extra op costs ~0.18 us fixed
      (~0.45 ms/call at k=20), so this only pays when it removes a whole
      128-lane selection pass or unlocks the v3 loop: DGCNNCls stage 3
      (64->128: v1 3.40 -> v3 3.13 ms) and stage 4 (128->256: two-pass v1
      4.64 -> one-pass 3.59 ms)."""
    n = x_ref.shape[1]
    cin = xf_ref.shape[2]
    co = wn_ref.shape[1]
    tile = q_ref.shape[1]

    exact = select_dtype == jnp.float32
    select_x, variant = select_x_plan(cin, co)
    if exact:
        variant = "v1"  # f32 selection = exact mode: torch tie order too
    variant = _extract_version(variant, ("v1", "v2", "v3"))

    xf = xf_ref[0]
    xq = xq_ref[0]
    if exact:
        xf = xf.astype(jnp.float32)
        xq = xq.astype(jnp.float32)
    scores = _scores(q_ref[0], x_ref[0], exact=exact)
    wn = wn_ref[:]
    # bf16 inter-stage inputs (AMP path): matmul weights in bf16 too
    wn_in = wn.astype(xf.dtype) if xf.dtype == jnp.bfloat16 else wn
    wc_in = (wc_ref[:].astype(xq.dtype) if xq.dtype == jnp.bfloat16
             else wc_ref[:])
    if select_x:
        payload = xf.astype(select_dtype)
    else:
        payload = jax.lax.dot_general(
            xf, wn_in,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(select_dtype)
    b = jax.lax.dot_general(
        xq, wc_in,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = aff_ref[0:1, :]
    t = aff_ref[1:2, :]

    init = (jnp.full((tile, co), -jnp.inf, jnp.float32),
            jnp.full((tile, co), jnp.inf, jnp.float32))

    def consume(st, sel, _):
        if select_x:
            sel = jax.lax.dot_general(
                sel, wn,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return jnp.maximum(st[0], sel), jnp.minimum(st[1], sel)

    def finalize(st, idx):
        # max over k of s*(a_j + b) + t == s*(s>0 ? max_j a : min_j a + b) + t
        sel = jnp.where(s > 0, st[0], st[1]) + b
        y = sel * s + t
        out_ref[0] = jnp.where(y >= 0, y, slope * y).astype(out_ref.dtype)

    _run_select(scores, k, n, (payload,), init, consume, finalize,
                onehot_dtype=select_dtype, variant=variant)


@functools.partial(
    jax.jit, static_argnames=("k", "slope", "select_dtype", "interpret")
)
def fused_edge_conv_eval(
    graph: jax.Array,
    x: jax.Array,
    w_nbr: jax.Array,
    w_ctr: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    k: int,
    slope: float = 0.2,
    *,
    select_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jax.Array:
    """Fully fused single-conv EdgeConv stage (inference): kNN + factorized
    conv + folded BN + LeakyReLU + max-over-k, one kernel, one (B,N,Co)
    output (reference models/dgcnn.py:80-103 stage semantics).

    Args:
      graph: (B, N, Cg) graph-defining features (the dynamic graph).
      x:     (B, N, Cin) features to convolve (usually == graph).
      w_nbr, w_ctr: (Cin, Co) factorized 1x1 conv weights.
      scale, bias: (Co,) folded BatchNorm affine (running stats).
    Returns:
      (B, N, Co) stage output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cg = graph.shape
    cin = x.shape[2]
    co = w_nbr.shape[1]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)

    aff = jnp.stack([scale, bias]).astype(jnp.float32)  # (2, Co)
    kernel = functools.partial(_edge_conv1_kernel, k, slope, select_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, cg), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cg), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cin), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cin), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, co), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        # AMP path: bf16 stage outputs (halves inter-stage HBM; the next
        # stage's bf16-input scores need only one matmul pass)
        out_shape=jax.ShapeDtypeStruct(
            (b, n, co),
            jnp.float32 if select_dtype == jnp.float32 else jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(graph, graph, x, x, w_nbr, w_ctr, aff)


def _knn_edge2_kernel(k, slope, q_ref, x_ref, a1_ref, b1_ref, w2_ref,
                      aff_ref, out_ref):
    """Two-conv EdgeConv block, fully fused (eval):
    max_j lrelu(s2 * (lrelu(s1*(a1[j]+b1[i]) + t1) @ w2) + t2).
    aff_ref rows: [s1; t1; s2pad; t2pad] with s2/t2 padded to C1 lanes."""
    n = x_ref.shape[1]
    c1 = a1_ref.shape[2]
    c2 = w2_ref.shape[1]
    tile = q_ref.shape[1]
    # eval-only kernel: AMP-style 3-pass scores unless exact mode is forced
    scores = _scores(q_ref[0], x_ref[0], exact=_train_exact())
    # Selection and the second conv stay f32: at every shape this kernel
    # serves, the per-iteration VPU extraction passes bound the loop and
    # the MXU matmuls hide under them (bf16 one-hot/payload/w2 measured
    # flat at semseg N=4096 and partseg posemb, r3) — so there is no
    # reason to buy approximation here.
    a1 = a1_ref[0]
    b1 = b1_ref[0]
    w2 = w2_ref[:]
    s1 = aff_ref[0:1, :c1]
    t1 = aff_ref[1:2, :c1]
    s2 = aff_ref[2:3, :c2]
    t2 = aff_ref[3:4, :c2]

    init = jnp.full((tile, c2), -jnp.inf, jnp.float32)

    def consume(st, sel, t):
        z1 = (sel + b1) * s1 + t1
        h1 = jnp.where(z1 >= 0, z1, slope * z1)
        z2 = jax.lax.dot_general(
            h1, w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s2 + t2
        h2 = jnp.where(z2 >= 0, z2, slope * z2)
        return jnp.maximum(st, h2)

    def finalize(st, idx):
        out_ref[0] = st.astype(out_ref.dtype)

    c1 = a1.shape[1]
    variant = _extract_version(
        "v1" if _train_exact() else ("v2" if c1 % 128 == 0 else "v3"),
        ("v1", "v2", "v3"))
    _run_select(scores, k, n, (a1,), init, consume, finalize,
                onehot_dtype=jnp.float32, variant=variant)


@functools.partial(jax.jit, static_argnames=("k", "slope", "interpret"))
def fused_knn_edge2(
    graph: jax.Array,
    a1: jax.Array,
    b1: jax.Array,
    s1: jax.Array,
    t1: jax.Array,
    w2: jax.Array,
    s2: jax.Array,
    t2: jax.Array,
    k: int,
    slope: float = 0.2,
    interpret: bool | None = None,
) -> jax.Array:
    """Fully fused two-conv EdgeConv block (the partseg/semseg stage shape:
    conv -> BN -> LeakyReLU -> conv -> BN -> LeakyReLU -> max over k,
    reference upstream DGCNN_partseg/semseg blocks) — eval mode with folded
    BN affines.  Neither the edge tensor nor the per-edge hidden (B, N, k, C1)
    ever exist.

    Args:
      graph: (B, N, Cg) graph-defining features.
      a1:    (B, N, C1) neighbour projection (x @ w1_nbr).
      b1:    (B, N, C1) centre projection (x @ w1_ctr).
      s1,t1: (C1,) folded BN1 affine.
      w2:    (C1, C2) second conv kernel.
      s2,t2: (C2,) folded BN2 affine.
    Returns:
      (B, N, C2) block output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, cg = graph.shape
    c1 = a1.shape[2]
    c2 = w2.shape[1]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)

    cw = max(c1, c2)
    aff = jnp.zeros((4, cw), jnp.float32)
    aff = aff.at[0, :c1].set(s1).at[1, :c1].set(t1)
    aff = aff.at[2, :c2].set(s2).at[3, :c2].set(t2)

    kernel = functools.partial(_knn_edge2_kernel, k, slope)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, cg), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cg), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cw), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c2), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        # AMP eval: bf16 stage outputs (see fused_edge_conv_eval)
        out_shape=jax.ShapeDtypeStruct(
            (b, n, c2),
            jnp.float32 if _train_exact() else jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(graph, graph, a1, b1, w2, aff)


def _pick_tile_scratch(n: int, k: int, c: int, budget=4 * 1024 * 1024) -> int:
    """Largest tile with (a) the (tile, N) working set ~2MB (bigger spills
    vector registers at N=4096 — observed 167MB of spill slots), (b) the
    (k, tile, c) f32 selection scratch within the VMEM budget, and (c) the
    UNROLLED k-loop's live (tile, N) temporaries within Mosaic's scoped-vmem
    stack: the bwd kernels unroll two k-loops whose per-iteration one-hots
    Mosaic stacks rather than reuses, so k*tile*N*4 must stay ~48MB or the
    kernel VMEM-OOMs at compile time (measured: 84MB fails at
    n=2048/k=40/tile=256 with a 96MB cap; 42MB compiles at every config)."""
    for cand in (512, 256, 128):
        if (n % cand == 0 and cand * n * 4 <= 2 * 1024 * 1024
                and k * cand * c * 4 <= budget
                and k * cand * n * 4 <= 48 * 1024 * 1024):
            return cand
    return TILE_N


def _edge2_train_kernel(k, slope, exact, idx_ref, a1_ref, b1_ref, aff_ref,
                        w2_ref,
                        max_ref, min_ref, sum_ref, sq_ref):
    """Training statistics of the virtual two-conv EdgeConv stage, driven by
    precomputed neighbour indices (compare-built one-hots — no extraction):
    z2[b,i,t] = lrelu(s1*(a1[idx]+b1)+t1) @ w2; outputs max/min/sum/sumsq of
    z2 over the k neighbours.  Neither per-edge tensor exists in HBM."""
    n = a1_ref.shape[1]
    c2 = w2_ref.shape[1]
    tile = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    a_parts = _parts(a1_ref[0], exact)
    b1 = b1_ref[0]
    s1 = aff_ref[0:1, :]
    t1 = aff_ref[1:2, :]
    w2 = w2_ref[:]
    idx = idx_ref[0]

    acc = {
        "mx": jnp.full((tile, c2), -jnp.inf, jnp.float32),
        "mn": jnp.full((tile, c2), jnp.inf, jnp.float32),
        "sm": jnp.zeros((tile, c2), jnp.float32),
        "sq": jnp.zeros((tile, c2), jnp.float32),
    }
    for t in range(k):
        onehot = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        sel = _onehot_dot(onehot, a_parts)
        z1 = (sel + b1) * s1 + t1
        h1 = jnp.where(z1 >= 0, z1, slope * z1)
        z2 = jax.lax.dot_general(
            h1, w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc["mx"] = jnp.maximum(acc["mx"], z2)
        acc["mn"] = jnp.minimum(acc["mn"], z2)
        acc["sm"] = acc["sm"] + z2
        acc["sq"] = acc["sq"] + jnp.square(z2)
    max_ref[0] = acc["mx"]
    min_ref[0] = acc["mn"]
    sum_ref[0] = acc["sm"]
    sq_ref[0] = acc["sq"]


@functools.partial(jax.jit,
                   static_argnames=("k", "slope", "exact", "interpret"))
def _edge2_fwd_call(a1, b1, s1, t1, w2, idx, k, slope, exact, interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c1 = a1.shape
    c2 = w2.shape[1]
    tile = _pick_tile(n)
    aff = jnp.stack([s1, t1]).astype(jnp.float32)
    out = jax.ShapeDtypeStruct((b, n, c2), jnp.float32)
    out_spec = pl.BlockSpec((1, tile, c2), lambda bi, ti: (bi, ti, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_edge2_train_kernel, k, slope, exact),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(out,) * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(idx, a1, b1, aff, w2)


def _edge2_bwd_kernel(k, slope, exact, idx_ref, a1_ref, b1_ref, aff_ref,
                      w2_ref,
                      mx_ref, mn_ref, ctmx_ref, ctmn_ref, ctsm_ref, ctsq_ref,
                      da1_ref, db1_ref, dw2_ref, daff_ref, sel_scr):
    """Backward of _edge2_train_kernel: recompute per-edge values from the
    saved indices/selection scratch, split max/min cotangents evenly among
    ties, backprop through conv2 and the BN1 affine, scatter into da1 via
    transposed one-hots.  dw2/daff accumulate across the whole grid."""
    from jax.experimental import pallas as pl

    n = a1_ref.shape[1]
    c1 = a1_ref.shape[2]
    c2 = w2_ref.shape[1]
    tile = idx_ref.shape[1]
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    a_parts = _parts(a1_ref[0], exact)
    b1 = b1_ref[0]
    s1 = aff_ref[0:1, :]
    t1 = aff_ref[1:2, :]
    w2 = w2_ref[:]
    idx = idx_ref[0]
    mx = mx_ref[0]
    mn = mn_ref[0]

    # pass 1: selections + z2 tie counts
    cmax = jnp.zeros((tile, c2), jnp.float32)
    cmin = jnp.zeros((tile, c2), jnp.float32)
    for t in range(k):
        onehot = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        sel = _onehot_dot(onehot, a_parts)
        sel_scr[t] = sel
        z1 = (sel + b1) * s1 + t1
        h1 = jnp.where(z1 >= 0, z1, slope * z1)
        z2 = jax.lax.dot_general(
            h1, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cmax = cmax + (z2 == mx).astype(jnp.float32)
        cmin = cmin + (z2 == mn).astype(jnp.float32)

    gmax = ctmx_ref[0] / cmax
    gmin = ctmn_ref[0] / cmin
    gsum = ctsm_ref[0]
    gsq2 = 2.0 * ctsq_ref[0]

    @pl.when(jnp.logical_and(bi == 0, ti == 0))
    def _():
        dw2_ref[...] = jnp.zeros((c1, c2), jnp.float32)
        daff_ref[...] = jnp.zeros((2, c1), jnp.float32)

    @pl.when(ti == 0)
    def _():
        da1_ref[0] = jnp.zeros((n, c1), jnp.float32)

    db1 = jnp.zeros((tile, c1), jnp.float32)
    ds1 = jnp.zeros((1, c1), jnp.float32)
    dt1 = jnp.zeros((1, c1), jnp.float32)
    # pass 2: per-edge cotangents
    for t in range(k):
        sel = sel_scr[t]
        selb = sel + b1
        z1 = selb * s1 + t1
        h1 = jnp.where(z1 >= 0, z1, slope * z1)
        z2 = jax.lax.dot_general(
            h1, w2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz2 = (jnp.where(z2 == mx, gmax, 0.0)
               + jnp.where(z2 == mn, gmin, 0.0)
               + gsum + z2 * gsq2)
        dh1 = jax.lax.dot_general(
            dz2, w2, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw2_ref[...] = dw2_ref[...] + jax.lax.dot_general(
            h1, dz2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz1 = dh1 * jnp.where(z1 >= 0, 1.0, slope)
        ds1 = ds1 + jnp.sum(dz1 * selb, axis=0, keepdims=True)
        dt1 = dt1 + jnp.sum(dz1, axis=0, keepdims=True)
        dsel = dz1 * s1
        db1 = db1 + dsel
        onehot = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        da1_ref[0] = da1_ref[0] + _onehot_dot(
            onehot, _parts(dsel, exact), dims=(((0,), (0,)), ((), ())))
    db1_ref[0] = db1
    daff_ref[...] = daff_ref[...] + jnp.concatenate([ds1, dt1], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("k", "slope", "exact", "interpret"))
def _edge2_bwd_call(a1, b1, s1, t1, w2, idx, mx, mn,
                    ct_mx, ct_mn, ct_sm, ct_sq, k, slope, exact,
                    interpret=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c1 = a1.shape
    c2 = w2.shape[1]
    tile = _pick_tile_scratch(n, k, c1)
    aff = jnp.stack([s1, t1]).astype(jnp.float32)
    spec_c1 = pl.BlockSpec((1, tile, c1), lambda bi, ti: (bi, ti, 0),
                           memory_space=pltpu.VMEM)
    spec_c2 = pl.BlockSpec((1, tile, c2), lambda bi, ti: (bi, ti, 0),
                           memory_space=pltpu.VMEM)
    da1, db1, dw2, daff = pl.pallas_call(
        functools.partial(_edge2_bwd_kernel, k, slope, exact),
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_c1,
            pl.BlockSpec((2, c1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            spec_c2, spec_c2, spec_c2, spec_c2, spec_c2, spec_c2,
        ],
        out_specs=(
            pl.BlockSpec((1, n, c1), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_c1,
            pl.BlockSpec((c1, c2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, c1), jnp.float32),
            jax.ShapeDtypeStruct((c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((2, c1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((k, tile, c1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(idx, a1, b1, aff, w2, mx, mn, ct_mx, ct_mn, ct_sm, ct_sq)
    return da1, db1, daff[0], daff[1], dw2


def edge2_reduce(a1, b1, s1, t1, w2, idx, k: int, slope: float):
    """Public wrapper: precision follows _train_exact() (bf16 AMP-style by
    default, exact f32 under DGCNN_TPU_PALLAS_EXACT=1)."""
    return _edge2_reduce(a1, b1, s1, t1, w2, idx, k, slope, _train_exact())


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _edge2_reduce(a1, b1, s1, t1, w2, idx, k: int, slope: float,
                  exact: bool):
    """Differentiable fused two-conv EdgeConv training statistics.

    Given neighbour indices (from ``knn_edge_reduce``), computes the
    max/min/sum/sumsq over the k neighbours of the virtual second-conv
    pre-activation ``z2 = lrelu(s1*(a1[idx]+b1)+t1) @ w2`` — the training
    counterpart of ``fused_knn_edge2`` (reference upstream partseg/semseg
    blocks, README.md:236).  The per-edge (B,N,k,C) tensors never exist.

    Returns (max2, min2, sum2, sumsq2), each (B, N, C2).
    """
    return _edge2_fwd_call(a1, b1, s1, t1, w2, idx, k, slope, exact)


def _edge2_fwd(a1, b1, s1, t1, w2, idx, k, slope, exact):
    out = _edge2_fwd_call(a1, b1, s1, t1, w2, idx, k, slope, exact)
    mx, mn = out[0], out[1]
    return out, (a1, b1, s1, t1, w2, idx, mx, mn)


def _edge2_bwd(k, slope, exact, res, cts):
    import numpy as np

    a1, b1, s1, t1, w2, idx, mx, mn = res
    ct_mx, ct_mn, ct_sm, ct_sq = cts
    da1, db1, ds1, dt1, dw2 = _edge2_bwd_call(
        a1, b1, s1, t1, w2, idx, mx, mn, ct_mx, ct_mn, ct_sm, ct_sq,
        k, slope, exact)
    didx = np.zeros(idx.shape, jax.dtypes.float0)
    return da1, db1, ds1, dt1, dw2, didx


_edge2_reduce.defvjp(_edge2_fwd, _edge2_bwd)


def _edge_sum_kernel(k, exact, idx_ref, a_ref, out_ref):
    """Sum of ``a`` rows over precomputed neighbour indices — no extraction
    loop and no HBM gather.  Because the reduction is a pure SUM, the k
    one-hots collapse into one MULTI-hot mask (k VPU compare-adds, counts
    <= k exact in bf16) and the whole neighbourhood sum is a single
    (TILE, N) x (N, Co) matmul; with the exact 3-way split concatenated
    along lanes (hi|mid|lo <= 128 lanes for Co <= 42) that one matmul stays
    pad-free.  ~6x cheaper than k separate selection matmuls at the HOG
    shape (N=2048, k=32, Co=18)."""
    n = a_ref.shape[1]
    tile = idx_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    parts = _parts(a_ref[0], exact)
    idx = idx_ref[0]
    mh = None
    for t in range(k):
        oh = (col == idx[:, t:t + 1]).astype(jnp.bfloat16)
        mh = oh if mh is None else mh + oh
    out_ref[0] = _onehot_dot(mh, parts)


@functools.partial(jax.jit, static_argnames=("k", "exact", "interpret"))
def edge_sum_reduce(
    a: jax.Array,
    idx: jax.Array,
    k: int,
    *,
    exact: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Per-neighbourhood sums of ``a`` over saved kNN indices.

    Args:
      a: (B, N, Co) per-point features.
      idx: (B, N, k) int32 neighbour indices (duplicates allowed — each
        occurrence contributes, like the reference's gathered sum).
      exact: f32-exact selection via the 3-way bf16 split (default — the
        HOG consumer feeds covariance cancellation); False = single-pass
        bf16.
    Returns:
      (B, N, Co) float32 sums.  Non-differentiable (use with detached
      consumers, e.g. ops/hog.py — the reference computes HOG on host
      numpy, i.e. detached).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, co = a.shape
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)
    kernel = functools.partial(_edge_sum_kernel, k, exact)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(idx, a)


def _knn_sum_kernel(k, idx_variant, q_ref, x_ref, a_ref, idx_ref, asum_ref):
    """kNN extraction + neighbourhood SUM of ``a`` in one kernel, with the
    sum as ONE multi-hot matmul instead of k per-iteration selection
    passes (the _knn_reduce_kernel cost HOG was paying for max/min state
    it never used).  The packed-v2 walk already rewrites each selected key
    to INT32_MIN; rewriting on the FINAL iteration too makes the multi-hot
    a single end-of-loop compare — real keys sit strictly above INT32_MIN
    (_pack_keys layout), so the compare is exact.  Scores stay HIGHEST-
    precision f32 and the sum uses the exact 3-way split (hi|mid|lo
    concatenated within one 128-lane pass for Co <= 42) — the HOG
    covariance-cancellation contract of fused_knn_reduce(select_dtype=f32).
    """
    n = x_ref.shape[1]
    scores = _scores(q_ref[0], x_ref[0], exact=True)
    if idx_variant == "v1":
        # exact torch member order (DGCNN_TPU_PALLAS_EXACT): v1 walk,
        # multi-hot accumulated per iteration like _edge_sum_kernel
        box = {"mh": jnp.zeros(scores.shape, jnp.bfloat16)}

        def payload(onehot, t):
            box["mh"] = box["mh"] + onehot.astype(jnp.bfloat16)

        idx_ref[0] = _extract_loop_v1(scores, k, n, payload,
                                      onehot_dtype=jnp.bfloat16)
        mh = box["mh"]
    else:
        mask = jnp.int32(2 ** _index_bits(n) - 1)
        sentinel = jnp.iinfo(jnp.int32).min
        keys = _pack_keys(scores, n)
        idx_cols = []
        for t in range(k):
            m = jnp.max(keys, axis=1, keepdims=True)
            idx_cols.append(jnp.int32(n - 1) - (m & mask))
            keys = jnp.where(keys == m, sentinel, keys)
        idx_ref[0] = jnp.concatenate(idx_cols, axis=1)
        mh = (keys == sentinel).astype(jnp.bfloat16)
    asum_ref[0] = _onehot_dot(mh, _split3(a_ref[0]))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def fused_knn_sum(
    x: jax.Array,
    a: jax.Array,
    k: int,
    *,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused kNN + per-neighbourhood f32-exact SUM of ``a``.

    The sum-only sibling of :func:`fused_knn_reduce` (see _knn_sum_kernel):
    same idx contract (self first, torch tie order — v1 member-exact under
    DGCNN_TPU_PALLAS_EXACT, packed v2 otherwise) and the same f32-exact
    sum values, at one multi-hot matmul instead of k selection passes.
    Returns (idx (B, N, k) int32, asum (B, N, Co) float32).
    Non-differentiable (detached consumers only, e.g. ops/hog.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    co = a.shape[2]
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)
    kernel = functools.partial(_knn_sum_kernel, k,
                               _extract_version("v2", ("v1", "v2")))
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, co), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, co), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, k), jnp.int32),
            jax.ShapeDtypeStruct((b, n, co), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(x, x, a)


def _knn_only_kernel(k, q_ref, x_ref, idx_ref):
    # the drop-in knn() contract stays torch-exact by default (HIGHEST
    # scores + v1); DGCNN_TPU_EXTRACT=v2 opts into the packed loop
    n = x_ref.shape[1]
    scores = _scores(q_ref[0], x_ref[0])
    _run_select(scores, k, n, (), None, None,
                lambda st, idx: idx_ref.__setitem__(0, idx),
                onehot_dtype=jnp.float32,
                variant=_extract_version("v1", ("v1", "v2")))


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(x: jax.Array, k: int, *, interpret: bool | None = None) -> jax.Array:
    """Drop-in for ops.knn.knn backed by the fused Pallas extraction."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    assert _supported(n), f"N={n} must be a multiple of {TILE_N}"
    tile = _pick_tile(n)
    kernel = functools.partial(_knn_only_kernel, k)
    return pl.pallas_call(
        kernel,
        grid=(b, n // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(x, x)
