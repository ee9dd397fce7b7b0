"""Fused embedding-conv + global-pool Pallas kernel.

The classification head's ``conv5`` (reference model.py DGCNN_cls: 1x1 conv
512->emb_dims, BN, LeakyReLU) feeds ONLY two global reductions over the
point axis (adaptive max+avg pool, reference main path).  XLA materializes
the stage concat AND the (B, N, emb) activation to HBM around the matmul
(~10 MB/cloud at the headline config — ~0.6 GB/batch of pure glue traffic);
this kernel takes the EdgeConv stage outputs directly (no concat — each
input is matmul'd against its row slice of w and accumulated), applies the
folded-BN affine + LeakyReLU epilogue in VMEM, then max- and mean-pools
over N, writing only the (2, E) pooled rows per cloud.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dgcnn_tpu.ops.pallas_knn import _auto_interpret


def conv_pool_supported(n: int, c: int, e: int) -> bool:
    """Whether fused_conv_pool can serve this shape: the whole-N (N, Ci)
    slabs plus the (N, E) activation must fit the per-program VMEM budget.
    Model gates call this and fall back to the XLA concat+conv+pool path
    when it fails (e.g. very large N eval)."""
    return n * (c + e) * 4 <= 32 * 1024 * 1024


def _conv_pool_kernel(slope, compute_dtype, splits, with_mean, *refs):
    nx = len(splits)
    x_refs = refs[:nx]
    w_ref, aff_ref, out_ref = refs[nx], refs[nx + 1], refs[nx + 2]
    n = x_refs[0].shape[1]
    h = None
    off = 0
    for x_ref, c in zip(x_refs, splits):
        d = jax.lax.dot_general(
            x_ref[0].astype(compute_dtype),
            w_ref[off:off + c, :].astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = d if h is None else h + d
        off += c
    y = h * aff_ref[0:1, :] + aff_ref[1:2, :]
    y = jnp.where(y >= 0, y, slope * y)
    out_ref[0, 0:1] = jnp.max(y, axis=0, keepdims=True)
    if with_mean:
        out_ref[0, 1:2] = jnp.sum(y, axis=0, keepdims=True) / n


@functools.partial(
    jax.jit,
    static_argnames=("slope", "compute_dtype", "with_mean", "interpret"),
)
def fused_conv_pool(
    xs: tuple[jax.Array, ...],
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    slope: float = 0.2,
    *,
    compute_dtype=jnp.bfloat16,
    with_mean: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """LeakyReLU((concat(xs) @ w) * scale + bias) max+mean-pooled over N,
    without materializing the concat or the (B, N, E) activation.

    Args:
      xs: tuple of (B, N, Ci) features (the EdgeConv stage outputs; their
        channel concat is the virtual conv input, sum(Ci) == w rows).
      w: (C, E) 1x1 conv kernel; scale, bias: (E,) folded BatchNorm affine.
      compute_dtype: matmul operand dtype — bf16 matches XLA's default
        single-pass matmul precision on TPU; pass f32 for parity checks.
    Returns:
      (B, 2, E): row 0 = max over N, row 1 = mean over N (with_mean=False
      skips the mean — the partseg/semseg embedding pool is max-only).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xs = tuple(xs)
    b, n, _ = xs[0].shape
    splits = tuple(x.shape[2] for x in xs)
    c = sum(splits)
    e = w.shape[1]
    assert w.shape[0] == c, (w.shape, splits)
    # whole-N per program: the (N, Ci) slabs + (N, E) activation fit VMEM
    # (callers gate on conv_pool_supported and fall back to XLA otherwise)
    assert conv_pool_supported(n, c, e), (n, c, e)

    rows = 2 if with_mean else 1
    aff = jnp.stack([scale, bias]).astype(jnp.float32)  # (2, E)
    kernel = functools.partial(_conv_pool_kernel, slope, compute_dtype,
                               splits, with_mean)
    in_specs = [
        pl.BlockSpec((1, n, ci), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM)
        for ci in splits
    ] + [
        pl.BlockSpec((c, e), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, e), lambda bi: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, e), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, e), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_auto_interpret(interpret),
    )(*xs, w, aff)
