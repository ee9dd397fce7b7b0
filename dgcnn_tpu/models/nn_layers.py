"""Building-block flax.linen layers with torch-compatible semantics.

Everything is channels-last.  A 1x1 Conv1d/Conv2d in the reference is a Dense
over the trailing feature axis here (same math, MXU-friendly layout).

BatchNorm follows torch exactly: eps 1e-5, running stats updated with
``(1-m)*old + m*batch`` (m=0.1), *unbiased* batch variance in the running
update but *biased* variance for normalization (torch.nn.BatchNorm semantics).
Cross-replica statistics (the reference's SyncBatchNorm,
main_partseg_dist.py:189) come for free under pjit/GSPMD because the batch
axis reduction is global; under shard_map pass ``axis_name`` for an explicit
pmean.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dgcnn_tpu.ops import edge_conv


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


class BatchNorm(nn.Module):
    """Torch-semantics batch normalization over all non-feature axes."""

    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_params: bool = False, push_stats=None):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        if return_params:
            # expose (scale, bias, running mean/var) for externally fused
            # consumers (ops/pallas_knn.fused_knn_edge2); x is a dummy that
            # only fixes the feature count
            return scale, bias, ra_mean.value, ra_var.value
        if push_stats is not None:
            # externally computed batch statistics (fused-kernel training
            # paths): cross-replica sync, running update, folded affine back
            mean, var, count = push_stats
            if self.axis_name is not None:
                e2 = jax.lax.pmean(var + jnp.square(mean), self.axis_name)
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jnp.maximum(e2 - jnp.square(mean), 0.0)
                count = count * jax.lax.psum(1, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                count = jnp.asarray(count, jnp.float32)
                unbiased = var * (count / jnp.maximum(count - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
            s = scale * jax.lax.rsqrt(var + self.eps)
            return s, bias - mean * s
        if train:
            # torch autocast always runs BatchNorm in f32 (it is on the
            # fp32 autocast list): with bf16 activations the batch moments
            # would otherwise round to bf16 and E[x^2]-E[x]^2 cancels
            # catastrophically.  f32 in, this is a no-op.
            x = jnp.asarray(x, jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            mean2 = jnp.mean(jnp.square(x), axis=axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # n is traced under shard_map (psum) — use jnp arithmetic
                n = jnp.asarray(n, jnp.float32)
                unbiased = var * (n / jnp.maximum(n - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class ConvBN(nn.Module):
    """Dense (1x1 conv) + BatchNorm + LeakyReLU — the reference's ubiquitous
    Conv{1,2}d/BN/LeakyReLU sandwich (e.g. models/dgcnn.py:54-78).

    ``dtype`` is the COMPUTE dtype of the Dense (params stay f32; BN and
    LeakyReLU always run f32) — bf16 on AMP eval paths mirrors torch's
    fp16 autocast, which runs convs in half precision and BatchNorm in
    f32 (reference main_partseg_dist.py:221)."""

    features: int
    negative_slope: float = 0.2
    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 return_params: bool = False, push_stats=None):
        # the identity-trick kernel readback (return_params) must not round
        # the kernel through the compute dtype — force f32 for that call
        dense = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=jnp.float32 if return_params else self.dtype,
                         name="conv")
        bn = BatchNorm(axis_name=self.axis_name, name="bn")
        if push_stats is not None:
            dummy = jnp.zeros((1, self.features), jnp.float32)
            return bn(dummy, push_stats=push_stats)
        if return_params:
            # kernel via the identity trick (Dense params aren't attribute-
            # accessible from the parent scope); x fixes the input width
            kernel = dense(jnp.eye(x.shape[-1], dtype=jnp.float32))
            dummy = jnp.zeros((1, self.features), jnp.float32)
            return (kernel,) + bn(dummy, return_params=True)
        x = dense(x)
        x = bn(x, train)
        return leaky_relu(x, self.negative_slope)


class EdgeConv(nn.Module):
    """Fused EdgeConv block: 1x1 conv over [neighbour, centre] edge features +
    BN + LeakyReLU + max over k (reference models/dgcnn.py:84-98), executed via
    the factorized kernels in ops/edge_conv.py (never materializes the edge
    tensor when ``pool=True``).

    Parameters ``w_nbr``/``w_ctr`` are the split halves of the reference
    Conv2d weight (concat order [neighbour, centre]).
    """

    features: int
    negative_slope: float = 0.2
    pool: bool = True  # max over k; False keeps per-edge output (B,N,k,Co)
    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        idx: Optional[jax.Array] = None,
        train: bool = False,
        *,
        graph: Optional[jax.Array] = None,
        k: Optional[int] = None,
        return_params: bool = False,
        push_stats=None,
    ):
        """Either pass precomputed neighbour ``idx`` (B, N, k), or pass the
        ``graph`` tensor + ``k`` and let the layer build the graph itself — on
        TPU in eval mode the latter runs the fully fused Pallas
        knn+select+reduce kernel (ops/pallas_knn.py): no top-k sort, no edge
        tensor, no HBM gather."""
        from dgcnn_tpu.ops.knn import knn, use_pallas

        in_feat = x.shape[-1]
        init = nn.initializers.lecun_normal()
        w_nbr = self.param("w_nbr", init, (in_feat, self.features))
        w_ctr = self.param("w_ctr", init, (in_feat, self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        if return_params:
            return (w_nbr, w_ctr, scale, bias, ra_mean.value, ra_var.value)

        def update_running(mean, var, count):
            if self.is_initializing():
                return
            if self.axis_name is not None:
                count = count * jax.lax.psum(1, self.axis_name)
            m = self.momentum
            count = jnp.asarray(count, jnp.float32)
            unbiased = var * (count / jnp.maximum(count - 1, 1))
            ra_mean.value = (1 - m) * ra_mean.value + m * mean
            ra_var.value = (1 - m) * ra_var.value + m * unbiased

        def cross_replica(mean, var):
            if self.axis_name is None:
                return mean, var
            e2 = jax.lax.pmean(var + jnp.square(mean), self.axis_name)
            mean = jax.lax.pmean(mean, self.axis_name)
            return mean, jnp.maximum(e2 - jnp.square(mean), 0.0)

        if push_stats is not None:
            # externally computed virtual-edge batch statistics (fused
            # two-conv training path): sync, update running, return folded
            mean, var, count = push_stats
            mean, var = cross_replica(mean, var)
            update_running(mean, var, count)
            return edge_conv.fold_bn(scale, bias, mean, var, self.eps)

        if idx is None:
            assert graph is not None and k is not None, (
                "EdgeConv needs either idx or (graph, k)"
            )
            if self.pool and use_pallas(graph.shape[1]):
                # fully fused Pallas path (both train and eval)
                from dgcnn_tpu.ops.pallas_knn import (
                    knn_edge_reduce,
                    knn_edge_reduce_xw,
                )

                if train:
                    b = edge_conv._project(x, w_ctr)
                    cin, co = w_nbr.shape
                    if -(-cin // 128) < -(-co // 128):
                        # select-x: raw features need fewer selection lanes
                        # than the projection (e.g. the 128->256 stage)
                        _, amax, amin, asum, asumsq = knn_edge_reduce_xw(
                            graph, x, w_nbr, k)
                    else:
                        a = edge_conv._project(x, w_nbr)
                        _, amax, amin, asum, asumsq = knn_edge_reduce(
                            graph, a, k)
                    # BN stats of the virtual edge tensor from kernel sums
                    mean_ag = jnp.mean(asum, axis=(0, 1)) / k
                    mean = mean_ag + jnp.mean(b, axis=(0, 1))
                    e_ag2 = jnp.mean(asumsq, axis=(0, 1)) / k
                    e_ab = jnp.mean(asum / k * b, axis=(0, 1))
                    e_b2 = jnp.mean(jnp.square(b), axis=(0, 1))
                    var = jnp.maximum(
                        e_ag2 + 2 * e_ab + e_b2 - jnp.square(mean), 0.0
                    )
                    mean, var = cross_replica(mean, var)
                    update_running(mean, var, x.shape[0] * x.shape[1] * k)
                else:
                    # bf16 one-hot selection: exact selection, feature values
                    # bf16-rounded — immaterial for inference (argmax-stable).
                    # DGCNN_TPU_PALLAS_EXACT=1 forces f32 for parity checks.
                    import os as _os

                    from dgcnn_tpu.ops.pallas_knn import fused_edge_conv_eval

                    sel_dt = (jnp.float32
                              if _os.environ.get("DGCNN_TPU_PALLAS_EXACT")
                              else jnp.bfloat16)
                    s, t = edge_conv.fold_bn(
                        scale, bias, ra_mean.value, ra_var.value, self.eps)
                    from dgcnn_tpu.ops.pallas_banded import (
                        banded_applicable,
                        banded_edge_conv_eval,
                        fast_extract_band,
                    )

                    band = fast_extract_band()
                    if banded_applicable(graph.shape[1], band):
                        # gated approximate fast path (--fast_extract);
                        # see ops/pallas_banded.py
                        return banded_edge_conv_eval(
                            graph, x, w_nbr, w_ctr, s, t, k, band,
                            self.negative_slope, select_dtype=sel_dt)
                    # whole stage in one kernel: projections, selection,
                    # reduction, BN affine + LeakyReLU epilogue
                    return fused_edge_conv_eval(
                        graph, x, w_nbr, w_ctr, s, t, k,
                        self.negative_slope, select_dtype=sel_dt)
                s, t = edge_conv.fold_bn(scale, bias, mean, var, self.eps)
                sel = jnp.where(s > 0, amax, amin) + b
                return leaky_relu(sel * s + t, self.negative_slope)
            idx = knn(graph, k)

        if train:
            mean, var = edge_conv.edge_conv_batch_stats(x, idx, w_nbr, w_ctr)
            mean, var = cross_replica(mean, var)
            update_running(mean, var, x.shape[0] * x.shape[1] * idx.shape[-1])
        else:
            mean, var = ra_mean.value, ra_var.value

        s, t = edge_conv.fold_bn(scale, bias, mean, var, self.eps)
        if self.pool:
            return edge_conv.edge_conv_fused(
                x, idx, w_nbr, w_ctr, s, t, self.negative_slope
            )
        z = edge_conv.edge_linear(x, idx, w_nbr, w_ctr)
        y = z * s + t
        return leaky_relu(y, self.negative_slope)


class DenseBNReLU(nn.Module):
    """Linear + BatchNorm1d + LeakyReLU for (B, C) activations
    (reference models/layers.py:28-35)."""

    features: int
    negative_slope: float = 0.2
    use_bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, use_bias=self.use_bias, name="linear")(x)
        x = BatchNorm(axis_name=self.axis_name, name="bn")(x, train)
        return leaky_relu(x, self.negative_slope)
