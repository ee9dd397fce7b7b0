"""Label-smoothing cross entropy (reference loss.py:4-21, which replaces the
upstream ``util.cal_loss`` that main_cls.py:28 imports — SURVEY.md caveat)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jax.Array, labels: jax.Array, smoothing: bool = True, eps: float = 0.2
) -> jax.Array:
    """Mean cross entropy with optional label smoothing.

    Args:
      logits: (..., n_class).
      labels: (...) integer class ids.
    Semantics match the reference: smoothed target is ``1-eps`` on the gold
    class and ``eps/(n_class-1)`` elsewhere; loss is the mean over all
    examples of the negative smoothed-target log-softmax sum.
    """
    n_class = logits.shape[-1]
    logits2d = logits.reshape(-1, n_class)
    gold = labels.reshape(-1)
    log_prb = jax.nn.log_softmax(logits2d, axis=-1)
    if smoothing:
        one_hot = jax.nn.one_hot(gold, n_class, dtype=logits2d.dtype)
        target = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
        return -jnp.mean(jnp.sum(target * log_prb, axis=-1))
    return -jnp.mean(jnp.take_along_axis(log_prb, gold[:, None], axis=-1))


def cross_entropy_per_example(
    logits: jax.Array, labels: jax.Array, smoothing: bool = True,
    eps: float = 0.2,
) -> jax.Array:
    """Per-leading-example cross entropy: (B, ..., C) -> (B,), averaging any
    middle axes (per-point seg losses), same smoothing semantics as
    ``cross_entropy``.  Used to mask padded eval rows out of the mean."""
    n_class = logits.shape[-1]
    log_prb = jax.nn.log_softmax(logits, axis=-1)
    if smoothing:
        one_hot = jax.nn.one_hot(labels, n_class, dtype=logits.dtype)
        target = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
        ce = -jnp.sum(target * log_prb, axis=-1)
    else:
        ce = -jnp.take_along_axis(log_prb, labels[..., None], axis=-1)[..., 0]
    mid = tuple(range(1, ce.ndim))
    return jnp.mean(ce, axis=mid) if mid else ce


def masked_mean_loss(per_example: jax.Array, mask) -> jax.Array:
    """Mean over real (mask=True) rows; plain mean when mask is None."""
    if mask is None:
        return jnp.mean(per_example)
    m = mask.astype(per_example.dtype)
    return jnp.sum(per_example * m) / jnp.maximum(jnp.sum(m), 1.0)
