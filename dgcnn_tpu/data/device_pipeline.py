"""Fully jit-able on-device input pipeline (BASELINE.json's north star —
"a jit-able input pipeline feeding device arrays" — taken literally).

The host pipeline (data/pipeline.py) assembles batches in numpy and ships
them per batch; on hosts with slow interconnect (or 1 CPU core) the per-
batch H2D hop bounds epoch throughput far below the chip's model rate.
ModelNet40-scale datasets fit in HBM outright (train: 9840 x 2048 x 3 f32
= 242 MB), so the TPU-native shape is: ship the RAW dataset to the device
ONCE, then run per-epoch shuffling, batch gathering, augmentation, and
every optimizer step inside a single ``lax.scan`` — zero host round-trips
per epoch, one metrics readback at the end.

Augmentation matches the reference's distributions (scale U(2/3, 3/2),
shift U(-0.2, 0.2), point shuffle — /root/reference/data.py:258-276 via
data/augment.py) but draws from the JAX RNG stream: batches differ from
the host loader's stream sample-by-sample while remaining deterministic
in (seed, epoch) and identical in distribution.  The host pipeline stays
the default; ``--device_pipeline=True`` opts in (cli/cls.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def device_translate_shuffle(key: jax.Array, pts: jax.Array) -> jax.Array:
    """Jittable ModelNet40 train augmentation: per-sample xyz scale
    U(2/3, 3/2), per-sample xyz shift U(-0.2, 0.2), and per-sample point
    reordering (argsort of uniform keys = a uniform permutation)."""
    b, n, _ = pts.shape
    ks, kt, kp = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (b, 1, 3), minval=2.0 / 3.0,
                               maxval=3.0 / 2.0)
    shift = jax.random.uniform(kt, (b, 1, 3), minval=-0.2, maxval=0.2)
    pts = pts * scale + shift
    perm = jnp.argsort(jax.random.uniform(kp, (b, n)), axis=1)
    return jnp.take_along_axis(pts, perm[..., None], axis=1)


def resident_train_epoch_fn(train_step, augment=device_translate_shuffle):
    """Build a jitted whole-epoch trainer over a device-resident dataset.

    ``train_step(state, points, labels, rng) -> (state, metrics)`` is the
    engine step (train/engine.py make_cls_steps).  Returns
    ``epoch(state, data, labels, key, batch_size)`` where ``data`` is the
    raw (M, N, C) device array and ``labels`` (M,); each call shuffles the
    sample order (drop-last, like the train loader), gathers + augments
    each batch on device, and folds ``train_step`` over all batches with
    ``lax.scan``.  Returns ``(state, stacked_metrics)`` with
    ``stacked_metrics['labels']`` carrying each batch's labels so epoch
    accuracy needs no second gather.  Hold on to the returned function —
    it owns the jit cache.
    """

    @functools.partial(jax.jit, static_argnames=("batch_size",),
                       donate_argnums=(0,))
    def epoch(state, data, labels, key, batch_size):
        m = data.shape[0]
        nb = m // batch_size
        order = jax.random.permutation(jax.random.fold_in(key, 0), m)
        order = order[: nb * batch_size].reshape(nb, batch_size)

        def body(st, inp):
            idxs, i = inp
            pts = jnp.take(data, idxs, axis=0)
            if augment is not None:
                pts = augment(jax.random.fold_in(key, 1 + i), pts)
            lbl = jnp.take(labels, idxs, axis=0)
            st, met = train_step(st, pts, lbl, key)
            met["labels"] = lbl
            return st, met

        return jax.lax.scan(body, state, (order, jnp.arange(nb)))

    return epoch


def dataset_to_device(ds, num_points: int):
    """One-time H2D of a raw in-memory h5 dataset (ModelNet40-style
    ``.data``/``.label`` arrays), pre-cut to ``num_points``.  Returns
    ``(data (M, num_points, C) f32, labels (M,) int32)`` device arrays."""
    import numpy as np

    data = jax.device_put(
        np.ascontiguousarray(ds.data[:, :num_points]).astype(np.float32))
    labels = jax.device_put(
        np.asarray(ds.label).reshape(-1).astype(np.int32))
    return data, labels
