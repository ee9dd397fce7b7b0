"""Fully jit-able on-device input pipeline (BASELINE.json's north star —
"a jit-able input pipeline feeding device arrays" — taken literally).

The host pipeline (data/pipeline.py) assembles batches in numpy and ships
them per batch; on hosts with slow interconnect (or 1 CPU core) the per-
batch H2D hop bounds epoch throughput far below the chip's model rate.
ModelNet40/ShapeNetPart-scale datasets fit in HBM outright (ModelNet40
train: 9840 x 2048 x 3 f32 = 242 MB), so the TPU-native shape is: ship
the RAW dataset to the device ONCE, then run per-epoch shuffling, batch
gathering, augmentation, and every optimizer step inside a single
``lax.scan`` — zero host round-trips per epoch, one metrics readback at
the end.

Augmentations mirror data/augment.py's distributions (reference
data.py:258-276 translate/jitter/rotate, 339-364 random-subset recipe)
but draw from the JAX RNG stream: batches differ from the host loader's
stream sample-by-sample while remaining deterministic in (seed, epoch)
and identical in distribution.  The host pipeline stays the default;
``--device_pipeline=True`` opts in (cli/cls.py, cli/partseg.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------- augments


def device_translate(key: jax.Array, pts: jax.Array,
                     apply: jax.Array | None = None) -> jax.Array:
    """Per-sample anisotropic xyz scale U(2/3, 3/2) + shift U(-0.2, 0.2)
    (augment.translate_batch).  ``apply`` (B,) bool gates per sample."""
    b = pts.shape[0]
    ks, kt = jax.random.split(key)
    scale = jax.random.uniform(ks, (b, 1, 3), minval=2.0 / 3.0,
                               maxval=3.0 / 2.0)
    shift = jax.random.uniform(kt, (b, 1, 3), minval=-0.2, maxval=0.2)
    if apply is not None:
        sel = apply[:, None, None]
        scale = jnp.where(sel, scale, 1.0)
        shift = jnp.where(sel, shift, 0.0)
    return pts * scale + shift


def device_jitter(key: jax.Array, pts: jax.Array, sigma: float = 0.01,
                  clip: float = 0.02,
                  apply: jax.Array | None = None) -> jax.Array:
    """Clipped gaussian jitter (augment.jitter_batch)."""
    noise = jnp.clip(sigma * jax.random.normal(key, pts.shape), -clip, clip)
    if apply is not None:
        noise = noise * apply[:, None, None]
    return pts + noise


def device_rotate_xz(key: jax.Array, pts: jax.Array,
                     apply: jax.Array | None = None) -> jax.Array:
    """Per-sample x-z-plane rotation with gaussian angle theta=2*pi*randn
    (augment.rotate_batch keeps the reference's gaussian draw)."""
    b = pts.shape[0]
    theta = 2.0 * jnp.pi * jax.random.normal(key, (b,))
    if apply is not None:
        theta = jnp.where(apply, theta, 0.0)
    c, s = jnp.cos(theta)[:, None], jnp.sin(theta)[:, None]
    x, z = pts[..., 0], pts[..., 2]
    return pts.at[..., 0].set(x * c + z * s).at[..., 2].set(-x * s + z * c)


def device_shuffle_points(key: jax.Array, pts: jax.Array,
                          seg: jax.Array | None = None):
    """Per-sample point reordering (argsort of uniform keys = a uniform
    permutation); ``seg`` labels follow the same permutation."""
    b, n = pts.shape[:2]
    perm = jnp.argsort(jax.random.uniform(key, (b, n)), axis=1)
    out = jnp.take_along_axis(pts, perm[..., None], axis=1)
    if seg is None:
        return out
    return out, jnp.take_along_axis(seg, perm, axis=1)


def augment_cls(key: jax.Array, batch: dict) -> dict:
    """ModelNet40 train recipe: translate + point shuffle
    (data/augment.py <- reference data.py:284-291)."""
    kt, kp = jax.random.split(key)
    pts = device_translate(kt, batch["points"])
    return {**batch, "points": device_shuffle_points(kp, pts)}


def augment_partseg_plain(key: jax.Array, batch: dict) -> dict:
    """ShapeNetPart trainval recipe: point shuffle only, seg follows
    (datasets.ShapeNetPart.__getitem__ <- reference data.py:330-333)."""
    pts, seg = device_shuffle_points(key, batch["points"], batch["seg"])
    return {**batch, "points": pts, "seg": seg}


def augment_partseg_augmented(key: jax.Array, batch: dict) -> dict:
    """ShapeNetPartAugmented train recipe: per sample, a random ORDER of
    {translate, jitter, rotate} with an independent on/off choice each —
    3 slots x 3 masked whole-batch ops, exactly the vectorized host form
    (datasets.ShapeNetPartAugmented.batch <- reference data.py:352-357)."""
    pts = batch["points"]
    b = pts.shape[0]
    ko, kc, *kf = jax.random.split(key, 2 + 9)
    order = jnp.argsort(jax.random.uniform(ko, (b, 3)), axis=1)
    choices = jax.random.bernoulli(kc, 0.5, (b, 3))
    fns = (device_translate, device_jitter, device_rotate_xz)
    for slot in range(3):
        for f in range(3):
            apply = (order[:, slot] == f) & choices[:, f]
            pts = fns[f](kf[slot * 3 + f], pts, apply=apply)
    return {**batch, "points": pts}


# ------------------------------------------------------------ epoch runner


def resident_train_epoch_fn(step_fn, augment=None, mesh=None):
    """Build a jitted whole-epoch trainer over a device-resident dataset.

    ``step_fn(state, batch, rng) -> (state, metrics)`` consumes one
    gathered batch dict; ``augment(key, batch) -> batch`` is a jittable
    per-batch augmentation (see augment_cls / augment_partseg_*).

    Returns ``epoch(state, arrays, key, batch_size)``: ``arrays`` is a
    dict of (M, ...) device arrays sharing the leading sample axis; each
    call shuffles the sample order (drop-last, like the train loaders),
    gathers + augments each batch on device, and folds ``step_fn`` over
    all batches with ``lax.scan``, returning ``(state, stacked_metrics)``.
    Hold on to the returned function — it owns the jit cache.

    ``mesh``: a 1-D data-parallel :class:`jax.sharding.Mesh`.  The dataset
    and state are replicated and each gathered batch is sharding-
    constrained on its leading axis, so GSPMD runs every step data-
    parallel with the gradient all-reduce and global-batch BN moments
    inserted automatically — the same semantics as the host-loader path's
    ``jit_data_parallel`` (parallel/data_parallel.py), now for whole
    epochs.  ``batch_size`` must divide the mesh size.
    """
    if mesh is not None:
        from dgcnn_tpu.parallel.mesh import batch_sharding, replicated

        data_sh = batch_sharding(mesh)
        repl = replicated(mesh)

    def _epoch(state, arrays, key, batch_size):
        m = next(iter(arrays.values())).shape[0]
        nb = m // batch_size
        if nb == 0:
            raise ValueError(
                f"resident epoch needs at least one full batch "
                f"({m} samples < batch_size {batch_size}); use the host "
                f"loader (which pads) for datasets this small")
        # disjoint streams: shuffle / per-batch augmentation / step rngs
        # (the step key is folded with state.step inside the engines)
        kshuf, kaug, kstep = jax.random.split(key, 3)
        order = jax.random.permutation(kshuf, m)
        order = order[: nb * batch_size].reshape(nb, batch_size)

        def body(st, inp):
            idxs, i = inp
            batch = {k: jnp.take(v, idxs, axis=0) for k, v in arrays.items()}
            if augment is not None:
                batch = augment(jax.random.fold_in(kaug, i), batch)
            if mesh is not None:  # data-parallel step over the mesh
                batch = {k: jax.lax.with_sharding_constraint(v, data_sh)
                         for k, v in batch.items()}
            return step_fn(st, batch, kstep)

        return jax.lax.scan(body, state, (order, jnp.arange(nb)))

    if mesh is None:
        return jax.jit(_epoch, static_argnames=("batch_size",),
                       donate_argnums=(0,))
    return jax.jit(_epoch, static_argnames=("batch_size",),
                   donate_argnums=(0,),
                   in_shardings=(repl, repl, repl))


def dataset_to_device(ds, num_points: int | None = None) -> dict:
    """One-time H2D of a raw in-memory h5 dataset (``.data`` plus whichever
    of ``.label``/``.seg`` it carries), pre-cut to ``num_points``.  Returns
    a dict of device arrays: ``points (M, n, C) f32`` and, when present,
    ``label (M,) int32`` / ``seg (M, n) int32``."""
    import numpy as np

    data = np.asarray(ds.data)
    seg = getattr(ds, "seg", None)
    label = getattr(ds, "label", None)
    if num_points is not None:
        data = data[:, :num_points]
        if seg is not None:
            seg = np.asarray(seg)[:, :num_points]
    out = {"points": jax.device_put(
        np.ascontiguousarray(data).astype(np.float32))}
    if label is not None:
        out["label"] = jax.device_put(
            np.asarray(label).reshape(-1).astype(np.int32))
    if seg is not None:
        out["seg"] = jax.device_put(
            np.ascontiguousarray(seg).astype(np.int32))
    return out
