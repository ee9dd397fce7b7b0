"""Production input pipeline (BASELINE.json north star: "a jit-able
tf.data/Grain-style input pipeline feeding device arrays").

The reference feeds its trainers with torch DataLoader worker processes
(main_cls.py:45-48, num_workers=8).  The TPU-native equivalent here is a
grain-style pipeline built from three independent levers:

1. **Vectorized batch assembly** — datasets expose ``batch(idxs, rng)``
   (data/datasets.py): ONE numpy fancy-index + whole-batch augmentation
   per batch instead of ``batch_size`` Python ``__getitem__`` calls and an
   ``np.stack``.  This is the big host-side win (an order of magnitude on
   this class of host — tools/ubench_loader.py) and needs no processes.
2. **Worker processes** — ``num_workers > 0`` forks workers that assemble
   batches in parallel (datasets are inherited copy-on-write; results
   stream back via an ordered imap).  On the vectorized ``batch()`` path
   (every shipped dataset) batch content is a pure function of
   (seed, epoch, batch_index), so outputs are IDENTICAL for any worker
   count — scheduling cannot perturb training.  The per-item fallback
   (datasets without ``batch()``) draws augmentation from the dataset's
   own rng, whose forked copies diverge with scheduling — use workers
   there only for un-augmented (eval) iteration.
3. **Device prefetch** — ``loader.device_iter()`` / ``device_prefetch``
   keeps a couple of batches in flight so H2D transfers overlap the step.

``PipelineLoader`` is a drop-in for ``NumpyLoader`` (same batch dict
contract: named fields + a ``mask`` of real rows, final-batch padding for
XLA's static shapes).  Eval batches (no augmentation) are bitwise
identical to NumpyLoader's; train batches share the sample ORDER but draw
augmentation randomness in whole-batch order (documented in
augment.py — same distributions).
"""
from __future__ import annotations

import multiprocessing
from typing import Iterator, Optional, Sequence

import numpy as np

from dgcnn_tpu.data.loader import Batch

# fork-inherited state for worker processes (set by _init_worker)
_WORKER_STATE: dict = {}


def _init_worker(loader) -> None:
    _WORKER_STATE["loader"] = loader


def _assemble(job) -> Batch:
    epoch, bi, idxs, real = job
    return _WORKER_STATE["loader"]._make_batch(epoch, bi, idxs, real)


class PipelineLoader:
    """Vectorized, optionally multi-process batch pipeline.

    Args:
      dataset: indexable; if it has a ``batch(idxs, rng)`` method the
        vectorized path is used, else falls back to per-item assembly.
      names: field names for the tuple ``batch()``/``__getitem__`` returns.
      batch_size / shuffle / drop_last / pad_final / seed: NumpyLoader
        semantics (torch DataLoader shuffle + static-shape padding).
      num_workers: 0 = assemble inline (vectorized — the right default for
        1-core hosts); N>0 = fork N workers, ordered streaming results.
    """

    def __init__(
        self,
        dataset,
        names: Sequence[str],
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_final: bool = True,
        seed: int = 0,
        num_workers: int = 0,
    ):
        self.dataset = dataset
        self.names = list(names)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.seed = seed
        self.num_workers = num_workers
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _jobs(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            # same scheme as NumpyLoader: identical sample order
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for bi, start in enumerate(range(0, stop, self.batch_size)):
            idxs = order[start:start + self.batch_size]
            real = len(idxs)
            if real < self.batch_size:
                if not self.pad_final:
                    continue
                idxs = np.concatenate(
                    [idxs,
                     np.full(self.batch_size - real, idxs[0] if real else 0)])
            yield self.epoch, bi, idxs, real

    def _make_batch(self, epoch: int, bi: int, idxs, real: int) -> Batch:
        # content is a pure function of (seed, epoch, batch index): any
        # worker can build any batch and the result is identical
        rng = np.random.default_rng((self.seed, epoch, bi))
        if hasattr(self.dataset, "batch"):
            arrays = self.dataset.batch(np.asarray(idxs), rng)
        else:  # per-item fallback (NumpyLoader assembly)
            rows = [self.dataset[int(i)] for i in idxs]
            arrays = tuple(
                np.stack([np.asarray(r[j]) for r in rows])
                for j in range(len(self.names)))
        batch = Batch()
        for name, arr in zip(self.names, arrays):
            batch[name] = np.ascontiguousarray(arr)
        mask = np.zeros(self.batch_size, dtype=bool)
        mask[:real] = True
        batch["mask"] = mask
        return batch

    def __iter__(self) -> Iterator[Batch]:
        if self.num_workers <= 0:
            for job in self._jobs():
                yield self._make_batch(*job)
            return
        if self._pool is None:
            ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                                  initargs=(self,))
        # ordered streaming map: up to num_workers batches in flight
        yield from self._pool.imap(_assemble, self._jobs())

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # best-effort worker cleanup
        try:
            self.close()
        except Exception:
            pass

    def device_iter(self, size: int = 2) -> Iterator[Batch]:
        """Iterate with ``size`` batches already transferred to device."""
        from dgcnn_tpu.data.loader import device_prefetch

        return device_prefetch(iter(self), size=size)

    def device_resident(self):
        """Assemble the WHOLE epoch host-side and ship it to the device once.

        Returns ``(arrays, mask)`` where each array is stacked to
        ``(num_batches, batch_size, ...)`` on device and ``mask`` is the
        matching host ``(num_batches, batch_size)`` bool of real rows.

        This is the TPU-native shape for small evaluation sets (ModelNet40
        test is ~30 MB): one H2D transfer for the epoch, then
        :func:`run_resident_epoch` scans the step over the leading axis
        entirely on device — no per-batch host round-trips at all.  The
        reference's per-batch DataLoader→cuda() hop
        (/root/reference/main_cls.py:45-48, :158-166) has no reason to
        exist on hardware where the whole set fits in HBM.
        """
        import jax
        import numpy as np

        stacked: dict = {}
        masks = []
        for batch in self:
            for name, arr in batch.items():
                if name == "mask":
                    masks.append(arr)
                else:
                    stacked.setdefault(name, []).append(arr)
        arrays = {
            name: jax.device_put(np.stack(parts))
            for name, parts in stacked.items()
        }
        return arrays, np.stack(masks)


def resident_epoch_fn(step_fn, mesh=None):
    """Build a jitted whole-epoch runner over a
    :meth:`PipelineLoader.device_resident` epoch.

    Returns ``epoch(arrays, *static_args)``: runs
    ``step_fn(batch_dict, *static_args)`` over every batch (each value
    ``(batch_size, ...)``) via ``lax.scan`` inside ONE jit, stacking the
    per-batch outputs to ``(num_batches, ...)`` device arrays — one XLA
    program per epoch, batches stream from HBM, nothing touches the host.
    Reuse the returned function across epochs: it owns the jit cache.

    ``mesh``: optional 1-D data-parallel mesh — each scanned batch is
    sharding-constrained on its leading (batch) axis so GSPMD runs the
    step data-parallel (see device_pipeline.resident_train_epoch_fn).
    """
    import jax

    if mesh is not None:
        from dgcnn_tpu.parallel.mesh import batch_sharding

        data_sh = batch_sharding(mesh)

    @jax.jit
    def epoch_impl(arrs, extra):
        names = sorted(arrs)

        def body(carry, sl):
            batch = dict(zip(names, sl))
            if mesh is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, data_sh)
                         for k, v in batch.items()}
            return carry, step_fn(batch, *extra)

        _, outs = jax.lax.scan(body, 0, tuple(arrs[n] for n in names))
        return outs

    return lambda arrays, *static_args: epoch_impl(arrays, static_args)


def run_resident_epoch(step_fn, arrays, *static_args):
    """One-shot convenience wrapper over :func:`resident_epoch_fn` (pays a
    re-trace per call — hold on to ``resident_epoch_fn(step_fn)`` in loops).
    """
    return resident_epoch_fn(step_fn)(arrays, *static_args)


def make_loader(dataset, names, batch_size, *, shuffle=False, drop_last=False,
                seed=0, num_workers: Optional[int] = None) -> PipelineLoader:
    """CLI helper: PipelineLoader with ``num_workers`` from the flag or the
    DGCNN_TPU_WORKERS env (default 0 — inline vectorized assembly)."""
    import os

    if num_workers is None:
        num_workers = int(os.environ.get("DGCNN_TPU_WORKERS", "0"))
    return PipelineLoader(dataset, names, batch_size, shuffle=shuffle,
                          drop_last=drop_last, seed=seed,
                          num_workers=num_workers)
