"""Fixed-shape batching for XLA (SURVEY.md §7 layer 3).

torch DataLoader semantics (shuffle, drop_last) with one crucial difference:
XLA requires static shapes, so the last partial eval batch is padded up to
``batch_size`` and accompanied by a validity mask instead of being emitted
ragged (the reference uses drop_last=False ragged batches — main_cls.py:48).

``device_prefetch`` overlaps host batch assembly with device compute by
keeping one batch in flight.
"""
from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


class Batch(dict):
    """A dict of arrays plus a ``mask`` (B,) marking real (non-pad) rows."""

    @property
    def mask(self) -> np.ndarray:
        return self["mask"]


class NumpyLoader:
    """Minimal deterministic loader over an indexable dataset returning
    tuples of arrays.

    Args:
      dataset: indexable with __len__; items are tuples of numpy arrays.
      names: field names for the tuple elements.
      batch_size, shuffle, drop_last: torch semantics.
      pad_final: when not dropping, pad the final batch to batch_size by
        repeating row 0 and mask the padding out.
      seed: shuffle seed; combined with ``set_epoch`` for reshuffling
        (DistributedSampler.set_epoch analogue, reference
        main_partseg_dist.py:228-229).
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
    ):
        self.dataset = dataset
        self.names = list(names)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idxs = order[start : start + self.batch_size]
            real = len(idxs)
            if real < self.batch_size:
                if not self.pad_final:
                    continue
                idxs = np.concatenate(
                    [idxs, np.full(self.batch_size - real, idxs[0] if real else 0)]
                )
            rows = [self.dataset[int(i)] for i in idxs]
            batch = Batch()
            for j, name in enumerate(self.names):
                batch[name] = np.stack([np.asarray(r[j]) for r in rows])
            mask = np.zeros(self.batch_size, dtype=bool)
            mask[:real] = True
            batch["mask"] = mask
            yield batch


def device_prefetch(it: Iterator[Batch], size: int = 2) -> Iterator[Batch]:
    """Software pipeline: keep ``size`` host batches queued ahead of compute.
    (jax transfers are async; queuing batches overlaps H2D with the step.)

    ``mask`` stays a host numpy array: every consumer uses it for host-side
    bookkeeping (row counts, metric masking), and transferring it would turn
    each ``np.asarray(batch["mask"])`` into a blocking device readback.
    """
    import collections

    import jax

    queue: collections.deque = collections.deque()
    it = iter(it)

    def enqueue(k: int) -> None:
        for _ in range(k):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(
                {k2: (v if k2 == "mask" else jax.device_put(v))
                 for k2, v in batch.items()}
            )

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
