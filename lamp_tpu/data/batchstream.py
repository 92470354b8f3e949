"""Batch streams: host-side data pipelines feeding the device.

TPU-native replacement for the reference's ``BatchStream``
(lamp-data/src/main/scala/lamp/data/BatchStream.scala): pull-based streams of
batches with combinators and device prefetch. The cats-effect/Resource
machinery maps to plain Python iterators; the pinned-buffer ``toBatched``
staging copy (device.scala:62-114) maps to a background-thread
``device_put`` pipeline (XLA overlaps the host→HBM DMA with compute).

Streams yield pytrees of arrays with *fixed shapes* (jit-friendly): loaders
either drop the last ragged batch (the reference's dropLast,
BatchStream.scala:533) or pad it.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = [
    "BatchStream",
    "from_full_batch",
    "minibatches_from_full",
    "from_indices",
    "from_function",
    "staged_from_indices",
    "prefetch_to_device",
]


class BatchStream:
    """A restartable stream of batches: wraps a zero-arg factory returning an
    iterator. Combinators mirror the reference's
    (BatchStream.scala:96-399): ``map``, ``take``, ``concat``, ``every_nth``
    (rank sharding), ``repeat_or_take``, ``without_empty``, ``fold_left``,
    ``drain_to_list``.
    """

    def __init__(self, factory: Callable[[], Iterator], length: Optional[int] = None):
        self._factory = factory
        self.length = length

    def __iter__(self):
        return self._factory()

    def __len__(self):
        if self.length is None:
            raise TypeError("stream length unknown")
        return self.length

    # ---- combinators ----
    def map(self, fn) -> "BatchStream":
        return BatchStream(lambda: (fn(b) for b in self), self.length)

    def take(self, n: int) -> "BatchStream":
        def gen():
            for i, b in enumerate(self):
                if i >= n:
                    return
                yield b

        return BatchStream(gen, min(n, self.length) if self.length else n)

    def concat(self, other: "BatchStream") -> "BatchStream":
        def gen():
            yield from self
            yield from other

        length = (
            self.length + other.length
            if self.length is not None and other.length is not None
            else None
        )
        return BatchStream(gen, length)

    def every_nth(self, n: int, offset: int) -> "BatchStream":
        """Rank sharding (reference everyNth, used to split one stream across
        data-parallel workers)."""

        def gen():
            for i, b in enumerate(self):
                if i % n == offset:
                    yield b

        length = None if self.length is None else (self.length - offset + n - 1) // n
        return BatchStream(gen, length)

    def repeat_or_take(self, n: int) -> "BatchStream":
        """Cycle the stream until exactly n batches are produced
        (reference repeatOrTake — equalizes batch counts across ranks)."""

        def gen():
            produced = 0
            while produced < n:
                got = False
                for b in self:
                    got = True
                    yield b
                    produced += 1
                    if produced >= n:
                        return
                if not got:
                    return

        return BatchStream(gen, n)

    def without_empty(self) -> "BatchStream":
        """Drop empty batches (reference withoutEmptyBatches,
        BatchStream.scala:138). A batch is empty when its first leaf has a
        zero leading dimension."""

        def gen():
            import jax

            for b in self:
                leaves = jax.tree_util.tree_leaves(b)
                if leaves and hasattr(leaves[0], "shape") and \
                        leaves[0].shape[:1] == (0,):
                    continue
                yield b

        return BatchStream(gen, None)

    def fold_left(self, init, fn):
        acc = init
        for b in self:
            acc = fn(acc, b)
        return acc

    def drain_to_list(self):
        return list(self)


def from_full_batch(features, target, shuffle_key=None) -> BatchStream:
    """Single full batch per epoch (reference fromFullBatch,
    BatchStream.scala:595)."""

    def gen():
        yield (features, target)

    return BatchStream(gen, 1)


def minibatches_from_full(batch_size: int, features, target, *,
                          rng: Optional[np.random.Generator] = None,
                          drop_last: bool = True) -> BatchStream:
    """Shuffled index minibatches over in-memory arrays (reference
    minibatchesFromFull, BatchStream.scala:528-590)."""
    n = features.shape[0]

    def gen():
        # hoisted: np.asarray of a device array is a full device->host copy
        f_host = np.asarray(features)
        t_host = np.asarray(target)
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        end = n - (n % batch_size) if drop_last else n
        for s in range(0, end, batch_size):
            sel = idx[s:s + batch_size]
            yield (f_host[sel], t_host[sel])

    nb = n // batch_size if drop_last else (n + batch_size - 1) // batch_size
    return BatchStream(gen, nb)


def from_indices(index_batches: Sequence[Sequence[int]],
                 load: Callable[[np.ndarray], Any]) -> BatchStream:
    """Load batches by explicit index lists (reference fromIndices,
    BatchStream.scala:437)."""

    def gen():
        for sel in index_batches:
            yield load(np.asarray(sel))

    return BatchStream(gen, len(index_batches))


def from_function(num_batches: int, fn: Callable[[int], Any]) -> BatchStream:
    """Reference fromFunction (BatchStream.scala:480)."""

    def gen():
        for i in range(num_batches):
            yield fn(i)

    return BatchStream(gen, num_batches)


def staged_from_indices(bucket_indices: Sequence[Sequence[int]],
                        batches_per_bucket: int,
                        load_bucket: Callable[[np.ndarray], Any],
                        slice_batch: Callable[[Any, np.ndarray], Any], *,
                        rng: Optional[np.random.Generator] = None) -> BatchStream:
    """Two-stage bucket loader: load a large bucket (e.g. from disk), then cut
    it into shuffled minibatches, opening the next bucket ahead on a
    background thread.

    Reference: the staged loader BatchStream.stagedFromIndices
    (BatchStream.scala:605-854) with its async open-ahead of the next bucket.
    """

    def gen():
        pool: queue.Queue = queue.Queue(maxsize=1)

        def loader():
            for bidx in bucket_indices:
                pool.put(load_bucket(np.asarray(bidx)))
            pool.put(None)

        t = threading.Thread(target=loader, daemon=True)
        t.start()
        while True:
            bucket = pool.get()
            if bucket is None:
                return
            size = len(bucket[0]) if isinstance(bucket, tuple) else len(bucket)
            order = np.arange(size)
            if rng is not None:
                rng.shuffle(order)
            per = size // batches_per_bucket
            for i in range(batches_per_bucket):
                sel = order[i * per:(i + 1) * per]
                if len(sel):
                    yield slice_batch(bucket, sel)

    return BatchStream(gen, len(bucket_indices) * batches_per_bucket)


def prefetch_to_device(stream: Iterable, *, size: int = 2,
                       device=None, sharding=None) -> Iterator:
    """Move batches to the device on a background thread, keeping ``size``
    batches in flight.

    This is the reference's prefetch1 bounded queue (IOLoops.scala:833-874)
    plus the pinned-buffer host→device copy (device.toBatched) expressed the
    JAX way: ``jax.device_put`` is async, so enqueueing the next batch's
    transfer overlaps it with the current step's compute.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    put_target = sharding if sharding is not None else device

    def worker():
        try:
            for batch in stream:
                if put_target is not None:
                    batch = jax.device_put(batch, put_target)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except BaseException as e:  # surface stream errors to the consumer
            q.put(e)
        else:
            q.put(StopIteration)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is StopIteration:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
