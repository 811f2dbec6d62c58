"""Batching loader with worker threads + double-buffered device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` + ``*_DataLoader``
wrapper classes (reference: datasets/cityscapes_Dataset.py City_DataLoader,
SURVEY.md C1/§3.4). Decode + augmentation run in a thread pool (PIL/numpy
release the GIL for the heavy parts); finished batches are moved to device
asynchronously (``jax.device_put`` onto the target sharding) so the TPU
never waits on the host in steady state.

Sample RNG is stateless per (seed, epoch, index) → bit-reproducible
regardless of worker count or scheduling order, unlike the reference's
worker-process ``random`` state.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Iterator

import jax
import numpy as np


# name yielded for batch-padding duplicates (labels are all-ignore)
_PAD_SAMPLE_NAME = "<pad>"


def make_pad_sample(dataset, seed: int, epoch: int):
    """The canonical padding sample both loaders use for batch/shard slots:
    sample 0's image with ALL-IGNORE labels, so pads never reach the
    confusion matrix (the reference evaluates each val sample exactly once).

    The decoded sample is memoized on the dataset per (seed, epoch) — pad
    slots only need the array shapes/dtypes plus a deterministic image, so
    re-decoding sample 0 for every slot is wasted work (ADVICE r2)."""
    key = (seed, epoch)
    cached = getattr(dataset, "_pad_sample_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    rng = np.random.default_rng((seed, epoch, 0))
    x, y, _ = dataset.get(0, rng)
    sample = (x, np.full_like(y, -1), _PAD_SAMPLE_NAME)
    dataset._pad_sample_cache = (key, sample)
    return sample


class SegDataLoader:
    """Iterates a SegDataset in shuffled batches of stacked numpy arrays.

    Yields ``(images (N,H,W,3) float32, labels (N,H,W) int32, names)``.
    ``num_iterations`` mirrors the reference wrapper's counter.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: bool = True,
        pad_last: bool = False,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        # multi-host: each process reads a disjoint, equal-length slice of
        # the (identically seeded) shuffled order, so processes stay in
        # lockstep on iteration count (SURVEY.md §5.8 / §7 step 6)
        self.shard_index = shard_index
        self.shard_count = max(1, shard_count)
        self.epoch = 0
        self._skip_batches = 0

    def set_skip(self, n_batches: int):
        """Skip the first n batches of the NEXT epoch only (mid-epoch
        resume: same epoch → same shuffle + same per-sample aug RNG, so
        skipping reproduces the interrupted epoch's exact tail)."""
        self._skip_batches = int(n_batches)

    def _shard_len(self) -> int:
        if self.shard_count <= 1:
            return len(self.dataset)
        if self.pad_last:
            # val: EVERY sample must be evaluated exactly once (the
            # reference protocol); short shards pad with all-ignore
            # samples so processes stay in lockstep
            return -(-len(self.dataset) // self.shard_count)
        return len(self.dataset) // self.shard_count

    @property
    def num_iterations(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        return idx

    def _sample(self, index: int, epoch: int):
        if index < 0:  # shard-padding slot
            return make_pad_sample(self.dataset, self.seed, epoch)
        rng = np.random.default_rng((self.seed, epoch, int(index)))
        return self.dataset.get(int(index), rng)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, list[str]]]:
        # Capture-and-advance UP FRONT: a zip() that abandons this generator
        # (UDA pairs a long source loader with a short target loader) must
        # still see a fresh shuffle + fresh augmentation RNG next epoch.
        # Trainers additionally call set_epoch() so resume stays aligned.
        epoch = self.epoch
        self.epoch = epoch + 1
        order = self._order(epoch)
        if self.shard_count > 1:
            if self.pad_last:
                # cover every sample: round shards UP, pad short shards
                # with -1 slots (all-ignore samples, excluded from metrics)
                per = -(-len(order) // self.shard_count)
                shard = order[self.shard_index :: self.shard_count]
                if len(shard) < per:
                    shard = np.concatenate(
                        [shard, np.full(per - len(shard), -1, shard.dtype)]
                    )
                order = shard
            else:
                per = len(order) // self.shard_count  # equal across processes
                order = order[self.shard_index::self.shard_count][:per]
        n = len(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        order = order[:limit]
        skip = self._skip_batches
        self._skip_batches = 0
        if skip:
            order = order[skip * self.batch_size:]
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            # keep ~2 batches of samples in flight
            window = self.batch_size * 2 + self.num_workers
            futures: collections.deque = collections.deque()
            it = iter(order)

            def refill():
                while len(futures) < window:
                    try:
                        i = next(it)
                    except StopIteration:
                        return
                    futures.append(pool.submit(self._sample, i, epoch))

            refill()
            batch: list = []
            while futures:
                batch.append(futures.popleft().result())
                refill()
                if len(batch) == self.batch_size or (not futures and batch):
                    if len(batch) < self.batch_size and self.pad_last:
                        # Pad to the static batch shape by duplicating the
                        # last image but with ALL-IGNORE labels, so padded
                        # samples never reach the confusion matrix — the
                        # reference evaluates each val sample exactly once
                        # (ADVICE r1, low).
                        x_last, y_last, _ = batch[-1]
                        pad = (
                            x_last,
                            np.full_like(y_last, -1),
                            _PAD_SAMPLE_NAME,
                        )
                        batch += [pad] * (self.batch_size - len(batch))
                    xs = np.stack([b[0] for b in batch])
                    ys = np.stack([b[1] for b in batch])
                    names = [b[2] for b in batch]
                    yield xs, ys, names
                    batch = []

    def __len__(self) -> int:
        return self.num_iterations


def device_prefetch(iterator, sharding=None, buffer_size: int = 2):
    """Move host batches to device ahead of compute (double buffering).

    ``sharding`` is a ``jax.sharding.Sharding`` (e.g. batch-sharded
    NamedSharding for pure DP over ICI) applied to array-typed elements;
    non-array elements (names) pass through.
    """
    queue: collections.deque = collections.deque()
    sentinel = object()
    lock = threading.Lock()
    it = iter(iterator)

    multiprocess = jax.process_count() > 1

    def put(batch):
        def to_dev(x):
            if isinstance(x, np.ndarray):
                if sharding is not None and multiprocess:
                    # each process contributes its local slice of the
                    # global batch (loaders are sharded per process)
                    return jax.make_array_from_process_local_data(sharding, x)
                return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
            return x
        return tuple(to_dev(x) for x in batch)

    def fill():
        with lock:
            while len(queue) < buffer_size:
                try:
                    queue.append(put(next(it)))
                except StopIteration:
                    queue.append(sentinel)
                    return

    fill()
    while True:
        if not queue:
            fill()
        item = queue.popleft()
        if item is sentinel:
            return
        fill()
        yield item
