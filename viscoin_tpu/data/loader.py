"""Batched data loading with background prefetch.

Replaces torch.utils.data.DataLoader (reference: viscoin/datasets/utils.py:154)
with a torch-free loader that yields fixed-shape uint8 numpy batches ready for
the device-side preprocessing graph. A thread pool overlaps host decode/crop
with device compute (the reference relies on torch DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DataLoader:
    """Iterates (images uint8 (B, S, S, 3), labels int32 (B,)) batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False, num_threads: int = 8,
                 prefetch: int = 2, use_native: bool | None = None,
                 shard: tuple[int, int] = (0, 1)):
        """``shard=(rank, world)`` makes this loader yield rank's slice of
        every GLOBAL batch (``batch_size`` stays the global size; yielded
        batches have ``batch_size // world`` rows). The global index order is
        a pure function of (seed, epoch) and identical on every rank, so the
        world's slices concatenate to exactly the single-loader batch —
        feed them to ``parallel.mesh.global_shard_batch`` on a multi-host
        mesh. Requires world | batch_size."""
        rank, world = shard
        if world > 1 and batch_size % world != 0:
            raise ValueError(f"batch_size={batch_size} not divisible by "
                             f"shard world size {world}")
        self.shard = (int(rank), int(world))
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self._pending_skip = 0
        # Native C++ crop+resize fast path (viscoin_tpu/native): auto-on when
        # the library builds and the dataset exposes decoded raw images.
        if use_native is None:
            from viscoin_tpu import native

            use_native = native.available() and hasattr(dataset, "raw_image")
        self.use_native = use_native

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last or self.shard[1] > 1:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # Shuffle order is a pure function of (seed, epoch) so that a
            # resumed run replays the exact batch sequence (deterministic
            # resume — skip_batches() relies on this).
            np.random.default_rng((self.seed, self._epoch)).shuffle(idx)
        rank, world = self.shard
        # Sharded loaders drop the ragged tail: its per-rank slices would be
        # unequal (the train loop skips ragged batches anyway).
        drop = self.drop_last or world > 1
        end = (n // self.batch_size) * self.batch_size if drop else n
        per = self.batch_size // world
        for start in range(0, end, self.batch_size):
            b = idx[start : start + self.batch_size]
            yield b[rank * per : (rank + 1) * per] if world > 1 else b

    def skip_batches(self, k: int) -> None:
        """Fast-forward k batches without building them (deterministic
        resume): whole epochs advance the epoch counter, the remainder is
        dropped from the next ``__iter__``."""
        per_epoch = len(self)
        self._epoch += k // per_epoch
        self._pending_skip = k % per_epoch

    def _make_batch(self, indices, pool: ThreadPoolExecutor | None):
        if self.use_native:
            return self._make_batch_native(indices, pool)
        if pool is not None:
            items = list(pool.map(self.dataset.__getitem__, indices))
        else:
            items = [self.dataset[i] for i in indices]
        images = np.stack([it[0] for it in items])
        labels = np.asarray([it[1] for it in items], np.int32)
        if len(items[0]) == 3:  # captioned dataset
            return images, labels, [it[2] for it in items]
        return images, labels

    def _make_batch_native(self, indices, pool: ThreadPoolExecutor | None):
        """Decode (threaded, cached) then one native crop+resize call for the
        whole batch."""
        from viscoin_tpu import native

        ds = self.dataset
        if pool is not None:
            raws = list(pool.map(ds.raw_image, indices))
        else:
            raws = [ds.raw_image(i) for i in indices]
        raws = [np.ascontiguousarray(r) for r in raws]
        # crop geometry keyed by (seed, epoch, index) PER IMAGE: resume-exact,
        # and independent of batch composition — a sharded loader's slice
        # reproduces exactly the crops of the unsharded batch.
        rngs = [np.random.default_rng((self.seed, self._epoch, int(i)))
                for i in indices]
        boxes = native.crop_boxes([r.shape[:2] for r in raws], ds.transform_mode,
                                  ds.out_size, rngs)
        images = native.transform_batch(raws, boxes, ds.out_size,
                                        n_threads=max(self.num_threads, 1))
        labels = np.asarray([ds._label(int(i)) for i in indices], np.int32)
        return images, labels

    def __iter__(self):
        self._epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            # augmentation randomness becomes a pure function of
            # (dataset seed, epoch, index): thread-safe + resume-exact
            self.dataset.set_epoch(self._epoch)
        batches = list(self._batch_indices())
        if self._pending_skip:
            batches = batches[self._pending_skip:]
            self._pending_skip = 0
        if self.num_threads <= 0:
            for b in batches:
                yield self._make_batch(b, None)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # Bounded put that re-checks stop: if the consumer abandons the
            # iterator mid-epoch, a bare q.put would block forever and leak
            # this thread (and its pool) per abandoned epoch.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # A producer crash (e.g. a corrupt image raising in __getitem__)
            # must reach the consumer: without the except/finally the
            # sentinel is never enqueued and q.get() blocks forever.
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not put(self._make_batch(b, pool)):
                            return
            except BaseException as e:  # noqa: BLE001 - forwarded, not dropped
                put(e)
                return
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def loop_iter(loader):
    """Infinite cycling iterator (reference: viscoin/training/utils.py:45)."""
    while True:
        yield from loader
