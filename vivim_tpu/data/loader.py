"""Threaded prefetching batch loader feeding the TPU.

The reference leans on torch DataLoader worker processes
(multiclass_training_folds.py:442-445).  Here a thread pool decodes and
augments clips while the accelerator computes; batches are stacked
channels-last numpy arrays ready for ``jax.device_put`` (host-side PIL
decode releases the GIL, so threads scale adequately; the C++ decode path
can be swapped in underneath without changing this interface).
"""

from __future__ import annotations

import queue
import random as _random
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DataLoader:
    """Iterates shuffled, batched clips with background prefetch.

    Args:
      dataset: ClipDataset-like (len, load_clip(idx, rng)).
      batch_size: clips per batch.
      shuffle: reshuffle each epoch with seed+epoch.
      num_workers: decode threads (0 = synchronous).
      drop_last: drop the trailing partial batch (static shapes for jit).
      prefetch: max batches queued ahead.
      seed: shuffle/augmentation base seed.
      process_index / process_count: multi-host input sharding.  Every host
        computes the same seed+epoch-deterministic global order and global
        batches, then loads only its contiguous
        ``batch_size // process_count`` block of each batch — contiguous
        (not strided) so that ``jax.make_array_from_process_local_data``,
        which places host p's rows at its devices' global offsets, rebuilds
        the global batch in exactly the single-host row order
        (augmentation RNG is keyed by the *global* sample index, so the
        assembled batch is bit-identical to a one-host run).  Assemble with
        ``vivim_tpu.parallel.mesh.global_shard_batch``.  Defaults (0, 1)
        reproduce single-host behavior.
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 drop_last=True, prefetch=4, seed=42,
                 process_index=0, process_count=1):
        if batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes")
        if not 0 <= process_index < process_count:
            raise ValueError(f"process_index {process_index} out of range "
                             f"for process_count {process_count}")
        if process_count > 1 and not drop_last:
            raise ValueError("multi-host sharding needs drop_last=True: a "
                             "partial global batch would split unevenly "
                             "across hosts (non-uniform local shapes)")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _order(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            _random.Random(self.seed + self.epoch).shuffle(idx)
        return idx

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _rng_for(self, i):
        return _random.Random(self.seed * 7919 + self.epoch * 131 + i)

    def _collate(self, items):
        batch = {}
        for key in items[0]:
            if key == "paths":
                batch[key] = [it[key] for it in items]
            else:
                batch[key] = np.stack([it[key] for it in items])
        return batch

    def __iter__(self):
        order = self._order()
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size]
                   for i in range(len(self))]
        if self.process_count > 1:
            local = self.batch_size // self.process_count
            lo = self.process_index * local
            batches = [b[lo : lo + local] for b in batches]
        if self.num_workers <= 0:
            for bidx in batches:
                yield self._collate(
                    [self.dataset.load_clip(i, self._rng_for(i)) for i in bidx])
            return

        out_q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def produce():
            # submissions are windowed to ``prefetch + 1`` batches ahead of
            # the consumer: submitting the whole epoch upfront would let the
            # pool run ALL loads regardless of queue backpressure, pinning
            # every decoded clip of the epoch in future results (~GBs)
            try:
                from collections import deque

                with ThreadPoolExecutor(self.num_workers) as pool:
                    window = max(1, self.prefetch) + 1
                    pending: deque = deque()
                    it = iter(batches)

                    def submit_next():
                        bidx = next(it, None)
                        if bidx is None:
                            return False
                        pending.append(
                            [pool.submit(self.dataset.load_clip, i,
                                         self._rng_for(i)) for i in bidx])
                        return True

                    for _ in range(window):
                        if not submit_next():
                            break
                    while pending:
                        if stop.is_set():
                            return
                        fb = pending.popleft()
                        out_q.put(self._collate([f.result() for f in fb]))
                        submit_next()
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
