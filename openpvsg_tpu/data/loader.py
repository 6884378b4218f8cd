"""Prefetching batch loader.

Replaces the reference's fork-based mmcv dataloader workers (SURVEY §3.1
"dataloader worker procs") with a thread-pool pipeline: sample indices are
decoded + preprocessed by `make_sample` concurrently (PIL's zlib decode
releases the GIL) while the device crunches the previous batch, keeping the
TPU fed without process forks.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, List, Optional, Sequence


class PrefetchLoader:
    def __init__(self, make_sample: Callable[[int], Optional[dict]],
                 order: Sequence[int], batch_size: int,
                 collate: Callable[[List[dict]], dict],
                 num_workers: int = 4, prefetch_batches: int = 2,
                 drop_last: bool = True):
        self.make_sample = make_sample
        self.order = list(order)
        self.batch_size = batch_size
        self.collate = collate
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch_batches, 1)
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.order) // self.batch_size
        if not self.drop_last and len(self.order) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[dict]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                step = self.batch_size
                end = (len(self.order) - step + 1) if self.drop_last \
                    else len(self.order)
                for lo in range(0, max(end, 0), step):
                    if stop.is_set():
                        return
                    idxs = self.order[lo:lo + step]
                    samples = [s for s in pool.map(self.make_sample, idxs)
                               if s is not None]
                    if not samples:
                        continue
                    while len(samples) < step:
                        samples.append(samples[len(samples) % len(samples)])
                    try:
                        q.put(self.collate(samples))
                    except Exception:
                        return
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
