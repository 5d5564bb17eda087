"""Host-side batching + device prefetch.

Replaces the reference's DataLoader worker pool + ``gotit`` retry protocol
(reference ``train.py:228-234,313-319``) with a thread pool feeding a
double-buffered device queue, so the TPU never stalls on host work (the
BASELINE north-star's "double-buffered feed").
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


def batch_iterator(dataset, batch_size: int, shuffle: bool = True, seed: int = 125,
                   num_workers: int = 8, grad_acc: int = 1,
                   max_retries: int = 64) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked batches, honoring the (sample, gotit) retry protocol.

    With grad_acc > 1, batches get a leading (grad_acc,) microbatch axis.
    """
    rng = np.random.RandomState(seed)
    order_idx = 0
    pool = ThreadPoolExecutor(max_workers=num_workers)
    eff_batch = batch_size * grad_acc

    def fetch(i: int):
        sample, gotit = dataset[i]
        return sample if gotit else None

    while True:
        samples = []
        while len(samples) < eff_batch:
            want = eff_batch - len(samples)
            if shuffle:
                idxs = rng.randint(0, len(dataset), size=want * 2)
                got = [s for s in pool.map(fetch, idxs) if s is not None]
                samples.extend(got[:want])
            else:
                # Sequential mode (deterministic eval): visit every index
                # exactly once per epoch — fetch exactly `want`, advance by
                # what was fetched, and let failed samples drop out (the
                # next inner-loop pass tops the batch up from later indices).
                idxs = np.arange(order_idx, order_idx + want) % len(dataset)
                order_idx += want
                samples.extend(s for s in pool.map(fetch, idxs)
                               if s is not None)
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        if grad_acc > 1:
            batch = {k: v.reshape(grad_acc, batch_size, *v.shape[1:])
                     for k, v in batch.items()}
        yield batch


class DevicePrefetcher:
    """Background thread moving host batches onto device, double-buffered.

    ``put_fn`` maps a host batch -> device batch (e.g. a sharded device_put);
    defaults to plain ``jax.device_put``.
    """

    def __init__(self, it: Iterator, put_fn: Optional[Callable] = None, depth: int = 2):
        self.it = it
        self.put_fn = put_fn or jax.device_put
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for batch in self.it:
                if self._stop.is_set():
                    return
                self.q.put(self.put_fn(batch))
        except Exception as e:  # surface errors on the consumer side
            self.q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
