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

# -- process-worker plumbing (module-level: must pickle by reference) -------
_WORKER_DS = None


def _proc_init(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _proc_fetch(i: int):
    sample, gotit = _WORKER_DS[i]
    return sample if gotit else None


def _make_pool(dataset, num_workers: int, use_processes: bool):
    if not use_processes:
        return ThreadPoolExecutor(max_workers=num_workers)
    # Spawn (not fork): the parent typically holds a live JAX/TPU client
    # whose background threads don't survive fork. Each worker imports the
    # data modules fresh and gets its own decoded-frame caches; per-index
    # seeding keeps samples deterministic regardless of which worker runs
    # them. This is the reference's processes-per-GPU loader
    # (``train.py:228-234``) done host-side.
    import multiprocessing as mp
    from concurrent.futures import ProcessPoolExecutor
    return ProcessPoolExecutor(max_workers=num_workers,
                               mp_context=mp.get_context("spawn"),
                               initializer=_proc_init, initargs=(dataset,))


def batch_iterator(dataset, batch_size: int, shuffle: bool = True, seed: int = 125,
                   num_workers: int = 8, grad_acc: int = 1,
                   use_processes: bool = False) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked batches, honoring the (sample, gotit) retry protocol.

    Parallelism is CROSS-batch: a rolling window of in-flight sample futures
    keeps all workers busy regardless of batch size (the previous
    ``pool.map`` over one batch's indices serialized completely at B=1 —
    sustained throughput was one worker's latency). Results are consumed in
    submission order, so sequential mode still visits every index exactly
    once per epoch with failed samples dropping out, and a fixed seed still
    yields a deterministic sample sequence.

    ``use_processes=True`` swaps the thread pool for spawned worker
    processes — decode/augment work is partly GIL-bound (numpy small-op
    glue), so threads plateau around 2-3x; processes scale with cores at
    the cost of pickling samples back (~5 MB each, cheap vs decode).

    With grad_acc > 1, batches get a leading (grad_acc,) microbatch axis.
    """
    from collections import deque

    rng = np.random.RandomState(seed)
    order_idx = 0
    pool = _make_pool(dataset, num_workers, use_processes)
    eff_batch = batch_size * grad_acc
    # in-flight pre-decoded samples: enough to saturate the workers and
    # cover one batch; bounded to cap host RAM (~10-15 MB/sample at
    # production crops)
    depth = max(eff_batch, num_workers) + num_workers
    inflight: deque = deque()

    def next_index() -> int:
        nonlocal order_idx
        if shuffle:
            # VIRTUAL index: i + salt*len. Datasets wrap for sample selection
            # but seed their rng from the full value, so a small dataset seen
            # for many epochs gets fresh crops/augs/point-subsets each visit
            # (reference loader behavior) while the stream stays a pure
            # function of `seed`. Sequential mode keeps plain wrapping so
            # eval passes see each sample at its canonical index.
            i = int(rng.randint(0, len(dataset)))
            salt = int(rng.randint(0, 1 << 16))
            return i + salt * len(dataset)
        i = order_idx % len(dataset)
        order_idx += 1
        return i

    def fetch(i: int):
        sample, gotit = dataset[i]
        return sample if gotit else None

    submit_fn = _proc_fetch if use_processes else fetch

    try:
        while True:
            samples = []
            while len(samples) < eff_batch:
                while len(inflight) < depth:
                    inflight.append(pool.submit(submit_fn, next_index()))
                s = inflight.popleft().result()
                if s is not None:
                    samples.append(s)
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            if grad_acc > 1:
                batch = {k: v.reshape(grad_acc, batch_size, *v.shape[1:])
                         for k, v in batch.items()}
            yield batch
    finally:
        # generator .close() (GeneratorExit at the yield) lands here: tear the
        # worker pool down so in-flight decode work stops stealing cores from
        # whatever runs next (e.g. the next sweep point in
        # tools/profile_loader_scaling.py)
        pool.shutdown(wait=False, cancel_futures=True)


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
        # a worker blocked on a full queue can't observe the stop flag —
        # drain so it unblocks, then close the source iterator so its
        # finally-block (worker-pool shutdown) runs
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.thread.join(timeout=5)
        if not self.thread.is_alive() and hasattr(self.it, "close"):
            self.it.close()
