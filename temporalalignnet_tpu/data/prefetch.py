"""Host-side input pipeline: threaded sample building + background batch prefetch.

Replaces the reference's torch DataLoader + BackgroundGenerator stack
(utils/data_utils.py:9-93, ``DataLoaderBG``):
- a thread pool builds fixed-shape numpy samples (file IO + numpy release the
  GIL, so threads are the right tool — no process fork cost per epoch);
- a producer thread stacks batches and pushes them into a bounded queue
  (the BackgroundGenerator pattern, data_utils.py:26-47);
- optionally each batch is device_put with a batch sharding as it is dequeued,
  double-buffering H2D against TPU compute (the reference's .to(non_blocking)
  + prefetch, train/main.py:48-53).

Determinism: per-(seed, epoch) RandomState for the shuffle and one derived
RandomState per sample — matching the reference's per-epoch reseeding
(train/main.py:507-508) without global RNG state.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from temporalalignnet_tpu.data.htm import stack_samples


class TrainLoader:
    """Iterable over fixed-shape batches of ``dataset.sample(i, rng)`` dicts."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        device_put: Optional[Callable[[Dict[str, np.ndarray]], Dict]] = None,
        local_rows: Optional[tuple] = None,
    ):
        assert len(dataset) > 0, "empty dataset"
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.device_put = device_put
        # multi-process runtime: batch_size stays the GLOBAL batch (epoch
        # order, len(), and step counting are host-invariant), but each
        # process only BUILDS rows [lo, hi) of every batch — the rows its
        # devices own (parallel.mesh.local_batch_rows).  The reference's
        # DistributedSampler parity (end2end/main_nce.py:229-231) with the
        # per-sample RNG still keyed by GLOBAL index, so the global batch is
        # bit-identical to a single-process run.
        self.local_rows = local_rows
        if local_rows is not None:
            lo, hi = local_rows
            assert 0 <= lo < hi <= batch_size, local_rows
            # a partial final batch would give processes unequal (possibly
            # empty) row slices that put_global cannot assemble into one
            # global array — multi-process feeding requires full batches
            # (the reference's DistributedSampler likewise pads/drops to a
            # rank-divisible length, end2end/main_nce.py:229-231)
            assert drop_last, "local_rows requires drop_last=True"
        self.epoch = 0
        self.start_batch = 0
        # persistent worker pool across epochs (the reference's DataLoaderFast
        # _RepeatSampler trick, utils/data_utils.py:60-88, without the torch
        # worker-process respawn cost)
        self._pool = ThreadPoolExecutor(num_workers)

    def set_epoch(self, epoch: int, start_batch: int = 0) -> None:
        """``start_batch``: resume mid-epoch — the next iteration yields batches
        [start_batch, len) of this epoch's deterministic order, exactly the
        batches an interrupted run never consumed (reference restores only the
        epoch boundary, train/main.py:443-444; this is finer-grained)."""
        self.epoch = epoch
        self.start_batch = start_batch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState((self.seed, self.epoch)).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict]:
        order = self._epoch_order()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def build_sample(flat_idx: int):
            rng = np.random.RandomState((self.seed, self.epoch, int(flat_idx)))
            return self.dataset.sample(int(order[flat_idx]), rng)

        def producer():
            try:
                for b in range(self.start_batch, nb):
                    if stop.is_set():
                        return
                    lo = b * self.batch_size
                    hi = min(lo + self.batch_size, len(order))
                    if self.local_rows is not None:
                        r0, r1 = self.local_rows
                        lo, hi = min(lo + r0, hi), min(lo + r1, hi)
                    samples = list(self._pool.map(build_sample, range(lo, hi)))
                    q.put(stack_samples(samples))
                q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield self.device_put(item) if self.device_put else item
        finally:
            stop.set()
            # drain so the producer's blocked put() can observe stop
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def make_device_put(mesh=None):
    """Batch device_put callable: sharded over 'data' when a mesh is given.

    In a multi-process runtime each process holds only its local rows and
    put_global assembles the global jax.Array (no cross-host copies)."""
    import jax

    if mesh is None:
        return lambda batch: {k: jax.device_put(v) for k, v in batch.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P

    from temporalalignnet_tpu.parallel.mesh import DATA_AXIS, put_global

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return lambda batch: {k: put_global(v, sh) for k, v in batch.items()}
