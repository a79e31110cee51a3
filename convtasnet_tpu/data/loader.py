"""Host → device batch pipeline.

Replaces the reference's fork-based ``torch.utils.data.DataLoader`` with
``num_workers=4`` + per-step ``.cuda()`` copies (``src/data.py:149-183``,
``src/solver.py:184-187``) with a TPU-idiomatic pipeline: a thread pool
decodes/plans batches ahead of time on the host, and a prefetch depth of
``prefetch`` batches is kept in flight as device arrays (``jax.device_put``
with an explicit sharding) so the accelerator never waits on audio decode.

Batches are sharded over the mesh's ``data`` axis on the batch dimension —
the multi-device generalisation of DataParallel's scatter
(``src/train.py:83-85``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import jax
import numpy as np

from convtasnet_tpu.data.dataset import Batch, SeparationDataset


class BatchLoader:
    """Iterable over device-resident batches with background prefetch.

    Args:
        dataset: a SeparationDataset.
        shuffle: shuffle the batch order each epoch (the reference shuffles
            batch descriptors, not utterances — same here).
        sharding: optional ``jax.sharding.Sharding`` for the device arrays;
            defaults to single-device placement.
        prefetch: number of batches to keep decoded + transferred ahead.
        seed: epoch shuffling seed (epoch number is mixed in per epoch).
        pad_to_multiple: time padding granularity for full-utterance batches.
    """

    def __init__(
        self,
        dataset: SeparationDataset,
        shuffle: bool = False,
        sharding=None,
        prefetch: int = 2,
        num_workers: int = 4,
        seed: int = 0,
        pad_to_multiple: int = 1,
    ):
        self.dataset = dataset
        self.shuffle = shuffle
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.pad_to_multiple = pad_to_multiple
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset)

    def batch_shapes(self):
        """Distinct ``[rows, T]`` mixture shapes this loader will yield,
        from the plan alone (no decode) — lets the solver AOT-probe every
        cv shape once at startup instead of inside the epoch loop."""
        return self.dataset.batch_shapes(self.pad_to_multiple)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        return order

    def _put(self, batch: Batch):
        arrays = (batch.mixture, batch.lengths, batch.sources, batch.weights)
        if self.sharding is None:
            return tuple(jax.device_put(a) for a in arrays)
        sh = self.sharding
        if jax.process_count() > 1:
            # Multi-host: each process contributes only its addressable rows
            # of the global batch (v5e-pod style slices; SURVEY §2 "multi-host
            # via DCN"). Rows are assigned contiguously by process index.
            pc, pi = jax.process_count(), jax.process_index()
            out = []
            for a in arrays:
                per = a.shape[0] // pc
                local = a[pi * per: (pi + 1) * per]
                out.append(
                    jax.make_array_from_process_local_data(sh, local, a.shape))
            return tuple(out)
        return tuple(jax.device_put(a, sh) for a in arrays)

    def __iter__(self) -> Iterator:
        order = self._order()
        work_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    futures = [
                        pool.submit(
                            self.dataset.load_batch, int(i), self.pad_to_multiple
                        )
                        for i in order[: self.prefetch + self.num_workers]
                    ]
                    next_submit = len(futures)
                    for k in range(len(order)):
                        if stop.is_set():
                            return
                        batch = futures[k].result()
                        work_q.put(self._put(batch))
                        if next_submit < len(order):
                            futures.append(
                                pool.submit(
                                    self.dataset.load_batch,
                                    int(order[next_submit]),
                                    self.pad_to_multiple,
                                )
                            )
                            next_submit += 1
                work_q.put(None)
            except BaseException as e:  # propagate into the consumer
                work_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = work_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    work_q.get_nowait()
                except queue.Empty:
                    break
