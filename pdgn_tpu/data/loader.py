"""Device-feeding loader: host batching + double-buffered transfer.

Replaces the reference's torch ``DataLoader(num_workers=4)`` process pool
(models/PDGNet_v2.py:78). On TPU the right structure is: slice batches on
the host (numpy), then keep one batch in flight to the device while the
current step runs — ``device_put`` below overlaps with compute because JAX
dispatch is asynchronous.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Iterator, Optional

import jax

from pdgn_tpu.data.shapenet import batch_iterator


def split_sizes(dataset_len: int, train_ratio: float, val_ratio: float):
    """Train/val/test sizes (reference utils/data.py:5-13)."""
    train = int(dataset_len * train_ratio)
    val = int(dataset_len * val_ratio)
    return train, val, dataset_len - train - val


class Subset:
    """Index-view of a dataset (torch.utils.data.Subset equivalent)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def random_split(dataset, lengths, seed: Optional[int] = None):
    """Deterministic random split (torch ``random_split`` equivalent)."""
    import numpy as np

    assert sum(lengths) == len(dataset)
    rng = np.random.RandomState(seed) if seed is not None else np.random
    perm = rng.permutation(len(dataset))
    out, start = [], 0
    for n in lengths:
        out.append(Subset(dataset, perm[start:start + n]))
        start += n
    return out


def get_train_val_test_datasets(dataset, train_ratio: float,
                                val_ratio: float, seed: Optional[int] = None):
    """Three-way random split (reference utils/data.py:5-13)."""
    sizes = split_sizes(len(dataset), train_ratio, val_ratio)
    return random_split(dataset, list(sizes), seed=seed)


def get_data_iterator(iterable) -> Iterator:
    """Infinite iterator over an epoch iterable (reference utils/data.py:25-34)."""
    while True:
        for item in iterable:
            yield item


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Run the host iterator in a thread and keep ``size`` batches in flight.

    Args:
      iterator: yields tuples of numpy arrays (trailing non-array elements
        such as category strings are passed through untouched).
      sharding: optional ``jax.sharding.Sharding`` for the device arrays.
    """
    q: Queue = Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone."""
        from queue import Full

        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                put = tuple(
                    jax.device_put(x, sharding) if hasattr(x, "shape") else x
                    for x in batch
                )
                if not _put(put):
                    return
            _put(_END)
        except BaseException as e:  # noqa: BLE001 - must surface in consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer abandoned the epoch (break / exception): release the
        # producer so it doesn't park on q.put holding device batches
        stop.set()


def train_loader(
    dataset,
    batch_size: int,
    seed: Optional[int] = None,
    sharding=None,
    prefetch: int = 2,
):
    """One epoch of device-ready 4-resolution batches."""
    it = batch_iterator(dataset, batch_size, shuffle=True, drop_last=True,
                        seed=seed)
    return prefetch_to_device(it, size=prefetch, sharding=sharding)
