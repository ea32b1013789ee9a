"""Host-side batch loader with threaded prefetch.

Replaces the reference's torch DataLoader + worker processes
(k_fold_cross_valid_combined_brats.py:134-148): per-sample augmentation runs
in a thread pool (numpy/scipy release the GIL in the hot paths), batches are
stacked contiguously, and a small prefetch queue overlaps host augmentation
with device compute — the reference instead blocked on `cuda.synchronize()`
every step (train_one_epoch.py:76).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


def all_labels(dataset) -> np.ndarray:
    """Labels for StratifiedKFold without materialising volumes (the reference
    pushes every item through __getitem__ incl. augmentation just to get
    features it never uses for splitting — train_3d_resnet.py:196-204)."""
    labels = getattr(dataset, "labels", None)
    if labels is not None:
        return np.asarray(labels)
    if getattr(dataset, "has_labels", False):
        return np.asarray([int(x[1]) for x in dataset.indices])
    return np.full(len(dataset), -100)


def process_local_indices(indices) -> np.ndarray:
    """Shard a global index list across hosts: each process loads only its
    contiguous slice (the multi-host replacement for DistributedSampler —
    reference misc.py:216-248 scaffolding)."""
    import jax

    n_proc = jax.process_count()
    if n_proc == 1:
        return np.asarray(indices)
    idx = np.asarray(indices)
    per = len(idx) // n_proc
    r = jax.process_index()
    return idx[r * per : (r + 1) * per]


def all_items(dataset) -> Tuple[np.ndarray, np.ndarray]:
    """(stacked_augmented, labels) — reference-compatible materialisation."""
    items = [dataset[i] for i in range(len(dataset))]
    return np.stack([it[0] for it in items]), np.asarray([it[2] for it in items])


class ConcatDataset:
    """Concatenation of datasets with offset indexing (torch ConcatDataset
    equivalent, used by the EGD combined pretraining —
    reference k_fold_cross_valid_combined_egd.py:133-137)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, item):
        ds_idx = int(np.searchsorted(self._offsets, item, side="right") - 1)
        return self.datasets[ds_idx][item - int(self._offsets[ds_idx])]


class Loader:
    """Iterable over (augmented, original, labels) numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        indices: Optional[Sequence[int]] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.indices)
        length = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if length == 0:
            raise ValueError(
                f"Loader would yield 0 batches: {n} items < batch_size "
                f"{self.batch_size} (drop_last={self.drop_last})"
            )
        return length

    def _batches(self) -> Iterator[np.ndarray]:
        order = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(order)
        n_batches = len(self)
        for b in range(n_batches):
            yield order[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self):
        self._epoch += 1
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def collate(batch_idx):
            items = list(pool.map(self.dataset.__getitem__, batch_idx))
            aug = np.stack([it[0] for it in items])
            orig = np.stack([it[1] for it in items])
            labels = np.asarray([it[2] for it in items])
            return aug, orig, labels

        def producer():
            try:
                for batch_idx in self._batches():
                    if stop.is_set():
                        return
                    q.put(collate(batch_idx))
                q.put(None)
            except BaseException as e:  # propagate to the consumer, never truncate
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
