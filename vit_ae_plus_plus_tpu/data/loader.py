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


def epoch_shard(
    indices,
    epoch: int,
    seed: int,
    rank: int,
    n_proc: int,
    shuffle: bool = True,
) -> np.ndarray:
    """Per-epoch multi-host sharding, DistributedSampler-equivalent (torch's
    sampler semantics the reference relies on: reshuffle GLOBALLY every epoch
    with an identical seed on all ranks, pad by wrapping so every rank gets
    the same batch count, never silently drop the remainder).

    The global order is drawn from `seed + epoch` — identical on every host —
    then dealt round-robin, so each original index is visited at least once
    per epoch and exactly once when len(indices) % n_proc == 0.
    """
    order = np.asarray(indices).copy()
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    if n_proc == 1:
        return order
    per = -(-len(order) // n_proc)  # ceil: pad rather than drop
    total = per * n_proc
    if total > len(order):
        order = np.concatenate([order, order[: total - len(order)]])
    return order[rank::n_proc]


def process_local_indices(indices) -> np.ndarray:
    """Static (epoch-independent) host shard of a global index list. Prefer
    `Loader(..., shard_across_processes=True)`, which reshuffles globally every
    epoch; this exists for one-shot sharding (e.g. eval loaders)."""
    import jax

    return epoch_shard(indices, epoch=0, seed=0, rank=jax.process_index(),
                       n_proc=jax.process_count(), shuffle=False)


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


def device_prefetch(iterator, size: int = 2, sharding=None, put_orig: bool = True):
    """Async double-buffered host->device transfer.

    Wraps a batch iterator so the NEXT batch's `jax.device_put` (an async DMA)
    is issued while the device is still executing the current step — the H2D
    copy cost disappears behind compute. The reference's loop instead moved
    tensors synchronously under `cuda.synchronize()` every iteration
    (train_one_epoch.py:47-48,76). `sharding` (e.g. NamedSharding(mesh,
    P('data'))) places each array directly into its sharded layout, so GSPMD
    never re-lays-out the batch. Labels and other non-float arrays ride along
    untouched.

    Yields the same (aug, orig, labels) tuples with aug/orig as committed
    device arrays. `put_orig=False` skips the second view's transfer — the
    device-augment path derives BOTH views on-device from the raw batch
    (ops/augment.py:device_augment_batch), so shipping `orig` (identical raw
    bytes) would double the H2D traffic for nothing.
    """
    import collections

    import jax

    def put(batch):
        aug, orig, labels = batch
        if sharding is not None:
            return (
                jax.device_put(aug, sharding),
                jax.device_put(orig, sharding) if put_orig else orig,
                labels,
            )
        return (jax.device_put(aug), jax.device_put(orig) if put_orig else orig, labels)

    buf = collections.deque()
    it = iter(iterator)
    for batch in it:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class DeviceResidentBatches:
    """Whole-dataset-in-HBM batch source: zero per-step host->device traffic.

    The BraTS/EGD training pools are a few hundred 96^3 volumes (~1-3.5 GB
    f32) — they FIT in a TPU chip's HBM. Staging the raw array once per fold
    and gathering each shuffled batch on device removes the host loader and
    the H2D copy from the steady-state step entirely; combined with on-device
    augmentation (ops/augment.py) the input pipeline costs one `jnp.take`
    per step. This is the TPU-native answer to the reference's
    DataLoader-worker pipeline (k_fold_…_brats.py:134-148) for datasets that
    fit; the streaming Loader remains the fallback for ones that don't.

    Epoch shuffling matches `Loader` (epoch_shard with the same seed), so
    batch ORDER is identical to the host path; `raw=True` datasets only
    (normalisation happens on device with the augment pipeline).

    Multi-host: the SPMD arrangement is a GLOBAL mesh — stage the store
    replicated (`sharding=NamedSharding(mesh, P())`) and gather batches in the
    step's layout (`batch_sharding=NamedSharding(mesh, P('data'))`). Every
    process runs the identical program over the identical global epoch order
    (same seed), and GSPMD splits the gather so each device materialises only
    its P('data') rows — no per-rank index lists, no duplicated batches.
    Without a process-spanning mesh there is NO correct multi-process mode
    (each process would train on identical data), so that combination raises;
    use the streaming `Loader(shard_across_processes=True)` instead.
    """

    def __init__(self, dataset, batch_size: int, indices=None, seed: int = 0,
                 drop_last: bool = True, sharding=None, batch_sharding=None):
        import jax

        if jax.process_count() > 1:
            mesh_devices = getattr(getattr(sharding, "mesh", None), "devices", None)
            spans_all = (mesh_devices is not None
                         and mesh_devices.size == jax.device_count())
            if not spans_all:
                raise ValueError(
                    "DeviceResidentBatches under jax.process_count() > 1 needs "
                    "a process-spanning mesh (sharding=NamedSharding(mesh, P()), "
                    "batch_sharding=NamedSharding(mesh, P('data'))); without it "
                    "every host would train on identical batches. Use "
                    "Loader(shard_across_processes=True) for per-host streams."
                )

        ids = np.asarray(indices if indices is not None else np.arange(len(dataset)))
        vols = np.stack([np.asarray(dataset[i][0], np.float32) for i in ids])
        # under a mesh, stage replicated (sharding=NamedSharding(mesh, P()))
        # and emit batches in the step's P('data') layout (batch_sharding):
        # the per-batch gather then materialises only the local shard
        self._data = (jax.device_put(vols, sharding) if sharding is not None
                      else jax.device_put(vols))  # (n, C, S, S, S) resident
        self._labels = all_labels(dataset)[ids]
        self.batch_size = batch_size
        self.drop_last = drop_last
        self._seed = seed
        self._epoch = 0
        self._n = len(ids)
        take = lambda data, idx: data[idx]  # on-device gather
        self._take = (jax.jit(take, out_shardings=batch_sharding)
                      if batch_sharding is not None else jax.jit(take))

    def nbytes(self) -> int:
        return int(self._data.size) * 4

    def __len__(self) -> int:
        n = self._n
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the shuffle schedule for mid-run resume (same
        semantics as Loader.set_epoch)."""
        self._epoch = int(epoch)

    def __iter__(self):
        self._epoch += 1
        # LOCAL positions 0..n-1 shuffled with Loader-identical semantics
        order = epoch_shard(np.arange(self._n), self._epoch, self._seed,
                            rank=0, n_proc=1, shuffle=True)
        for b in range(len(self)):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            batch = self._take(self._data, idx)
            yield batch, batch, self._labels[idx]


def measure_prefetch_overlap(load_ms: float = 20.0, compute_ms: float = 30.0,
                             n_batches: int = 10, batch_size: int = 2):
    """Measure the streaming pipeline's consumer stall fraction with a
    synthetic slow dataset and a simulated device step: with the producer
    thread + prefetch queue + device_put put-ahead working, batch k+1 is
    loaded while the consumer is busy with batch k, so an epoch costs
    ~ n * max(load, compute), not ~ n * (load + compute). Returns
    (stall_fraction, total_seconds). Used by tests/test_loader_sharding.py
    (the CI proof) and bench.py --full (recorded in BENCH_DETAILS — the raw
    e2e number on the dev box is tunnel-bound, so the pipeline design is
    proven framework-side)."""
    import time

    class _SlowDs:
        labels = np.zeros(n_batches * batch_size, np.int64)

        def __len__(self):
            return n_batches * batch_size

        def __getitem__(self, i):
            time.sleep(load_ms / 1e3 / batch_size)  # GIL released
            v = np.zeros((1, 8, 8, 8), np.float32)
            return v, v, 0

    loader = Loader(_SlowDs(), batch_size, shuffle=False, drop_last=True,
                    num_workers=1, prefetch=2, seed=0)
    # no warm-up pass: Loader spins up a fresh producer thread per epoch, so
    # there is nothing to warm; pipeline fill (the first batch's load) is
    # part of what the stall fraction honestly measures
    t0 = time.perf_counter()
    n = 0
    for _aug, _orig, _lab in device_prefetch(loader, size=2):
        time.sleep(compute_ms / 1e3)  # the "device step"
        n += 1
    total = time.perf_counter() - t0
    stall = max(0.0, 1.0 - (n * compute_ms / 1e3) / total)
    return stall, total


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
        shard_across_processes: bool = False,
        rank: Optional[int] = None,
        n_proc: Optional[int] = None,
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
        if shard_across_processes and (rank is None or n_proc is None):
            import jax

            rank = jax.process_index() if rank is None else rank
            n_proc = jax.process_count() if n_proc is None else n_proc
        self._rank = rank if shard_across_processes else 0
        self._n_proc = n_proc if shard_across_processes else 1

    def _local_len(self) -> int:
        n = len(self.indices)
        return -(-n // self._n_proc) if self._n_proc > 1 else n  # wrap-padded

    def __len__(self) -> int:
        n = self._local_len()
        length = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        if length == 0:
            raise ValueError(
                f"Loader would yield 0 batches: {n} items < batch_size "
                f"{self.batch_size} (drop_last={self.drop_last})"
            )
        return length

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the shuffle schedule for mid-run resume: the next
        `__iter__` draws the same global order the uninterrupted run's
        epoch-`epoch` iteration would have (DistributedSampler.set_epoch
        semantics)."""
        self._epoch = int(epoch)

    def _batches(self) -> Iterator[np.ndarray]:
        order = epoch_shard(
            self.indices, self._epoch, self._seed, self._rank, self._n_proc,
            shuffle=self.shuffle,
        )
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

        def put(item) -> bool:
            # bounded put that honours `stop`: a consumer that abandons the
            # iterator (break / generator close) must not leave this thread
            # blocked forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch_idx in self._batches():
                    if stop.is_set():
                        return
                    if not put(collate(batch_idx)):
                        return
                put(None)
            except BaseException as e:  # propagate to the consumer, never truncate
                put(e)

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
