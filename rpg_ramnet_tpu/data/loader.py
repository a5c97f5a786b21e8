"""Batched, prefetching data loading onto device.

Reference counterpart: torch DataLoader + ConcatDataset(Custom)
(RAM_Net/train.py:23-75,189-196).  TPU-first replacement: a thread-pooled
host loader producing fixed-shape numpy batches, wrapped by a double-buffered
device_put prefetcher so the next batch's H2D transfer overlaps with the
current step's compute (the reference instead did per-tensor .to(gpu) inside
the model forward — on the critical path)."""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax

from ..core.registry import DATASETS


def concatenate_subfolders(base_folder: str, dataset_type: str, event_folder: str,
                           depth_folder: str, frame_folder: str, sequence_length: int,
                           transform=None, proba_pause_when_running: float = 0.0,
                           proba_pause_when_paused: float = 0.0, step_size: int = 1,
                           clip_distance: float = 100.0, every_x_rgb_frame: int = 1,
                           normalize: bool = True, scale_factor: float = 1.0,
                           use_phased_arch: bool = False, baseline=False,
                           loss_composition=False, reg_factor: float = 5.7,
                           recurrency: bool = True, load_semantic: bool = False,
                           ) -> "ConcatSequenceDataset":
    """One dataset per sequence-subfolder, concatenated (train.py:37-75)."""
    cls = DATASETS.get(dataset_type)
    subfolders = sorted(os.listdir(base_folder))
    datasets = []
    for name in subfolders:
        datasets.append(cls(
            base_folder=join(base_folder, name), event_folder=event_folder,
            depth_folder=depth_folder, frame_folder=frame_folder,
            sequence_length=sequence_length, transform=transform,
            proba_pause_when_running=proba_pause_when_running,
            proba_pause_when_paused=proba_pause_when_paused,
            step_size=step_size, clip_distance=clip_distance,
            every_x_rgb_frame=every_x_rgb_frame, normalize=normalize,
            scale_factor=scale_factor, use_phased_arch=use_phased_arch,
            baseline=baseline, loss_composition=loss_composition,
            reg_factor=reg_factor, recurrency=recurrency,
            load_semantic=load_semantic))
    return ConcatSequenceDataset(datasets)


class ConcatSequenceDataset:
    """Concatenation that also reports which sub-dataset an index fell in
    (the reference's ConcatDatasetCustom, train.py:23-34) — the dataset_idx
    drives recurrent-state reset at sequence boundaries in streaming
    inference (test.py:215-223)."""

    def __init__(self, datasets: Sequence):
        self.datasets = [d for d in datasets if len(d) > 0]
        self.cumulative = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self) -> int:
        return self.cumulative[-1] if self.cumulative else 0

    def locate(self, idx: int) -> Tuple[int, int]:
        if idx < 0:
            idx += len(self)
        d = int(np.searchsorted(self.cumulative, idx, side="right"))
        prev = self.cumulative[d - 1] if d > 0 else 0
        return d, idx - prev

    def __getitem__(self, idx: int):
        d, local = self.locate(idx)
        return self.datasets[d][local], d

    def get(self, idx: int, seed: Optional[int] = None):
        d, local = self.locate(idx)
        return self.datasets[d].__getitem__(local, seed), d


def _stack_items(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items]) for k in keys}


# --- process-worker plumbing (module-level so it pickles under 'spawn') ---
_WORKER_DATASET = None


def _proc_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _proc_load_item(idx: int, seed: int):
    return _WORKER_DATASET.get(int(idx), seed=seed)[0]


class BatchLoader:
    """Shuffled epoch iterator over a ConcatSequenceDataset producing
    batched numpy dicts ('events' [B,L,K,H,W,C], 'image' [B,L,H,W,C], ...).

    num_workers workers prefetch items; drop_last semantics match torch's
    default (False) unless requested.

    worker_mode: 'thread' (default; decode is numpy/PIL which release the
    GIL for the heavy parts) or 'process' (the reference's DataLoader uses
    4 process workers, train.py:192-196 — use this when per-item Python
    overhead, not IO, is the bottleneck on many-core hosts).  Batches are
    bit-identical across modes (same per-(seed, epoch, index) augmentation
    seeds)."""

    def __init__(self, dataset: ConcatSequenceDataset, batch_size: int,
                 shuffle: bool = True, num_workers: int = 4,
                 drop_last: bool = False, seed: int = 0,
                 worker_mode: str = "thread"):
        assert worker_mode in ("thread", "process"), worker_mode
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.worker_mode = worker_mode
        self.epoch = 0
        self._proc_pool = None

    def _get_proc_pool(self):
        """Long-lived spawn pool (fork is unsafe once jax/XLA threads
        exist); the dataset ships once via the initializer."""
        if self._proc_pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            self._proc_pool = ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("spawn"),
                initializer=_proc_worker_init, initargs=(self.dataset,))
        return self._proc_pool

    def close(self):
        if self._proc_pool is not None:
            self._proc_pool.shutdown()
            self._proc_pool = None

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Pin the shuffle/augmentation epoch (torch DistributedSampler-style);
        the trainer calls this so --resume reproduces the exact data order."""
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        batches = [order[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        epoch = self.epoch  # snapshot (self.epoch already advanced)

        def item_seed(i):
            # deterministic per-(seed, epoch, index) augmentation seed:
            # reproducible epochs, no shared global RNG across workers;
            # PYTHONHASHSEED-independent so thread/process modes agree
            import zlib
            return zlib.crc32(f"{self.seed}/{epoch}/{int(i)}".encode()) & 0x7FFFFFFF

        def run(pool, submit):
            depth = 2  # batches in flight

            def schedule(idxs):
                return [submit(pool, int(i), item_seed(i)) for i in idxs]

            it = iter(batches)
            inflight = []
            for _ in range(depth):
                b = next(it, None)
                if b is not None:
                    inflight.append(schedule(b))
            while inflight:
                futs = inflight.pop(0)
                b = next(it, None)
                if b is not None:
                    inflight.append(schedule(b))
                yield _stack_items([f.result() for f in futs])

        if self.worker_mode == "process":
            pool = self._get_proc_pool()
            yield from run(pool, lambda p, i, s: p.submit(_proc_load_item, i, s))
        else:
            with ThreadPoolExecutor(self.num_workers) as pool:
                yield from run(
                    pool,
                    lambda p, i, s: p.submit(
                        lambda ii, ss: self.dataset.get(ii, seed=ss)[0], i, s))


def device_prefetch(iterator: Iterator, size: int = 2, sharding=None,
                    put_fn: Optional[Callable] = None):
    """Double-buffered host->device pipeline: device_put the next `size`
    batches while the consumer computes on the current one.  put_fn
    overrides placement (e.g. parallel.shard_batch for per-key specs)."""
    buf: List[Any] = []

    def put(batch):
        if put_fn is not None:
            return put_fn(batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if sharding is not None
            else jax.device_put(x), batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = None
        try:
            nxt = put(next(it))
        except StopIteration:
            pass
        cur = buf.pop(0)
        if nxt is not None:
            buf.append(nxt)
        yield cur
