"""Multi-host input pipeline: per-host data sharding.

No reference counterpart (the reference is single-process, single-GPU;
SURVEY.md §2.5).  On a multi-host TPU pod each process loads only its shard
of the sequence folders and assembles a globally-sharded batch; on a single
host this degrades to the plain loader.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_sequence_folders(folders: Sequence[str],
                           process_index: int = None,
                           process_count: int = None) -> List[str]:
    """Deterministic round-robin split of sequence subfolders across hosts.
    Every host must call with the same sorted folder list."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    folders = sorted(folders)
    return [f for i, f in enumerate(folders) if i % pc == pi]


def per_host_batch_size(global_batch: int, process_count: int = None) -> int:
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (global_batch, pc)
    return global_batch // pc


def make_global_batch(local_batch, mesh: Mesh):
    """Assemble a globally batch-sharded array tree from per-process local
    batches (jax.make_array_from_process_local_data handles the host->device
    placement so that the global leading dim is sharded over 'data')."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, local_batch)


def sharded_prefetch(iterator: Iterator, mesh: Mesh, size: int = 2):
    """Double-buffered global-batch prefetch over the mesh."""
    buf = []
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(make_global_batch(next(it), mesh))
    except StopIteration:
        pass
    while buf:
        nxt = None
        try:
            nxt = make_global_batch(next(it), mesh)
        except StopIteration:
            pass
        cur = buf.pop(0)
        if nxt is not None:
            buf.append(nxt)
        yield cur
