"""Multi-host input pipeline + mesh helpers (single-process degenerate path
plus pure-logic splits)."""
import numpy as np

import jax

from rpg_ramnet_tpu.parallel import (
    make_mesh, shard_sequence_folders, per_host_batch_size, make_global_batch,
    sharded_prefetch,
)


def test_folder_sharding_logic():
    folders = [f"seq{i:02d}" for i in range(7)]
    shards = [shard_sequence_folders(folders, pi, 3) for pi in range(3)]
    # disjoint and complete
    flat = sorted(sum(shards, []))
    assert flat == sorted(folders)
    assert all(len(s) >= 2 for s in shards)


def test_per_host_batch_size():
    assert per_host_batch_size(8, 4) == 2
    assert per_host_batch_size(8, 1) == 8


def test_make_global_batch_single_process():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = make_global_batch(batch, mesh)
    assert g["x"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    # sharded over the data axis
    assert len(g["x"].sharding.device_set) == mesh.devices.size


def test_sharded_prefetch():
    mesh = make_mesh()
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(sharded_prefetch(iter(batches), mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
