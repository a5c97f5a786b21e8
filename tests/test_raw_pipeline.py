"""Device-side voxelization pipeline: padded raw events voxelized on device
must equal the host numpy voxelizer; the prefetch stage feeds the model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.data.raw_pipeline import (
    bucket_size, pad_event_windows, voxelize_batch, RawEventSequenceDataset,
    device_voxelize_prefetch)
from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
from rpg_ramnet_tpu.ops import events_to_voxel_grid_np, normalize_voxel_grid_np


def test_bucketing():
    assert bucket_size(1) == 2048
    assert bucket_size(2048) == 2048
    assert bucket_size(2049) == 8192
    assert bucket_size(600000) == 1048576


def test_voxelize_batch_matches_host():
    rng = np.random.RandomState(0)
    H, W, NB = 24, 32, 5
    windows = []
    for i in range(6):
        n = rng.randint(100, 900)
        t = np.sort(rng.uniform(0, 0.01, n))
        w = np.stack([t, rng.randint(0, W, n).astype(float),
                      rng.randint(0, H, n).astype(float),
                      rng.randint(0, 2, n).astype(float)], 1)
        windows.append(w.astype(np.float32))
    padded, counts = pad_event_windows(windows)
    grids = np.asarray(voxelize_batch(
        jnp.asarray(padded.reshape(2, 3, -1, 4)),
        jnp.asarray(counts.reshape(2, 3)),
        num_bins=NB, height=H, width=W, normalize=True))
    assert grids.shape == (2, 3, H, W, NB)
    for i, w in enumerate(windows):
        host = normalize_voxel_grid_np(
            events_to_voxel_grid_np(w.astype(np.float64), NB, H, W))
        np.testing.assert_allclose(grids.reshape(6, H, W, NB)[i],
                                   np.moveaxis(host, 0, -1),
                                   atol=2e-3, rtol=1e-3)


@pytest.fixture(scope="module")
def seq_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("rawpipe") / "seq00"
    generate_eventscape_sequence(str(root), n_frames=20, height=24, width=32,
                                 events_per_frame=300)
    return str(root)


def test_raw_sequence_dataset_and_prefetch(seq_folder):
    ds = RawEventSequenceDataset(seq_folder, "events/voxels",
                                 sequence_length=2, step_size=1,
                                 clip_distance=80.0, every_x_rgb_frame=5,
                                 reg_factor=3.70378)
    assert len(ds) > 0
    item = ds[0]
    assert item["events_raw"].shape[:2] == (2, 5)
    assert item["events_count"].shape == (2, 5)
    assert item["image"].shape == (2, 24, 32, 1)

    # batched prefetch -> model-ready dict
    batch = {k: v[None] for k, v in item.items()}
    out = list(device_voxelize_prefetch(iter([batch]), num_bins=5,
                                        height=24, width=32))
    assert len(out) == 1
    ev = np.asarray(out[0]["events"])
    assert ev.shape == (1, 2, 5, 24, 32, 5)
    assert np.all(np.isfinite(ev)) and np.any(ev != 0)
    assert "events_raw" not in out[0]
