"""Data pipeline tests on synthetic sequences written in the reference's
on-disk formats (EventScape + MVSEC naming)."""
import numpy as np
import pytest

from rpg_ramnet_tpu import data as D
from rpg_ramnet_tpu.data.synthetic import generate_split, generate_eventscape_sequence


@pytest.fixture(scope="module")
def es_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("es") / "train"
    generate_split(str(root), n_sequences=2, n_frames=30, height=48, width=64)
    return str(root)


@pytest.fixture(scope="module")
def mvsec_seq(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvsec_data") / "mvsec_outdoor"
    generate_eventscape_sequence(str(root), n_frames=20, height=48, width=64, mvsec=True)
    return str(root)


def make_seq_dataset(folder, **kw):
    args = dict(
        base_folder=folder, event_folder="events/voxels",
        depth_folder="depth/data", frame_folder="rgb/data",
        sequence_length=3, step_size=1, clip_distance=80.0,
        every_x_rgb_frame=5, reg_factor=3.70378, normalize=True)
    args.update(kw)
    return D.SequenceSynchronizedFramesEventsDataset(**args)


def test_voxel_grid_dataset_loads(es_split):
    ds = D.VoxelGridDataset(es_split + "/seq00", "events/voxels")
    assert len(ds) == 30
    g = ds[0]
    assert g.shape == (48, 64, 5)
    nz = g[g != 0]
    assert abs(nz.mean()) < 1e-3 and abs(nz.std() - 1.0) < 1e-2  # normalized


def test_package_contract(es_split):
    ds = D.SynchronizedFramesEventsDataset(
        es_split + "/seq00", "events/voxels", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378)
    item = ds[0]
    assert item["events"].shape == (5, 48, 64, 5)
    assert item["image"].shape == (48, 64, 1)
    assert item["depth_events"].shape == (5, 48, 64, 1)
    assert item["depth_image"].shape == (48, 64, 1)
    assert np.all(item["depth_image"] >= 0) and np.all(item["depth_image"] <= 1)
    # depth of last event step == depth of image step (same frame index)
    np.testing.assert_array_equal(item["depth_events"][-1], item["depth_image"])


def test_sequence_windowing(es_split):
    ds = make_seq_dataset(es_split + "/seq00")
    # 30 event steps, K=5, L=3: (30 - 15) // 1 // 5 + 1 = 4 windows
    assert len(ds) == 4
    seq = ds[0]
    assert seq["events"].shape == (3, 5, 48, 64, 5)
    assert seq["image"].shape == (3, 48, 64, 1)


def test_shared_seed_augmentation(es_split):
    t = D.Compose([D.RandomRotationFlip(0.0, 1.0, 0.0), D.RandomCrop(32)])
    ds = make_seq_dataset(es_split + "/seq00", transform=t)
    seq = ds.__getitem__(0, seed=7)
    seq2 = ds.__getitem__(0, seed=7)
    np.testing.assert_array_equal(seq["events"], seq2["events"])  # deterministic
    assert seq["events"].shape[2:] == (32, 32, 5)
    # same crop/flip across modalities: flipped depth of image step equals
    # flipped depth of last event step
    np.testing.assert_array_equal(seq["depth_events"][:, -1], seq["depth_image"])


def test_pause_augmentation(es_split):
    ds = make_seq_dataset(es_split + "/seq00", proba_pause_when_running=1.0,
                          proba_pause_when_paused=1.0)
    seq = ds.__getitem__(0, seed=3)
    # every step after the first is a pause: zero events, repeated frame
    assert np.all(seq["events"][1:] == 0)
    np.testing.assert_array_equal(seq["image"][1], seq["image"][0])


def test_loader_determinism(es_split):
    """Same loader seed + epoch -> identical batches (reproducible runs)."""
    t = D.Compose([D.RandomRotationFlip(0.0, 0.5, 0.0), D.RandomCrop(32)])
    concat = D.concatenate_subfolders(
        es_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=2, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378,
        transform=t)
    l1 = D.BatchLoader(concat, batch_size=3, shuffle=True, num_workers=2, seed=42)
    l2 = D.BatchLoader(concat, batch_size=3, shuffle=True, num_workers=2, seed=42)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["events"], b2["events"])
    np.testing.assert_array_equal(b1["image"], b2["image"])


def test_concat_and_loader(es_split):
    concat = D.concatenate_subfolders(
        es_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=3, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378)
    assert len(concat) == 8
    item, d_idx = concat[5]
    assert d_idx == 1
    loader = D.BatchLoader(concat, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["events"].shape == (4, 3, 5, 48, 64, 5)
    # device prefetch wrapper
    dev_batches = list(D.device_prefetch(iter(batches)))
    assert len(dev_batches) == 2
    assert dev_batches[0]["image"].shape == batches[0]["image"].shape


def test_mvsec_naming_and_quirks(mvsec_seq):
    ds = D.SynchronizedFramesEventsDataset(
        mvsec_seq, "events/voxels", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=1, reg_factor=3.70378)
    # mvsec: event stream drops last element, depth stamps drop first
    assert len(ds.event_dataset) == 19
    item = ds[1]
    assert item["image"].shape == (48, 64, 1)
    assert item["events"].shape == (1, 48, 64, 5)


def test_baseline_packing(es_split):
    # ergb0: events are voxel+gray 6ch; image is voxel+gray 6ch
    ds = D.SynchronizedFramesEventsDataset(
        es_split + "/seq00", "events/voxels", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378,
        baseline="ergb0")
    item = ds[2]
    assert item["events"].shape == (4, 48, 64, 6)
    assert item["image"].shape == (48, 64, 6)
    # rgb: image only
    ds = D.SynchronizedFramesEventsDataset(
        es_split + "/seq00", "events/voxels", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378,
        baseline="rgb")
    item = ds[0]
    assert item["image"].shape == (48, 64, 1)
    assert item["events"].shape[0] == 0
    # e with image loss: K-1 event slots, image = last voxel
    ds = D.SynchronizedFramesEventsDataset(
        es_split + "/seq00", "events/voxels", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378,
        baseline="e", loss_composition="image")
    item = ds[0]
    assert item["events"].shape == (4, 48, 64, 5)
    assert item["image"].shape == (48, 64, 5)


def test_raw_events_nonrecurrent_package(es_split):
    ds = D.SynchronizedFramesEventsRawDataset(
        es_split + "/seq00", "events/data", "depth/data", "rgb/data",
        clip_distance=80.0, every_x_rgb_frame=5, reg_factor=3.70378)
    item = ds[0]
    assert item["image"].shape == (48, 64, 6)  # 5 voxel bins + gray
    assert item["depth_image"].shape == (48, 64, 1)


def test_process_workers_match_thread_workers(tmp_path):
    """worker_mode='process' (the reference's DataLoader used 4 process
    workers, train.py:192-196) must produce bit-identical batches to the
    thread mode — same per-(seed, epoch, index) augmentation seeds."""
    from rpg_ramnet_tpu.data.synthetic import generate_split
    root = str(tmp_path / "pw")
    generate_split(root, n_sequences=2, n_frames=14, height=32, width=48,
                   events_per_frame=150)
    def make(mode):
        ds = D.concatenate_subfolders(
            root, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
            "depth/data", "rgb/data", sequence_length=2, step_size=2,
            clip_distance=80.0, every_x_rgb_frame=2, reg_factor=3.70378,
            transform=D.CenterCrop(32))
        return D.BatchLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                             seed=11, worker_mode=mode)
    lt, lp = make("thread"), make("process")
    try:
        for bt, bp in zip(lt, lp):
            assert set(bt) == set(bp)
            for k in bt:
                np.testing.assert_array_equal(bt[k], bp[k], err_msg=k)
    finally:
        lp.close()
