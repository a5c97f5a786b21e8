"""Additional coverage: evaluation --rescale, event previews, intensity
rescaler, dataset scale_factor downsampling."""
import numpy as np
import pytest

from rpg_ramnet_tpu.eval.evaluation import rescale_by_the_median
from rpg_ramnet_tpu.eval.writers import make_event_preview, IntensityRescaler


def test_rescale_by_the_median_aligns_medians():
    rng = np.random.RandomState(0)
    target = rng.uniform(5, 50, 1000)
    pred = target * 3.7 + 2.0 + rng.randn(1000) * 0.1
    t2, p2 = rescale_by_the_median(target.copy(), pred.copy())
    np.testing.assert_allclose(np.median(t2), np.median(p2), atol=1e-9)
    assert np.min(t2) >= -1e-9 and np.min(p2) >= -1e-9


def test_make_event_preview():
    rng = np.random.RandomState(1)
    ev = rng.randn(16, 20, 5).astype(np.float32)
    img = make_event_preview(ev, mode="red-blue")
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    s = ev.sum(axis=-1)
    assert np.all(img[s > 0, 2] == 255) and np.all(img[s > 0, 0] == 0)
    assert np.all(img[s < 0, 0] == 255)
    gray = make_event_preview(ev, mode="grayscale")
    assert gray.shape == (16, 20) and gray.dtype == np.uint8


def test_intensity_rescaler():
    rng = np.random.RandomState(2)
    img = rng.uniform(10, 30, (32, 32)).astype(np.float32)
    r = IntensityRescaler(auto_hdr=True)
    out = r(img)
    assert out.min() >= 0 and out.max() <= 1
    assert out.max() - out.min() > 0.9  # stretched to the full range
    fixed = IntensityRescaler(auto_hdr=False, imin=0.0, imax=40.0)
    np.testing.assert_allclose(fixed(img), img / 40.0, atol=1e-6)


def test_dataset_scale_factor(tmp_path):
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    from rpg_ramnet_tpu.data import SequenceSynchronizedFramesEventsDataset
    root = tmp_path / "seq"
    generate_eventscape_sequence(str(root), n_frames=15, height=32, width=48,
                                 events_per_frame=200)
    ds = SequenceSynchronizedFramesEventsDataset(
        base_folder=str(root), event_folder="events/voxels",
        depth_folder="depth/data", frame_folder="rgb/data",
        sequence_length=2, step_size=1, clip_distance=80.0,
        every_x_rgb_frame=3, reg_factor=3.70378, scale_factor=0.5)
    item = ds[0]
    assert item["events"].shape == (2, 3, 16, 24, 5)
    assert item["image"].shape == (2, 16, 24, 1)
    assert item["depth_image"].shape == (2, 16, 24, 1)
    assert np.all(np.isfinite(item["image"]))
