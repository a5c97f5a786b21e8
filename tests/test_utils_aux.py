"""Tests for auxiliary subsystems: timers, event readers, preprocessor,
filters, training utils (SURVEY.md §5 parity)."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.utils import (Timer, DeviceTimer, count_parameters,
                                  select_evenly_spaced_elements, flow2rgb,
                                  plot_grad_flow_bars)
from rpg_ramnet_tpu.utils import timers as timers_mod
from rpg_ramnet_tpu.utils.event_readers import (FixedSizeEventReader,
                                                FixedDurationEventReader)
from rpg_ramnet_tpu.ops.event_preprocess import EventPreprocessor
from rpg_ramnet_tpu.eval.filters import UnsharpMaskFilter, gaussian_blur


def test_timers_accumulate():
    with Timer("unit_test_timer"):
        pass
    with DeviceTimer("unit_test_device_timer") as t:
        t.sync(jnp.zeros(4) + 1)
    assert len(timers_mod.timers["unit_test_timer"]) == 1
    assert len(timers_mod.timers["unit_test_device_timer"]) == 1


def test_event_readers(tmp_path):
    rng = np.random.RandomState(0)
    n = 500
    t = np.sort(rng.uniform(0, 1.0, n))
    lines = ["1000 720 1280\n"] + [
        f"{t[i]:.6f} {rng.randint(0, 100)} {rng.randint(0, 80)} {rng.randint(0, 2)}\n"
        for i in range(n)]
    path = str(tmp_path / "events.txt")
    with open(path, "w") as f:
        f.writelines(lines)

    windows = list(FixedSizeEventReader(path, num_events=100))
    assert len(windows) == 5
    assert windows[0].shape == (100, 4)

    dur_windows = list(FixedDurationEventReader(path, duration_ms=200.0))
    assert len(dur_windows) >= 3
    for w in dur_windows:
        assert w.shape[1] == 4


def test_event_preprocessor():
    rng = np.random.RandomState(1)
    ev = rng.randn(8, 10, 5).astype(np.float32)
    ev[np.abs(ev) < 0.5] = 0
    pre = EventPreprocessor(no_normalize=False, flip=True,
                            hot_pixel_locations=np.array([[2, 3], [4, 1]]))
    out = np.asarray(pre(jnp.asarray(ev)))
    assert out.shape == ev.shape
    # hot pixels zeroed before the flip: pixel (y=3,x=2) maps to flipped pos
    flipped = out[::-1, ::-1, :]
    assert np.all(flipped[3, 2, :] == 0) and np.all(flipped[1, 4, :] == 0)
    nz = out[out != 0]
    assert abs(nz.mean()) < 1e-3 and abs(nz.std() - 1) < 1e-2


def test_unsharp_mask_and_blur():
    import scipy.ndimage as ndi
    rng = np.random.RandomState(2)
    img = rng.rand(1, 16, 18, 1).astype(np.float32)
    blurred = np.asarray(gaussian_blur(jnp.asarray(img), 1.0))
    ref = ndi.gaussian_filter(img[0, :, :, 0], 1.0, mode="nearest", truncate=3.5)
    np.testing.assert_allclose(blurred[0, :, :, 0], ref, atol=2e-3)
    f = UnsharpMaskFilter(0.3, 1.0)
    out = np.asarray(f(jnp.asarray(img)))
    np.testing.assert_allclose(out, (1.3 * img - 0.3 * blurred), atol=1e-5)


def test_training_utils():
    assert select_evenly_spaced_elements(2, 10) == [2, 7]
    params = {"a": np.zeros((3, 4)), "b": [np.zeros(5)]}
    assert count_parameters(params) == 17
    rgb = flow2rgb(np.ones((8, 8)), np.zeros((8, 8)))
    assert rgb.shape == (3, 8, 8)
    grads = {"layer": {"weight": np.full((3, 3), 0.1), "bias": np.zeros(3)}}
    fig = plot_grad_flow_bars(grads)
    assert fig is not None
