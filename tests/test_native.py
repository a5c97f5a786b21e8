"""Native C++ host kernels: builds via g++, matches the numpy semantics."""
import time
import numpy as np
import pytest

from rpg_ramnet_tpu import ops
from rpg_ramnet_tpu.native import load_native, voxelize_native, parse_events_txt_native


pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native toolchain unavailable")


def _events(n=20000, h=40, w=60, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0, 0.05, n))
    return np.stack([t, rng.randint(0, w, n).astype(float),
                     rng.randint(0, h, n).astype(float),
                     rng.randint(0, 2, n).astype(float)], 1).astype(np.float32)


def test_native_voxelize_matches_numpy():
    ev = _events()
    a = voxelize_native(ev, 5, 40, 60)
    b = ops.events_to_voxel_grid_np(ev.astype(np.float64), 5, 40, 60)
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)


def test_native_normalize_matches_numpy():
    ev = _events(seed=1)
    a = voxelize_native(ev, 5, 40, 60, normalize=True)
    b = ops.normalize_voxel_grid_np(
        ops.events_to_voxel_grid_np(ev.astype(np.float64), 5, 40, 60))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_native_faster_than_numpy():
    ev = _events(n=400000, seed=2)
    t0 = time.perf_counter()
    ops.events_to_voxel_grid_np(ev.astype(np.float64).copy(), 5, 40, 60)
    np_sec = time.perf_counter() - t0
    voxelize_native(ev, 5, 40, 60)  # warm
    t0 = time.perf_counter()
    voxelize_native(ev, 5, 40, 60)
    native_sec = time.perf_counter() - t0
    assert native_sec < np_sec, (native_sec, np_sec)


def test_native_txt_parser():
    ev = _events(n=100, seed=3)
    text = "".join(f"{r[0]:.6f} {int(r[1])} {int(r[2])} {int(r[3])}\n" for r in ev)
    parsed = parse_events_txt_native(text.encode(), 200)
    assert parsed is not None and parsed.shape == (100, 4)
    np.testing.assert_allclose(parsed[:, 1:], ev[:, 1:], atol=0)
    np.testing.assert_allclose(parsed[:, 0], ev[:, 0], atol=1e-5)


def test_host_dispatcher_uses_native():
    ev = _events(n=5000, seed=4)
    a = ops.events_to_voxel_grid_host(ev, 5, 40, 60, normalize=True)
    b = ops.normalize_voxel_grid_np(
        ops.events_to_voxel_grid_np(ev.astype(np.float64), 5, 40, 60))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_native_voxelize_mt_matches_serial():
    """Multi-threaded native voxelizer (per-thread partial grids + parallel
    reduce) == serial within float reassociation, incl. above the 128K
    serial-fallback threshold."""
    if load_native() is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    n = 300_000
    t = np.sort(rng.uniform(0, 0.05, n))
    ev = np.stack([t, rng.randint(0, 60, n).astype(float),
                   rng.randint(0, 40, n).astype(float),
                   rng.randint(0, 2, n).astype(float)], 1).astype(np.float32)
    a = voxelize_native(ev, 5, 40, 60, threads=1)
    for nt in (0, 2, 4):
        b = voxelize_native(ev, 5, 40, 60, threads=nt)
        np.testing.assert_allclose(b, a, atol=1e-3, rtol=1e-5)
