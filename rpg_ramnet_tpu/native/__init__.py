"""Native host-side kernels (C++ via ctypes), with transparent build-on-
first-use and pure-numpy fallback.

The reference has no native components (SURVEY.md §2: 100% Python); these
exist because the host data path (event decode + voxelize in loader
workers) is CPU-bound and the reference's np.add.at implementation runs at
~1 Mev/s on this host.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_voxelize.cc")
_LIB = os.path.join(_DIR, "libramnet_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-pthread", "-o", _LIB, _SRC], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.ramnet_voxelize_f32.restype = ctypes.c_int
        lib.ramnet_voxelize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.ramnet_voxelize_f32_mt.restype = ctypes.c_int
        lib.ramnet_voxelize_f32_mt.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.ramnet_normalize_nonzero_f32.restype = ctypes.c_int
        lib.ramnet_normalize_nonzero_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.ramnet_parse_events_txt.restype = ctypes.c_int64
        lib.ramnet_parse_events_txt.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def voxelize_native(events: np.ndarray, num_bins: int, height: int,
                    width: int, normalize: bool = False,
                    threads: int = 1) -> Optional[np.ndarray]:
    """Native host voxelizer; returns None if the library is unavailable.
    threads: 1 = serial (bit-exact np.add.at order); 0 = all cores, N = N
    threads (per-thread partial grids + parallel reduce; same values,
    reassociated float summation order)."""
    lib = load_native()
    if lib is None:
        return None
    ev = np.ascontiguousarray(events, np.float32)
    out = np.empty(num_bins * height * width, np.float32)
    if threads == 1:
        lib.ramnet_voxelize_f32(_fptr(ev), ev.shape[0], num_bins, height,
                                width, _fptr(out))
    else:
        # 0 = hardware concurrency; kernel falls back to serial below 128K
        # events (thread spawn + reduce overheads dominate there)
        lib.ramnet_voxelize_f32_mt(_fptr(ev), ev.shape[0], num_bins, height,
                                   width, _fptr(out), threads)
    if normalize:
        lib.ramnet_normalize_nonzero_f32(_fptr(out), out.size)
    return out.reshape(num_bins, height, width)


def parse_events_txt_native(data: bytes, max_rows: int) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    out = np.empty((max_rows, 4), np.float32)
    n = lib.ramnet_parse_events_txt(data, len(data), _fptr(out), max_rows)
    if n < 0:
        return None
    return out[:n]
