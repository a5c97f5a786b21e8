"""Event tensor preprocessing for the streaming demo path.

Capability reference: RAM_Net/utils/event_tensor_utils.py:6-68
(EventPreprocessor: hot-pixel removal, horizontal+vertical flip, fast
nonzero mean/std normalization).  Implemented as a jit-friendly NHWC device
op: the hot-pixel mask is a precomputed multiplicative tensor, the flip is a
reversal of both spatial axes, normalization reuses ops.normalize_voxel_grid.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .voxel import normalize_voxel_grid


class EventPreprocessor:
    """Callable on [B, H, W, C] (or [H, W, C]) event voxel tensors."""

    def __init__(self, no_normalize: bool = False, flip: bool = False,
                 hot_pixels_file: Optional[str] = None,
                 hot_pixel_locations: Optional[np.ndarray] = None):
        self.no_normalize = no_normalize
        self.flip = flip
        self.hot_pixel_locations = np.zeros((0, 2), np.int64)
        if hot_pixel_locations is not None:
            self.hot_pixel_locations = np.asarray(hot_pixel_locations, np.int64)
        elif hot_pixels_file:
            try:
                self.hot_pixel_locations = np.loadtxt(
                    hot_pixels_file, delimiter=",").astype(np.int64).reshape(-1, 2)
            except IOError:
                print(f"WARNING: could not load hot pixels file: {hot_pixels_file}")
        self._mask = None

    def _hot_pixel_mask(self, h: int, w: int) -> Optional[jnp.ndarray]:
        if self.hot_pixel_locations.shape[0] == 0:
            return None
        if self._mask is None or self._mask.shape[:2] != (h, w):
            m = np.ones((h, w, 1), np.float32)
            for x, y in self.hot_pixel_locations:
                m[y, x, 0] = 0.0
            self._mask = jnp.asarray(m)
        return self._mask

    def __call__(self, events):
        squeeze = events.ndim == 3
        if squeeze:
            events = events[None]
        h, w = events.shape[1], events.shape[2]
        mask = self._hot_pixel_mask(h, w)
        if mask is not None:
            events = events * mask[None]
        if self.flip:
            events = jnp.flip(events, axis=(1, 2))
        if not self.no_normalize:
            events = jax.vmap(normalize_voxel_grid)(events)
        return events[0] if squeeze else events
