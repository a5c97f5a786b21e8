"""Post-processing filters for inference outputs.

Capability reference: RAM_Net/utils/inference_utils.py
(UnsharpMaskFilter:234-257 — gaussian unsharp masking; ImageFilter:258-276 —
bilateral smoothing).  The unsharp mask runs on-device (separable gaussian
conv, NHWC); the bilateral filter is host-side cv2 (edge-aware, not a conv).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(sigma: float, radius: Optional[int] = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x, sigma: float):
    """Separable gaussian blur on [N, H, W, C] with replicate padding."""
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2
    c = x.shape[-1]
    pad = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)), mode="edge")
    kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c)).astype(x.dtype)
    x = lax.conv_general_dilated(pad, kv, (1, 1), "VALID",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                 feature_group_count=c)
    pad = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)), mode="edge")
    kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(pad, kh, (1, 1), "VALID",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                    feature_group_count=c)


class UnsharpMaskFilter:
    """out = (1 + amount) * img - amount * gaussian_blur(img)."""

    def __init__(self, unsharp_mask_amount: float = 0.3,
                 unsharp_mask_sigma: float = 1.0):
        self.amount = unsharp_mask_amount
        self.sigma = unsharp_mask_sigma
        self._fn = jax.jit(lambda x: (1.0 + self.amount) * x
                           - self.amount * gaussian_blur(x, self.sigma))

    def __call__(self, img):
        if self.amount <= 0:
            return img
        squeeze = img.ndim == 3
        out = self._fn(img[None] if squeeze else img)
        return out[0] if squeeze else out


class ImageFilter:
    """Host-side bilateral filter (cv2), sigma<=0 disables."""

    def __init__(self, bilateral_filter_sigma: float = 0.0):
        self.sigma = bilateral_filter_sigma

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.sigma <= 0:
            return img
        import cv2
        filtered = cv2.bilateralFilter(np.asarray(img, np.float32), d=5,
                                       sigmaColor=25.0 * self.sigma,
                                       sigmaSpace=25.0 * self.sigma)
        return filtered
