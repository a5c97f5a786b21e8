"""Spatial gradients + pooling for the multi-scale gradient loss.

The reference uses kornia's sobel spatial_gradient (model/loss.py:51):
3x3 sobel kernels normalized by their L1 mass (/8), applied with replicate
padding, returning x- and y-derivatives per channel.  We implement the same
math directly in NHWC (kornia is not a dependency here).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_SOBEL_X = np.array([[-1., 0., 1.],
                     [-2., 0., 2.],
                     [-1., 0., 1.]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def spatial_gradient(x):
    """x: [N, H, W, C] -> (gx, gy) each [N, H, W, C].

    Matches kornia.filters.spatial_gradient(mode='sobel', order=1,
    normalized=True): replicate padding, cross-correlation.
    """
    c = x.shape[-1]
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k = jnp.stack([jnp.asarray(_SOBEL_X), jnp.asarray(_SOBEL_Y)], axis=-1)  # [3,3,2]
    # depthwise conv: kernel [3,3,1,2c], per-group output order (gx, gy)
    kern = jnp.tile(k[:, :, None, :], (1, 1, 1, c)).astype(x.dtype)
    y = lax.conv_general_dilated(
        pad, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    # output channels are [c0_gx, c0_gy, c1_gx, c1_gy, ...]
    y = y.reshape(y.shape[:3] + (c, 2))
    return y[..., 0], y[..., 1]


def avg_pool(x, k: int):
    """torch nn.AvgPool2d(k, stride=k) on NHWC (floor mode, no padding).
    Non-overlapping windows -> reshape+mean (differentiable, MXU-free).
    NaNs propagate through the window mean exactly as in torch."""
    if k == 1:
        return x
    n, h, w, c = x.shape
    hh, ww = h // k, w // k
    x = x[:, :hh * k, :ww * k, :]
    return x.reshape(n, hh, k, ww, k, c).mean(axis=(2, 4))


def sobel_magnitude(x, eps: float = 1e-6):
    """kornia.filters.sobel equivalent (gradient magnitude), used by the
    reference's grad-loss preview mode (model/loss.py:48)."""
    gx, gy = spatial_gradient(x)
    return jnp.sqrt(gx * gx + gy * gy + eps)
