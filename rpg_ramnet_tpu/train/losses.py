"""Training losses (NaN-masked, jit-friendly).

Reference: RAM_Net/model/loss.py.  TPU has no boolean advanced indexing, so
the NaN masking (`x[~isnan]`) becomes `where` + valid-count division; the
exact scalings of the reference are preserved (notably the multi-scale
gradient loss's `* batch * 2 / num_scales`, loss.py:55,63).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..core.registry import LOSSES
from ..ops.gradient import spatial_gradient, avg_pool


def _nanmean(x, mask):
    n = jnp.sum(mask)
    s = jnp.sum(jnp.where(mask, x, 0.0))
    return s / jnp.maximum(n, 1)


@LOSSES.register("scale_invariant_loss")
def scale_invariant_loss(y_input, y_target, weight: float = 1.0, n_lambda: float = 1.0):
    """weight * (mean(d^2) - n_lambda * mean(d)^2), d = input - target over
    non-NaN entries (loss.py:6-9)."""
    d = y_input - y_target
    ok = ~jnp.isnan(d)
    d = jnp.where(ok, d, 0.0)
    m2 = _nanmean(d * d, ok)
    m1 = _nanmean(d, ok)
    return weight * (m2 - n_lambda * m1 * m1)


@LOSSES.register("scale_invariant_log_loss")
def scale_invariant_log_loss(y_input, y_target, n_lambda: float = 1.0):
    """SI loss on log values (loss.py:12-15)."""
    d = jnp.log(y_input) - jnp.log(y_target)
    ok = ~jnp.isnan(d)
    d = jnp.where(ok, d, 0.0)
    return _nanmean(d * d, ok) - n_lambda * _nanmean(d, ok) ** 2


@LOSSES.register("mse_loss")
def mse_loss(y_input, y_target):
    """MSE over entries where the target is not NaN (loss.py:18-19)."""
    ok = ~jnp.isnan(y_target)
    d = jnp.where(ok, y_input - y_target, 0.0)
    return _nanmean(d * d, ok)


def multi_scale_grad_loss(prediction, target, start_scale: int = 1,
                          num_scales: int = 4):
    """Multi-scale gradient matching loss (loss.py:22-63), NHWC.

    For each scale s: avg-pool diff by start_scale*2^s, take sobel spatial
    gradients, NaN-aware L1 mean over BOTH gradient maps, scaled by
    batch*2; final sum / num_scales.  NaNs propagate through avg_pool
    exactly like torch's AvgPool2d.
    """
    diff = prediction - target
    batch = prediction.shape[0]
    total = 0.0
    for s in range(num_scales):
        k = start_scale * (2 ** s)
        d = avg_pool(diff, k)
        gx, gy = spatial_gradient(d)
        g = jnp.stack([gx, gy])
        ok = ~jnp.isnan(g)
        n_ok = jnp.maximum(jnp.sum(ok), 1)
        l1 = jnp.sum(jnp.where(ok, jnp.abs(g), 0.0)) / n_ok
        total = total + l1 * batch * 2.0
    return total / num_scales


def get_loss(name: str):
    return LOSSES.get(name)
