"""Log-depth transforms.

Forward transform reference: RAM_Net/data_loader/dataset.py:297-305
(clip -> /clip_distance -> 1 + log(d)/reg_factor -> clip [0,1]).
Inverse reference: RAM_Net/evaluation.py:74-96 (exp(reg*(x-1)) * clip, with
prediction clipped to [exp(-reg)*clip, clip]).

Both are provided for numpy (host pipeline / evaluation) and jnp (device).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def depth_to_log_np(depth: np.ndarray, clip_distance: float, reg_factor: float) -> np.ndarray:
    d = np.clip(depth, 0.0, clip_distance) / clip_distance
    with np.errstate(divide="ignore", invalid="ignore"):
        out = 1.0 + np.log(d) / reg_factor
    return np.clip(out, 0.0, 1.0)


def log_to_depth_np(log_depth: np.ndarray, clip_distance: float, reg_factor: float,
                    clip_prediction: bool = False) -> np.ndarray:
    metric = np.exp(reg_factor * (log_depth - 1.0)) * clip_distance
    if clip_prediction:
        metric = np.clip(metric, np.exp(-reg_factor) * clip_distance, clip_distance)
    return metric


def depth_to_log(depth, clip_distance: float, reg_factor: float):
    d = jnp.clip(depth, 0.0, clip_distance) / clip_distance
    return jnp.clip(1.0 + jnp.log(d) / reg_factor, 0.0, 1.0)


def log_to_depth(log_depth, clip_distance: float, reg_factor: float,
                 clip_prediction: bool = False):
    metric = jnp.exp(reg_factor * (log_depth - 1.0)) * clip_distance
    if clip_prediction:
        metric = jnp.clip(metric, jnp.exp(-reg_factor) * clip_distance, clip_distance)
    return metric


def rgb_to_gray_np(rgb: np.ndarray) -> np.ndarray:
    """Rec601 luma (reference data_loader/dataset.py:235-236)."""
    return np.dot(rgb[..., :3], [0.2989, 0.5870, 0.1140]).astype(np.float32)
