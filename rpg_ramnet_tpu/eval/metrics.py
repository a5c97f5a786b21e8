"""Host-side (numpy) evaluation metrics.

Math parity reference: RAM_Net/model/metric.py (NaN-masked numpy metrics)
and RAM_Net/evaluation.py:201-292 (threshold deltas, RMS log, per-cutoff
masks).  sklearn/skimage are replaced with direct numpy implementations of
identical math (skimage is not available in this environment).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.registry import METRICS


EPS = 1e-6


@METRICS.register("abs_rel_diff")
def abs_rel_diff(y_input, y_target, eps: float = EPS):
    abs_diff = np.abs(y_target - y_input)
    return (abs_diff[~np.isnan(abs_diff)] / (y_target[~np.isnan(y_target)] + eps)).mean()


@METRICS.register("squ_rel_diff")
def squ_rel_diff(y_input, y_target, eps: float = EPS):
    abs_diff = np.abs(y_target - y_input)
    ok = ~np.isnan(abs_diff)
    return (abs_diff[ok] ** 2 / (y_target[ok] ** 2 + eps)).mean()


@METRICS.register("rms_linear")
def rms_linear(y_input, y_target):
    abs_diff = np.abs(y_target - y_input)
    ok = ~np.isnan(abs_diff)
    return np.sqrt((abs_diff[ok] ** 2).mean())


@METRICS.register("scale_invariant_error")
def scale_invariant_error(y_input, y_target):
    """NOTE (metric.py:22-25): operates on |target - input| of its inputs;
    evaluation.py passes log-space inputs to make this SILog."""
    log_diff = np.abs(y_target - y_input)
    ok = ~np.isnan(log_diff)
    return (log_diff[ok] ** 2).mean() - (log_diff[ok].mean()) ** 2


@METRICS.register("mean_error")
def mean_error(y_input, y_target):
    abs_diff = np.abs(y_target - y_input)
    return abs_diff[~np.isnan(abs_diff)].mean()


@METRICS.register("median_error")
def median_error(y_input, y_target):
    abs_diff = np.abs(y_target - y_input)
    return np.median(abs_diff[~np.isnan(abs_diff)])


@METRICS.register("mse")
def mse(y_input, y_target):
    """Per-sample MSE over non-NaN target pixels, averaged over batch
    (metric.py:35-54); inputs [N, C, H, W] with C in {1, 3}."""
    n, c, _, _ = y_input.shape
    assert c in (1, 3)
    total = 0.0
    for i in range(n):
        for ch in range(c):
            ok = ~np.isnan(y_target[i, ch])
            d = y_input[i, ch][ok] - y_target[i, ch][ok]
            total += float(np.mean(d * d))
    out = total / float(n)
    if c == 3:
        out /= 3.0
    return out


def _uniform_filter_valid(img: np.ndarray, win: int) -> np.ndarray:
    """win x win mean filter, 'valid' region only (no padding)."""
    c = np.cumsum(np.cumsum(img, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    s = (c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win])
    return s / (win * win)


def _ssim_single(x: np.ndarray, y: np.ndarray, win: int = 7,
                 data_range: float = 2.0, k1: float = 0.01, k2: float = 0.03):
    """skimage compare_ssim defaults for float inputs: uniform 7x7 window,
    data_range = 2 (float dtype range (-1, 1)), sample covariance norm."""
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    ux = _uniform_filter_valid(x, win)
    uy = _uniform_filter_valid(y, win)
    uxx = _uniform_filter_valid(x * x, win)
    uyy = _uniform_filter_valid(y * y, win)
    uxy = _uniform_filter_valid(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return float(s.mean())


@METRICS.register("structural_similarity")
def structural_similarity(y_input, y_target):
    """Batch SSIM, [N, C, H, W] with C in {1, 3} (metric.py:57-74)."""
    n, c, _, _ = y_input.shape
    assert c in (1, 3)
    total = 0.0
    for i in range(n):
        if c == 3:
            total += np.mean([_ssim_single(y_input[i, ch], y_target[i, ch])
                              for ch in range(3)])
        else:
            total += _ssim_single(y_input[i, 0], y_target[i, 0])
    return total / float(n)


def get_metric(name: str):
    return METRICS.get(name)


def eval_metrics(output: np.ndarray, target: np.ndarray,
                 names=("mse", "abs_rel_diff", "scale_invariant_error",
                        "median_error", "mean_error", "rms_linear")) -> np.ndarray:
    """The running metric vector of reference test.py:26-33."""
    return np.array([METRICS.get(n)(output, target) for n in names])
