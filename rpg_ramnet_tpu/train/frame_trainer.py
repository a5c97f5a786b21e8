"""Events -> frame image-reconstruction trainer (the reference's legacy
E2VID-style `Trainer`, RAM_Net/trainer/trainer.py:8-189, rebuilt
TPU-native).

The reference's legacy trainer is dead code on its main path (only the
LSTM trainer is reachable from train.py), but its capability — per-item
supervised reconstruction of the grayscale frame from an event voxel grid,
with an optional CONTRAST loss `w * (std(pred) - std(target))^2` pushing
the reconstruction toward reasonable dynamic range
(trainer/trainer.py:106-107), preview grids [events | pred | target]
(:59-69) and per-batch metric accumulation (:44-50) — is reproduced here
as one jitted train step + a small epoch loop.

TPU-first differences: the whole (loss, grads, update) is a single jitted
function; previews/metrics are host-side numpy exactly like the reference.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


def contrast_loss(pred, target, weight: float):
    """w * (std(pred) - std(target))^2 — trainer/trainer.py:106 (torch.std
    is the sample std, ddof=1)."""
    def _std(x):
        n = x.size
        m = jnp.mean(x)
        return jnp.sqrt(jnp.sum((x - m) ** 2) / jnp.maximum(n - 1, 1))
    return weight * (_std(pred) - _std(target)) ** 2


def make_preview(events: np.ndarray, target: np.ndarray,
                 pred: np.ndarray) -> np.ndarray:
    """[events-sum | pred | target] 1x3 grid, each panel min/max normalized
    (utils.make_grid(normalize=True, scale_each=True) semantics,
    trainer/trainer.py:59-69).  events [H,W,C]; target/pred [H,W,1].
    Returns [H, 3W] float in [0,1]."""
    panels = [np.sum(events, axis=-1), pred[..., 0], target[..., 0]]
    out = []
    for p in panels:
        lo, hi = float(p.min()), float(p.max())
        out.append((p - lo) / (hi - lo) if hi > lo else np.zeros_like(p))
    return np.concatenate(out, axis=1)


class FrameReconstructionTrainer:
    """Per-item reconstruction training: batches {'events': [B,H,W,C],
    'frame': [B,H,W,1]} -> model pred -> base_loss + contrast loss.

    model_apply(params, events) -> pred ([B,H,W,1]); base_loss(pred,
    target) -> scalar; metrics: list of (name, fn(pred_np, target_np))."""

    def __init__(self, params, model_apply: Callable, base_loss: Callable,
                 optimizer: optax.GradientTransformation,
                 weight_contrast_loss: float = 0.0,
                 metrics: Optional[List[Tuple[str, Callable]]] = None):
        self.params = params
        self.opt = optimizer
        self.opt_state = optimizer.init(params)
        self.metrics = metrics or []
        self.weight_contrast = float(weight_contrast_loss)
        self._apply = model_apply

        def loss_fn(p, events, frame):
            pred = model_apply(p, events)
            l_rec = base_loss(pred, frame)
            l_con = contrast_loss(pred, frame, self.weight_contrast)
            return l_rec + l_con, (l_rec, l_con, pred)

        @jax.jit
        def train_step(p, opt_state, events, frame):
            (loss, (l_rec, l_con, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, events, frame)
            updates, opt_state = self.opt.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, loss, l_rec, l_con, pred

        @jax.jit
        def eval_step(p, events, frame):
            loss, (l_rec, l_con, pred) = loss_fn(p, events, frame)
            return loss, pred

        self._train_step = train_step
        self._eval_step = eval_step

    def _metric_row(self, pred: np.ndarray, target: np.ndarray) -> np.ndarray:
        return np.asarray([fn(pred, target) for _, fn in self.metrics])

    def train_epoch(self, batches: Iterable[Dict[str, Any]],
                    preview_items: Iterable[Dict[str, Any]] = ()) \
            -> Dict[str, Any]:
        total_loss, n = 0.0, 0
        total_metrics = np.zeros(len(self.metrics))
        for batch in batches:
            ev = jnp.asarray(batch["events"])
            fr = jnp.asarray(batch["frame"])
            (self.params, self.opt_state, loss, l_rec, l_con,
             pred) = self._train_step(self.params, self.opt_state, ev, fr)
            total_loss += float(loss)
            total_metrics += self._metric_row(np.asarray(pred),
                                              np.asarray(fr))
            n += 1
        previews = [self.preview(item) for item in preview_items]
        log = {"loss": total_loss / max(n, 1),
               "metrics": (total_metrics / max(n, 1)).tolist(),
               "previews": previews}
        return log

    def valid_epoch(self, batches: Iterable[Dict[str, Any]],
                    preview_items: Iterable[Dict[str, Any]] = ()) \
            -> Dict[str, Any]:
        total_loss, n = 0.0, 0
        total_metrics = np.zeros(len(self.metrics))
        for batch in batches:
            ev = jnp.asarray(batch["events"])
            fr = jnp.asarray(batch["frame"])
            loss, pred = self._eval_step(self.params, ev, fr)
            total_loss += float(loss)
            total_metrics += self._metric_row(np.asarray(pred),
                                              np.asarray(fr))
            n += 1
        previews = [self.preview(item) for item in preview_items]
        return {"val_loss": total_loss / max(n, 1),
                "val_metrics": (total_metrics / max(n, 1)).tolist(),
                "val_previews": previews}

    def preview(self, item: Dict[str, Any]) -> np.ndarray:
        """item: unbatched {'events': [H,W,C], 'frame': [H,W,1]}."""
        ev = jnp.asarray(item["events"])[None]
        pred = np.asarray(self._apply(self.params, ev))[0]
        return make_preview(np.asarray(item["events"]),
                            np.asarray(item["frame"]), pred)
