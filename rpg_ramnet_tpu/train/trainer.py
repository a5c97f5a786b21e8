"""Epoch-loop trainer.

Capability reference: RAM_Net/base/base_trainer.py (epoch loop, monitor-best
checkpointing, save_freq, resume, TB + JSON logging) and
RAM_Net/trainer/lstm_trainer.py (TBPTT epoch, loss bookkeeping, previews).

TPU-first: the per-window compute is one jitted program (train_step); data
arrives through the threaded BatchLoader + double-buffered device_put; the
host only steps the LR schedule, logs, and checkpoints.
"""
from __future__ import annotations

import json
import logging
import os
import time
from os.path import join
from typing import Any, Dict, Optional

import numpy as np
import jax

from ..core.config import Config
from ..models.model import get_model
from ..parallel import make_mesh, replicate
from .optim import make_optimizer, lr_at_epoch, set_learning_rate
from .train_step import make_train_step, make_eval_step
from .checkpoint import CheckpointManager, export_pth_tar
from ..data.loader import BatchLoader, device_prefetch


class JsonlLogger:
    """Training log as JSONL (replaces the pickled Logger object of
    logger/logger.py)."""

    def __init__(self, path: str):
        self.path = path
        self.entries: Dict[str, Any] = {}

    def add_entry(self, entry: Dict[str, Any]):
        self.entries[len(self.entries)] = entry
        with open(self.path, "a") as f:
            f.write(json.dumps(entry, default=float) + "\n")


class Trainer:
    def __init__(self, cfg: Config, train_loader: BatchLoader,
                 valid_loader: Optional[BatchLoader] = None,
                 resume: Optional[str] = None,
                 initial_params=None, use_mesh: bool = True,
                 run_dir: Optional[str] = None):
        self.cfg = cfg
        self.logger = logging.getLogger("Trainer")
        self.train_loader = train_loader
        self.valid_loader = valid_loader

        self.run_dir = run_dir or join(cfg.trainer.save_dir, cfg.name)
        os.makedirs(self.run_dir, exist_ok=True)
        with open(join(self.run_dir, "config.json"), "w") as f:
            json.dump(cfg.raw, f, indent=2)
        self.jsonl = JsonlLogger(join(self.run_dir, "train_log.jsonl"))
        self.tb = self._make_tb(join(self.run_dir, "tensorboard"))
        use_async = bool(cfg.raw.get("trainer", {}).get("async_checkpoint", False))
        self.ckpt = CheckpointManager(self.run_dir, use_async=use_async)

        self.mesh = make_mesh(cfg.mesh) if (use_mesh and len(jax.devices()) > 1) else None
        self.model = get_model(cfg.arch)

        key = jax.random.PRNGKey(0)
        params = initial_params if initial_params is not None else \
            self.model.init_params(key, cfg.model)
        from ..models.model import summary
        summary(params, cfg.arch, log=self.logger.info)
        self.optimizer = make_optimizer(cfg)
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        self.params, self.opt_state = params, opt_state

        self.train_step = make_train_step(cfg, self.optimizer, self.mesh)
        self.eval_step = make_eval_step(cfg, self.mesh)

        self.start_epoch = 0
        self.monitor = cfg.trainer.monitor
        self.monitor_mode = cfg.trainer.monitor_mode
        self.monitor_best = float("inf") if self.monitor_mode == "min" else -float("inf")
        if resume:
            self._resume(resume)

    @staticmethod
    def _make_tb(path: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            return SummaryWriter(path)
        except Exception:
            return None

    def _resume(self, path: str):
        if path.endswith(".pth.tar") or path.endswith(".pth"):
            # resume directly from a REFERENCE torch checkpoint: weights via
            # compat, Adam moments + step via import_torch_optimizer_state
            # (exact continuation of a reference training run)
            import jax.numpy as jnp
            from ..compat import load_torch_checkpoint, state_dict_to_params
            from ..compat.torch_import import import_torch_optimizer_state
            ckpt = load_torch_checkpoint(path)
            self.params = jax.tree_util.tree_map(
                jnp.asarray, state_dict_to_params(ckpt["state_dict"]))
            if ckpt.get("optimizer"):
                self.opt_state = import_torch_optimizer_state(
                    ckpt, self.params, self.optimizer)
            else:
                self.opt_state = self.optimizer.init(self.params)
            meta = {"epoch": int(ckpt.get("epoch", 0)),
                    "monitor_best": ckpt.get("monitor_best")}
        else:
            params, opt_state, meta = self.ckpt.restore(path, self.params,
                                                        self.opt_state)
            self.params, self.opt_state = params, opt_state
        if self.mesh is not None:
            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
        self.start_epoch = int(meta["epoch"]) + 1
        mb = meta.get("monitor_best")
        if mb is not None and np.isfinite(float(mb)):
            self.monitor_best = float(mb)
        self.logger.info("Resumed from %s at epoch %d", path, self.start_epoch)

    # ------------------------------------------------------------------

    def _run_epoch(self, loader: BatchLoader, train: bool, epoch: int) -> Dict[str, float]:
        from ..parallel import shard_batch as shard_batch_fn
        put_fn = ((lambda b: shard_batch_fn(b, self.mesh))
                  if self.mesh is not None else None)
        sums: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        loader.set_epoch(epoch)  # resume reproduces the exact data order
        from .sequence_loss import pack_train_batch
        packed = (pack_train_batch(b) for b in loader)
        for i, batch in enumerate(device_prefetch(packed, put_fn=put_fn)):
            if train:
                self.params, self.opt_state, aux = self.train_step(
                    self.params, self.opt_state, batch)
                self._last_batch = batch
            else:
                aux = self.eval_step(self.params, batch)
            for k, v in aux.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            if train and self.cfg.trainer.verbosity >= 2 and \
                    i % self.cfg.trainer.log_every == 0:
                self.logger.info("epoch %d [%d/%d] loss=%.4f", epoch, i,
                                 len(loader), float(aux["loss"]))
        wall = time.time() - t0
        out = {k: v / max(count, 1) for k, v in sums.items()}
        out["sec_per_epoch"] = wall
        return out

    # ------------------------------------------------------------------
    # previews (reference lstm_trainer.py:480-550: per-epoch prediction /
    # ground-truth grids and movies in TensorBoard)
    # ------------------------------------------------------------------

    def _write_previews(self, epoch: int, tag_prefix: str, loader: BatchLoader,
                        num_previews: int):
        """Prediction/GT grids + the reference's preview-sample metric vector
        (config['metrics'] evaluated on evenly spaced samples,
        lstm_trainer.py:100-106,488-515)."""
        if self.tb is None or num_previews <= 0 or len(loader.dataset) == 0:
            return
        from ..utils.training_utils import select_evenly_spaced_elements
        from ..eval.metrics import get_metric
        metric_fns = [(m, get_metric(m)) for m in self.cfg.metrics]
        total_metrics = np.zeros(len(metric_fns))
        model, mcfg = self.model, self.cfg.model
        for p_i, idx in enumerate(idxs := select_evenly_spaced_elements(
                num_previews, len(loader.dataset))):
            item, _ = loader.dataset[idx]
            seq = {"events": jax.numpy.asarray(item["events"][None]),
                   "image": jax.numpy.asarray(item["image"][None])}
            # phased runs gate the recurrent state on continuous times —
            # previews must see the same forward as training, not zero times
            if self.cfg.use_phased_arch:
                for tk in ("times_events", "times_image"):
                    if tk in item:
                        seq[tk] = jax.numpy.asarray(
                            np.asarray(item[tk])[None])
            b, l, h, w = 1, item["image"].shape[0], item["image"].shape[1], item["image"].shape[2]
            state0 = model.init_state(mcfg, 1, h, w)
            _, preds = model.forward_sequence(
                jax.device_get(self.params) if self.mesh else self.params,
                mcfg, state0, seq)

            def gt_for(key):
                if key == "image":
                    return item["depth_image"][:, :, :, 0]        # [L, H, W]
                return item["depth_events"][:, int(key[len("events"):]), :, :, 0]

            # The reference's preview-metric ground truth is the `new_target`
            # carried out of the loss loop: the depth of the LAST supervised
            # key in prediction-dict order (lstm_trainer.py:283,377); every
            # key's step-0 prediction is compared against it (:516).
            sup = self.cfg.trainer.loss_composition
            sup_keys = [k for k in preds if (not sup) or k in sup]
            gt_ref = gt_for((sup_keys or list(preds))[-1])
            for key in preds:
                pred = np.asarray(preds[key])[:, 0, :, :, 0]       # [L, H, W]
                gt = gt_for(key)
                if key == "image":
                    inp = item["image"].sum(axis=-1)
                else:
                    inp = item["events"][:, int(key[len("events"):])].sum(axis=-1)
                # grid rows: inputs / predictions / ground truth over time
                grid = np.concatenate([
                    np.concatenate(list(np.clip(inp * 0.5 + 0.5, 0, 1)), axis=1),
                    np.concatenate(list(pred), axis=1),
                    np.concatenate(list(np.nan_to_num(gt)), axis=1)], axis=0)
                self.tb.add_image(f"{tag_prefix}{p_i}_{key}__input_pred_gt",
                                  grid[None], epoch)
                if self.cfg.trainer.movie:
                    # per-epoch prediction movie at fps=5: each frame is
                    # input|prediction|gt side by side (reference
                    # lstm_trainer.py:133-150 make_movie + :518-523 add_video;
                    # GIF-encoded directly — moviepy is absent here)
                    from ..utils.training_utils import add_video_gif
                    frames = np.concatenate([
                        np.clip(inp * 0.5 + 0.5, 0, 1), pred,
                        np.nan_to_num(gt)], axis=-1)         # [L, H, 3W]
                    video = frames[None, :, None]            # [1, T, 1, H, 3W]
                    add_video_gif(
                        self.tb,
                        f"movie_{p_i}__{key}__prediction__groundtruth",
                        video, fps=5, global_step=epoch)
                # metric vector accumulation — two modes:
                # default: exact reference semantics (lstm_trainer.py:516) —
                #   each key's FIRST-timestep prediction vs the last supervised
                #   key's step-0 GT (groundtruth_targets[0] == final new_target
                #   of step 0, :283,:377);
                # preview_metrics_all_steps: corrected — per-key GT, averaged
                #   over all L timesteps of the preview window.
                for mi, (_, fn) in enumerate(metric_fns):
                    if self.cfg.trainer.preview_metrics_all_steps:
                        vals = [fn(pred[t][None, None], gt[t][None, None])
                                for t in range(pred.shape[0])]
                        total_metrics[mi] += float(np.nanmean(vals))
                    else:
                        total_metrics[mi] += fn(pred[0][None, None],
                                                gt_ref[0][None, None])
        for (name, _), v in zip(metric_fns, total_metrics / max(num_previews, 1)):
            self.tb.add_scalar(f"{tag_prefix}metric_{name}", float(v), epoch)

    def _write_state_previews(self, epoch: int, loader: BatchLoader):
        """'--record' state-change visualizations: per-scale super-state
        deltas between consecutive modality updates, 98th-percentile
        normalized, 3 channel slices upsampled to a common grid (reference
        lstm_trainer.py:295-377), at window steps {1, L/2, L-1}."""
        if self.tb is None or len(loader.dataset) == 0:
            return
        from scipy.ndimage import zoom as nd_zoom
        from ..models import statenet
        mcfg = self.cfg.model
        item, _ = loader.dataset[0]
        L_steps = item["image"].shape[0]
        h, w = item["image"].shape[1], item["image"].shape[2]
        params = jax.device_get(self.params) if self.mesh else self.params
        state = self.model.init_state(mcfg, 1, h, w)
        is_recurrent = hasattr(state, "super_states")
        if not is_recurrent:
            return
        K = mcfg.every_x_rgb_frame

        def state_change_grid(prev, cur):
            rows = []
            for i in range(len(cur.super_states)):
                c = cur.super_states[i]
                p = prev.super_states[i]
                if isinstance(c, tuple):
                    c, p = c[0], p[0]
                delta = np.asarray(c[0] - p[0])          # [h_i, w_i, C]
                delta = np.moveaxis(delta, -1, 0)        # [C, h_i, w_i]
                p98 = np.percentile(np.abs(delta), 98)
                delta = np.clip(delta / (p98 + 1e-8), -1, 1)
                dim = delta.shape[0]
                slices = delta[(0, dim // 2, dim - 1), :, :]
                slices = nd_zoom(slices, (1, 2 ** i, 2 ** i), order=1)
                rows.append(np.concatenate(list(slices), axis=1))
            return np.concatenate(rows, axis=0)

        grids = {}
        record_steps = {1, L_steps // 2, L_steps - 1}
        for l in range(L_steps):
            pkg_states = [state]
            for k in range(K):
                state = statenet.forward_modality(
                    params, mcfg, jax.numpy.asarray(item["events"][None, l, k]),
                    state, "image" if mcfg.is_baseline else "events")
                pkg_states.append(state)
            state = statenet.forward_modality(
                params, mcfg, jax.numpy.asarray(item["image"][None, l]),
                state, "image")
            pkg_states.append(state)
            if l in record_steps and l > 0:
                keys = [f"events{k}" for k in range(K)] + ["image"]
                for ki, key in enumerate(keys):
                    g = state_change_grid(pkg_states[ki], pkg_states[ki + 1])
                    grids.setdefault(key, []).append(g)
        for key, gs in grids.items():
            grid = np.concatenate(gs, axis=1)
            self.tb.add_image(f"state_change_{key}",
                              (np.clip(grid, -1, 1)[None] + 1) / 2, epoch)

    def _write_histograms(self, epoch: int):
        """Per-epoch weight/grad histograms + gradient-flow figure
        (reference lstm_trainer.py:505-548, training_utils.py:85-124)."""
        if self.tb is None or not hasattr(self, "_last_batch"):
            return
        from ..utils.training_utils import _flatten_with_names, plot_grad_flow_bars
        from .sequence_loss import make_sequence_loss
        if not hasattr(self, "_grad_fn"):
            loss_fn = make_sequence_loss(self.cfg)
            mcfg = self.cfg.model

            from .train_step import _batch_dims

            def grads_of(params, batch):
                b, h, w = _batch_dims(batch)
                state0 = self.model.init_state(mcfg, b, h, w)
                return jax.grad(lambda p: loss_fn(p, state0, batch)[0])(params)

            self._grad_fn = jax.jit(grads_of)
        grads = jax.device_get(self._grad_fn(self.params, self._last_batch))
        for name, w in _flatten_with_names(jax.device_get(self.params)).items():
            self.tb.add_histogram(name + "/weights", np.asarray(w), epoch)
        for name, g in _flatten_with_names(grads).items():
            self.tb.add_histogram(name + "/grad", np.asarray(g), epoch)
        self.tb.add_figure("grad_figure", plot_grad_flow_bars(grads),
                           global_step=epoch)

    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        final_log: Dict[str, Any] = {}
        for epoch in range(self.start_epoch, cfg.trainer.epochs):
            lr = lr_at_epoch(cfg, epoch)
            self.opt_state = set_learning_rate(self.opt_state, lr)

            train_log = self._run_epoch(self.train_loader, True, epoch)
            log = {"epoch": epoch, "lr": lr,
                   **{f"train_{k}": v for k, v in train_log.items()}}
            if self.valid_loader is not None:
                val_log = self._run_epoch(self.valid_loader, False, epoch)
                log.update({f"val_{k}": v for k, v in val_log.items()})

            self.jsonl.add_entry(log)
            if self.tb is not None:
                for k, v in log.items():
                    if isinstance(v, (int, float)):
                        self.tb.add_scalar(k, v, epoch)
                try:
                    if cfg.trainer.still_previews or cfg.trainer.movie:
                        self._write_previews(epoch, "preview_", self.train_loader,
                                             cfg.trainer.num_previews)
                        if self.valid_loader is not None:
                            self._write_previews(epoch, "val_preview_",
                                                 self.valid_loader,
                                                 cfg.trainer.num_val_previews)
                        self._write_histograms(epoch)
                    if cfg.trainer.state_preview:
                        self._write_state_previews(epoch, self.train_loader)
                except Exception as e:
                    self.logger.warning("preview writing failed: %s", e)

            monitored = log.get(self.monitor)
            if monitored is None:
                monitored = log.get("val_loss", log.get("train_loss"))
            improved = (monitored < self.monitor_best) if self.monitor_mode == "min" \
                else (monitored > self.monitor_best)

            if improved or (epoch % cfg.trainer.save_freq == 0):
                name = f"checkpoint-epoch{epoch}"
                self.ckpt.save(name, self.params, self.opt_state, epoch=epoch,
                               monitor_best=self.monitor_best, config=cfg.raw,
                               logger=self.jsonl.entries)
                if improved:
                    self.monitor_best = monitored
                    self.ckpt.save_best(name)
                    self.logger.info("epoch %d: new best %s=%.5f", epoch,
                                     self.monitor, monitored)
            final_log = log
        if self.tb is not None:
            self.tb.flush()
        return final_log

    def export_reference_checkpoint(self, path: str, epoch: int = 0):
        """Write a .pth.tar the reference implementation can load."""
        export_pth_tar(path, jax.device_get(self.params), self.cfg.arch,
                       self.cfg.raw, epoch, self.monitor_best)
