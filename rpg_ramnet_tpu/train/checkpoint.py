"""Checkpoint save / restore / torch interop.

Payload semantics reference: RAM_Net/base/base_trainer.py:133-179 —
checkpoint-epoch{E}-loss-{L} with {arch, epoch, logger, state_dict,
optimizer, monitor_best, config}; best-by-monitor copied to model_best;
--resume restores epoch+1, monitor, model and optimizer state.

Here: Orbax for the param/opt-state pytrees (TPU-native, sharding-aware),
meta.json for scalars/config/log, plus export/import of reference-compatible
.pth.tar files (compat/torch_import name mapping) so checkpoints flow both
directions between this framework and the reference.
"""
from __future__ import annotations

import json
import os
import shutil
from os.path import join
from typing import Any, Dict, Optional

import numpy as np
import jax


def _tree_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, run_dir: str, use_async: bool = False):
        """use_async: save the pytree with Orbax's AsyncCheckpointer so the
        training loop resumes while the write is in flight (preemption-
        resilience on TPU VMs; SURVEY.md §5 failure-detection equivalent).
        Saves are finalized with wait_until_finished() on the next save or
        close()."""
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        import orbax.checkpoint as ocp
        self._use_async = use_async
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return join(self.run_dir, name)

    def wait(self):
        if self._use_async:
            self._ckptr.wait_until_finished()

    def close(self):
        self.wait()

    def save(self, name: str, params, opt_state, *, epoch: int,
             monitor_best: float, config: Dict[str, Any],
             logger: Optional[Dict[str, Any]] = None) -> str:
        path = self._path(name)
        self.wait()  # previous async save must land before reusing dirs
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(join(path, "tree"),
                         {"params": _tree_np(params),
                          "opt_state": _tree_np(opt_state)})
        meta = {"epoch": epoch, "monitor_best": float(monitor_best),
                "config": config, "logger": logger or {}}
        with open(join(path, "meta.json"), "w") as f:
            json.dump(meta, f, default=float)
        return path

    def save_best(self, src_name: str):
        """Copy a checkpoint to model_best (base_trainer.py:154-156)."""
        src, dst = self._path(src_name), self._path("model_best")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    def restore(self, path: str, params_template, opt_state_template):
        tree = self._ckptr.restore(join(path, "tree"),
                                   item={"params": params_template,
                                         "opt_state": opt_state_template})
        with open(join(path, "meta.json")) as f:
            meta = json.load(f)
        return tree["params"], tree["opt_state"], meta

    def restore_params(self, path: str, params_template):
        tree = self._ckptr.restore(join(path, "tree"))
        with open(join(path, "meta.json")) as f:
            meta = json.load(f)
        return tree["params"], meta


def export_pth_tar(path: str, params, arch: str, config: Dict[str, Any],
                   epoch: int = 0, monitor_best: float = float("inf")):
    """Write a reference-loadable .pth.tar checkpoint (torch state_dict with
    reference module names; see compat/torch_import.params_to_state_dict)."""
    import torch
    from ..compat import params_to_state_dict
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(params, arch).items()}
    torch.save({"arch": arch, "epoch": epoch, "state_dict": sd,
                "monitor_best": monitor_best, "config": config,
                "logger": None, "optimizer": None}, path)


def load_any(path: str, params_template=None):
    """Load params from either our Orbax layout or a reference .pth.tar."""
    if path.endswith(".pth.tar") or path.endswith(".pth") or os.path.isfile(path):
        from ..compat import load_params_from_checkpoint
        params, config = load_params_from_checkpoint(path)
        return params, {"config": config, "epoch": 0, "monitor_best": None}
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(join(path, "tree"))
    with open(join(path, "meta.json")) as f:
        meta = json.load(f)
    return tree["params"], meta
