"""Optimizer / LR-schedule factory from the reference config schema.

Reference: RAM_Net/base/base_trainer.py:36-43 resolves torch optimizers with
getattr(optim, config['optimizer_type'])(**config['optimizer']) and steps an
ExponentialLR every config['lr_scheduler_freq'] epochs, i.e.
lr(epoch) = lr0 * gamma^(epoch // freq).

Here the same config keys build an optax chain.  torch's Adam weight_decay
is L2-into-gradient (not decoupled), reproduced with add_decayed_weights
before the Adam transform.  The learning rate is injected as a hyperparam so
the host can set it per epoch without recompiling.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import optax

from ..core.config import Config


def lr_at_epoch(cfg: Config, epoch: int) -> float:
    lr0 = float(cfg.optimizer.get("lr", 1e-3))
    if cfg.lr_scheduler_type == "ExponentialLR":
        gamma = float(cfg.lr_scheduler.get("gamma", 1.0))
        steps = epoch // max(cfg.lr_scheduler_freq, 1)
        return lr0 * (gamma ** steps)
    if cfg.lr_scheduler_type == "StepLR":
        gamma = float(cfg.lr_scheduler.get("gamma", 0.1))
        step_size = int(cfg.lr_scheduler.get("step_size", 30))
        return lr0 * (gamma ** (epoch // step_size))
    return lr0


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    name = cfg.optimizer_type
    opt_cfg = cfg.optimizer
    wd = float(opt_cfg.get("weight_decay", 0.0))
    lr = float(opt_cfg.get("lr", 1e-3))

    if name in ("Adam", "AdamW"):
        b1, b2 = opt_cfg.get("betas", (0.9, 0.999))
        eps = float(opt_cfg.get("eps", 1e-8))
        if name == "Adam":
            core = [optax.add_decayed_weights(wd)] if wd else []
            core += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
        else:
            core = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                    optax.add_decayed_weights(wd)]
    elif name == "SGD":
        momentum = float(opt_cfg.get("momentum", 0.0))
        core = [optax.add_decayed_weights(wd)] if wd else []
        if momentum:
            core += [optax.trace(decay=momentum, nesterov=bool(opt_cfg.get("nesterov", False)))]
    elif name == "RMSprop":
        core = [optax.scale_by_rms(decay=float(opt_cfg.get("alpha", 0.99)),
                                   eps=float(opt_cfg.get("eps", 1e-8)))]
        if wd:
            core = [optax.add_decayed_weights(wd)] + core
    else:
        raise KeyError(f"unknown optimizer_type {name}")

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.chain(*core, optax.scale_by_learning_rate(learning_rate))

    return make(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr hyperparam in-place on the host."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
