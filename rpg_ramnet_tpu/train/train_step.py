"""Jitted train / eval steps, optionally sharded over a device mesh.

The reference's epoch loop does: zero_grad -> python-loop forward over L
packages -> one backward -> optimizer.step (lstm_trainer.py:445-453).  Here
the entire window (scan) + grad + optax update is ONE compiled program; under
a mesh, the batch is sharded on the 'data' axis and params are replicated,
so XLA derives the psum gradient all-reduce (DP) automatically.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..models.model import get_model
from .sequence_loss import make_sequence_loss
from .optim import make_optimizer


def _batch_dims(batch):
    """(B, H, W) for NHWC 'image' [B,L,H,W,C] or time-leading channel-first
    'image_tcf' [L,B,C,H,W] batches."""
    if "image_tcf" in batch:
        s = batch["image_tcf"].shape
        return s[1], s[-2], s[-1]
    s = batch["image"].shape
    return s[0], s[2], s[3]


def make_train_step(cfg: Config, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, remat: Optional[bool] = None,
                    donate: bool = True):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, aux).

    The zero initial recurrent state per TBPTT window matches the reference
    (model.py:146-159: states re-zeroed per sequence).  remat defaults to
    cfg.trainer.remat (True: per-step jax.checkpoint — required to fit the
    reference recipe B=8/L=10/224^2 in one chip's HBM, see PERF.md)."""
    if remat is None:
        remat = cfg.trainer.remat
    loss_fn = make_sequence_loss(cfg, remat=remat)
    model = get_model(cfg.arch)
    mcfg = cfg.model

    def step(params, opt_state, batch):
        b, h, w = _batch_dims(batch)
        state0 = model.init_state(mcfg, b, h, w)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(params, state0, batch)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    # mesh mode: the caller places the arguments (params/opt replicated via
    # parallel.replicate, batch per-key sharded via parallel.shard_batch —
    # time-leading keys shard dim 1); GSPMD propagates and inserts the
    # gradient psum over 'data'.
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_eval_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Validation loss over a window (no grads)."""
    loss_fn = make_sequence_loss(cfg)
    model = get_model(cfg.arch)
    mcfg = cfg.model

    def step(params, batch):
        b, h, w = _batch_dims(batch)
        state0 = model.init_state(mcfg, b, h, w)
        _, aux = loss_fn(params, state0, batch)
        return aux

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    return jax.jit(step, out_shardings=repl)
