"""Jitted train / eval steps, optionally sharded over a device mesh.

The reference's epoch loop does: zero_grad -> python-loop forward over L
packages -> one backward -> optimizer.step (lstm_trainer.py:445-453).  Here
the entire window (scan) + grad + optax update is ONE compiled program; under
a mesh, the batch is sharded on the 'data' axis and params are replicated,
so XLA derives the psum gradient all-reduce (DP) automatically.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import Config
from ..models.model import get_model
from .sequence_loss import make_sequence_loss


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
    accum = int(cfg.raw.get("trainer", {}).get("grad_accum", 1))

    def _split(batch, n, i):
        """i-th of n micro-batches (batch dim is 1 for time-leading keys)."""
        out = {}
        for k, v in batch.items():
            dim = 1 if k.endswith("_tcf") or k.endswith("_t") else 0
            size = v.shape[dim] // n
            out[k] = jax.lax.dynamic_slice_in_dim(v, i * size, size, axis=dim)
        return out

    def step(params, opt_state, batch):
        b, h, w = _batch_dims(batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum <= 1:
            state0 = model.init_state(mcfg, b, h, w)
            (_, aux), grads = grad_fn(params, state0, batch)
        else:
            # gradient accumulation over micro-batches (scan keeps one
            # micro-batch of activations live at a time)
            mb = b // accum
            state0 = model.init_state(mcfg, mb, h, w)

            def acc_step(carry, i):
                g_sum, aux_sum = carry
                (_, aux), g = grad_fn(params, state0, _split(batch, accum, i))
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
                aux_sum = jax.tree_util.tree_map(jnp.add, aux_sum, aux)
                return (g_sum, aux_sum), None

            # first micro-batch initializes the accumulators
            (_, aux_init), g_init = grad_fn(params, state0, _split(batch, accum, 0))
            (grads, aux), _ = jax.lax.scan(
                acc_step, (g_init, aux_init),
                jnp.arange(1, accum))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            aux = jax.tree_util.tree_map(lambda a: a / accum, aux)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # training-mode BN/IN: write the running stats updated during the
        # forward back into the param tree (buffers, not gradients — the
        # reference's torch buffers update in-place during .train() forward).
        # Under grad accumulation the stats are micro-batch averages.
        norm_stats = aux.pop("norm_stats", None)
        if norm_stats is not None:
            from ..models.layers import merge_norm_stats
            new_params = merge_norm_stats(new_params, norm_stats)
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
    """Validation loss over a window (no grads; eval-mode norms, as the
    reference validates under model.eval())."""
    loss_fn = make_sequence_loss(cfg, training=False)
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
