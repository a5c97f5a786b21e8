"""TBPTT sequence loss.

Reference: RAM_Net/trainer/lstm_trainer.py:152-226,228-390 — per-step losses
for the supervised keys (loss_composition/loss_weights), summed over the L
datapackages of a window, /L, plus the weighted multi-scale gradient loss and
optional downsampled MSE loss.

The whole window runs as ONE jitted function: forward_sequence (lax.scan)
decodes only the supervised keys, and the losses are computed vectorized over
the stacked [L, B, H, W, 1] predictions.  Gradients are identical to the
reference's python loop + single backward().

Known reference bug (lstm_trainer.py:253,281): all supervised keys alias one
loss-accumulator dict, so the reference's effective total is
num_keys x (sum over keys).  We compute the FIXED per-key accumulation;
`legacy_loss_scaling=True` multiplies by num_keys to reproduce the
reference's effective scale (a pure LR rescale).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Config, ModelConfig
from ..models.model import get_model, prediction_keys
from . import losses as L


def supervised_keys(cfg: Config) -> Tuple[str, ...]:
    lc = cfg.trainer.loss_composition
    all_keys = prediction_keys(cfg.model)
    if not lc:
        return all_keys
    return tuple(k for k in all_keys if k in lc)


def pack_train_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Host-side repack of an NHWC loader batch into the TPU-friendly
    training layout: TIME-LEADING, channel-first sequence inputs
    ('events_tcf' [L,B,K,C,H,W], 'image_tcf' [L,B,C,H,W]) and squeezed,
    time-leading depth targets ('depth_events_t' [L,B,K,H,W],
    'depth_image_t' [L,B,H,W]).

    Why: XLA tiles the two minor dims to (8, 128); stacked TBPTT tensors
    with 1-5 channels on the minor dim get padded up to 128x in HBM
    (observed 75 GB for the reference training recipe).  Channel-first
    keeps the big spatial dims on the tile; time-leading removes the
    in-jit [B,L]->[L,B] transpose whose XLA copy re-materialized the whole
    sequence in the padded layout (see PERF.md)."""
    import numpy as np
    out = {}
    for k, v in batch.items():
        if k == "events" and v.ndim == 6:          # [B,L,K,H,W,C]
            out["events_tcf"] = np.ascontiguousarray(
                np.transpose(v, (1, 0, 2, 5, 3, 4)))
        elif k == "image" and v.ndim == 5:          # [B,L,H,W,C]
            out["image_tcf"] = np.ascontiguousarray(
                np.transpose(v, (1, 0, 4, 2, 3)))
        elif k == "depth_events" and v.shape[-1] == 1:
            out["depth_events_t"] = np.ascontiguousarray(
                np.moveaxis(v[..., 0], 1, 0))
        elif k == "depth_image" and v.shape[-1] == 1:
            out["depth_image_t"] = np.ascontiguousarray(
                np.moveaxis(v[..., 0], 1, 0))
        elif k in ("times_events", "times_image"):
            out[k + "_t"] = np.ascontiguousarray(np.moveaxis(v, 1, 0))
        else:
            out[k] = v
    return out


TIME_LEADING_KEYS = ("events_tcf", "image_tcf", "depth_events_t",
                     "depth_image_t", "times_events_t", "times_image_t")


def _target_for(batch: Dict[str, Any], key: str):
    """Time-leading SQUEEZED target [L, B, H, W] for a prediction key.
    Accepts batch-leading NHWC ('depth_*' [B,L,...,1]) or time-leading
    packed ('depth_*_t' [L,B,...]) batches."""
    if key == "image":
        if "depth_image_t" in batch:
            return batch["depth_image_t"]
        t = batch["depth_image"]
    else:
        k = int(key[len("events"):])
        if "depth_events_t" in batch:
            return batch["depth_events_t"][:, :, k]
        t = batch["depth_events"][:, :, k]
    if t.ndim == 5:  # [B, L, H, W, 1]
        t = t[..., 0]
    return jnp.moveaxis(t, 1, 0)


def make_sequence_loss(cfg: Config, remat: bool = False,
                       training: bool = True):
    """Returns loss_fn(params, state0, batch) -> (scalar, aux_dict).

    batch: {'events': [B,L,K,H,W,Ce], 'image': [B,L,H,W,Ci],
            'depth_events': [B,L,K,H,W,1], 'depth_image': [B,L,H,W,1]}

    training=True + cfg.model.norm in (BN, IN): the forward uses batch
    statistics and aux['norm_stats'] carries the updated running stats
    (torch .train() semantics); training=False keeps eval semantics
    (running stats), as the reference's _valid_epoch does under
    model.eval().
    """
    model = get_model(cfg.arch)
    mcfg = cfg.model
    keys = supervised_keys(cfg)
    lc = cfg.trainer.loss_composition
    weights = {k: (cfg.trainer.loss_weights[list(lc).index(k)] if lc else 1.0)
               for k in keys}
    base_loss = L.get_loss(cfg.loss_type)
    loss_kwargs = dict(cfg.loss_config)
    use_grad = cfg.grad_loss_weight is not None
    use_mse = cfg.mse_loss_weight is not None
    num_keys = max(len(keys), 1)
    # training-mode BN/IN: batch statistics in the forward, running-stat
    # updates carried through the scan and returned via aux['norm_stats']
    # (reference trains torch .train() when norm is configured,
    # submodules.py:13-24)
    train_norm = training and mcfg.norm in ("BN", "IN")
    if cfg.trainer.deferred_decode and \
            max(int(getattr(cfg.trainer, "remat_chunk", 1)), 1) > 1:
        import warnings
        warnings.warn(
            "trainer.deferred_decode is incompatible with remat_chunk>1 "
            "(the batched-decode scan checkpoints per package); honoring "
            "remat_chunk with the in-scan decode path instead",
            stacklevel=2)
    if cfg.trainer.deferred_decode and train_norm:
        import warnings
        warnings.warn(
            "trainer.deferred_decode is incompatible with training-mode "
            "BN/IN (batch stats must match the reference's per-step "
            "statistics); using the in-scan decode path",
            stacklevel=2)
    from ..models import statenet
    # precompute_x rides the deferred-decode path, so it needs the
    # EFFECTIVE deferral (deferred_decode AND remat_chunk==1 AND not
    # BN/IN training), plus a state-independent-encoder config
    deferred_effective = (cfg.trainer.deferred_decode and not train_norm
                          and max(int(getattr(cfg.trainer, "remat_chunk", 1)),
                                  1) == 1)
    pre_x = bool(getattr(cfg.trainer, "precompute_x", False))
    if pre_x and not (deferred_effective
                      and statenet.supports_x_precompute(mcfg)):
        import warnings
        warnings.warn(
            "trainer.precompute_x requires an effective deferred_decode "
            "(remat_chunk==1, no BN/IN training mode) AND "
            "recurrent_block_type='conv' with convgru/convlstm state "
            "combination; ignoring it",
            stacklevel=2)
        pre_x = False

    def loss_fn(params, state0, batch):
        seq_in = {k: batch[k] for k in
                  ("events", "image", "events_tcf", "image_tcf",
                   "times_events", "times_image", "times_events_t",
                   "times_image_t")
                  if k in batch}
        rc = max(int(getattr(cfg.trainer, "remat_chunk", 1)), 1)
        norm_stats_out = None
        if train_norm:
            from ..models.layers import extract_norm_stats
            stats0 = extract_norm_stats(params)
            _, preds, norm_stats_out = model.forward_sequence(
                params, mcfg, state0, seq_in, decode_keys=keys, remat=remat,
                squeeze_preds=True, norm_stats=stats0, remat_chunk=rc)
            norm_stats_out = jax.lax.stop_gradient(norm_stats_out)
        elif (cfg.trainer.deferred_decode and rc == 1
              and hasattr(model, "forward_sequence_batched_decode")):
            # decoder outside the (remat'd) scan: the L*B*|keys| supervised
            # decodes run as ONE batch with normally-stored activations —
            # better MXU fill on the narrow-channel decoder convs AND no
            # decoder recompute in the backward (losses identical,
            # tests/test_train.py)
            # allow_fused with pre_x: the Pallas fused h-side cells have a
            # custom VJP (round 3), so the sequential critical path of the
            # TRAINING scan may run them; cfg.model.fused_gru policy +
            # shape support still gate per scale (statenet._use_fused_cell).
            # fused_gru='on' (explicit) also allows them WITHOUT
            # precompute — the round-4 phased cell (ops/phased_cell.py,
            # custom VJP incl. tau/phase/times grads) runs in the phased
            # encoders + state combination, enabling fused MVSEC
            # fine-tuning; grads-parity: tests/test_train.py
            # allow_composed: the composed transposed-conv decoder layers
            # (differentiable, pure XLA) on the L*B*|keys|-deep deferred
            # decode batch — auto-gated to bf16 + batch>=24 on TPU
            # (statenet._use_composed_decoder); loss/gradients deviate
            # only in float summation order there (set
            # model.composed_decoder='off' for exactness)
            _, preds = model.forward_sequence_batched_decode(
                params, mcfg, state0, seq_in, decode_keys=keys, remat=remat,
                squeeze_preds=True, package_precompute=pre_x,
                allow_fused=pre_x or cfg.model.fused_gru == "on",
                allow_composed=True,
                remat_policy=getattr(cfg.trainer, "remat_policy", "none"))
        else:
            _, preds = model.forward_sequence(
                params, mcfg, state0, seq_in, decode_keys=keys, remat=remat,
                squeeze_preds=True, remat_chunk=rc,
                remat_policy=getattr(cfg.trainer, "remat_policy", "none"))
        if "image_tcf" in batch:
            l_steps = batch["image_tcf"].shape[0]
        else:
            l_steps = batch["image"].shape[1]
        total_si = 0.0
        total_grad = 0.0
        total_mse = 0.0
        per_key: Dict[str, Any] = {}

        def grad_loss_step(p, t):
            # multi-scale gradient loss consumes NHWC; expand the squeezed
            # maps per step (small fused temp, not a stacked buffer)
            return L.multi_scale_grad_loss(p[..., None], t[..., None])

        for k in keys:
            pred = preds[k]                       # [L, B, H, W] (squeezed)
            target = _target_for(batch, k)
            w = weights[k]

            si = jnp.sum(jax.vmap(lambda p, t: base_loss(p, t, **loss_kwargs))(pred, target))
            si = w * si / l_steps
            total_si = total_si + si
            per_key[f"L_si_{k}"] = si

            if use_grad:
                g = jnp.sum(jax.vmap(grad_loss_step)(pred, target))
                g = cfg.grad_loss_weight * w * g / l_steps
                total_grad = total_grad + g
                per_key[f"L_grad_{k}"] = g

            if use_mse:
                f = cfg.mse_loss_downsampling_factor
                if f != 1.0:
                    hh = int(pred.shape[2] * f)
                    ww = int(pred.shape[3] * f)
                    pr = jax.image.resize(pred, pred.shape[:2] + (hh, ww), "bilinear")
                    tr = jax.image.resize(target, target.shape[:2] + (hh, ww), "bilinear")
                else:
                    pr, tr = pred, target
                m = jnp.sum(jax.vmap(L.mse_loss)(pr, tr))
                m = cfg.mse_loss_weight * w * m / l_steps
                total_mse = total_mse + m
                per_key[f"L_mse_{k}"] = m

        loss = total_si + total_grad + total_mse
        if cfg.trainer.legacy_loss_scaling:
            loss = loss * num_keys
        aux = {"loss": loss, "L_si": total_si}
        if use_grad:
            aux["L_grad"] = total_grad
        if use_mse:
            aux["L_mse"] = total_mse
        aux.update(per_key)
        if norm_stats_out is not None:
            aux["norm_stats"] = norm_stats_out
        return loss, aux

    return loss_fn
