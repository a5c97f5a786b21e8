"""StateNet — the RAM-Net recurrent multi-modal UNet, as pure functions.

Capability reference: RAM_Net/model/statenet.py (StateNetPhasedRecurrent,
forward_events:204, forward_images:241, forward_decoder:290) and
RAM_Net/model/model.py (ERGB2DepthRecurrent:114).

TPU-first design: instead of the reference's per-step Python loop threading
dicts of tensors through module methods, the model is a single pure function
``modality_step(params, cfg, x, state, modality)`` usable inside ``lax.scan``
over the asynchronous sensor schedule.  State is an explicit pytree; events
and images share the per-scale "super state" but have disjoint encoder and
state-combination parameters (statenet.py:141-198); the decoder is shared.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import layers as L


# ---------------------------------------------------------------------------
# state pytree
# ---------------------------------------------------------------------------


def compute_dtype(cfg: ModelConfig):
    """bf16 compute with f32 params/loss when configured (MXU-friendly)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class ModalityState(NamedTuple):
    """Per-modality recurrent state (only populated for the variants that
    carry it; empty tuples otherwise so the pytree structure stays static)."""
    encoders: Tuple  # per-scale (h, c) if recurrent_block_type == 'convlstm'


class StateNetState(NamedTuple):
    # per-scale shared super state: array [B,H,W,C], or (h, c) for convlstm
    # state combination (model/model.py:154-157)
    super_states: Tuple
    events: ModalityState
    image: ModalityState


def init_state(cfg: ModelConfig, batch: int, height: int, width: int,
               dtype=None) -> StateNetState:
    """Zero state, sized per reference model/model.py:146-159."""
    if dtype is None:
        dtype = compute_dtype(cfg)
    supers = []
    enc_events, enc_image = [], []
    for i in range(cfg.num_encoders):
        h = height // (2 ** (i + 1))
        w = width // (2 ** (i + 1))
        c = cfg.base_num_channels * (2 ** (i + 1))
        z = jnp.zeros((batch, h, w, c), dtype)
        if (not cfg.is_baseline) and cfg.state_combination == "convlstm":
            supers.append((z, z))
        else:
            supers.append(z)
        if cfg.recurrent_block_type == "convlstm":
            enc_events.append((z, z))
            enc_image.append((z, z))
    return StateNetState(
        super_states=tuple(supers),
        events=ModalityState(encoders=tuple(enc_events)),
        image=ModalityState(encoders=tuple(enc_image)),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_params(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict[str, Any]:
    """Parameter pytree whose keys mirror reference module names
    (statenet.py:139-202) for mechanical checkpoint conversion."""
    keys = iter(jax.random.split(key, 256))
    p: Dict[str, Any] = {}
    nb = cfg.base_num_channels

    # heads are norm-FREE in the reference regardless of config
    # (statenet.py:139-146: ConvLayer(...) without the norm arg)
    p["head_rgb"] = L.conv_layer_init(next(keys), cfg.num_bins_rgb, nb, 5, None, dtype)
    if not cfg.is_baseline:
        p["head_events"] = L.conv_layer_init(next(keys), cfg.num_bins_events, nb, 5, None, dtype)

    enc_rgb, enc_ev = [], []
    comb_img, comb_ev = [], []
    for i, (in_c, out_c) in enumerate(zip(cfg.encoder_input_sizes,
                                          cfg.encoder_output_sizes)):
        if cfg.use_phased_arch and cfg.recurrent_block_type == "convlstm":
            # irregular-timestamp regime (MVSEC branch machinery,
            # submodules.py:145-157): strided conv + PhasedConvLSTM whose
            # time gate spans the post-conv feature map
            h_i = cfg.spatial_resolution[0] // (2 ** (i + 1))
            w_i = cfg.spatial_resolution[1] // (2 ** (i + 1))
            enc_rgb.append(L.recurrent_phased_conv_layer_init(
                next(keys), in_c, out_c, h_i, w_i, 5, cfg.norm, dtype))
            if not cfg.is_baseline:
                enc_ev.append(L.recurrent_phased_conv_layer_init(
                    next(keys), in_c, out_c, h_i, w_i, 5, cfg.norm, dtype))
        elif cfg.recurrent_block_type == "convlstm":
            enc_rgb.append(L.recurrent2_conv_layer_init(next(keys), in_c, out_c, 5, "convlstm", cfg.norm, dtype))
            if not cfg.is_baseline:
                enc_ev.append(L.recurrent2_conv_layer_init(next(keys), in_c, out_c, 5, "convlstm", cfg.norm, dtype))
        elif cfg.recurrent_block_type == "conv":
            enc_rgb.append(L.conv_layer_init(next(keys), in_c, out_c, 5, cfg.norm, dtype))
            if not cfg.is_baseline:
                enc_ev.append(L.conv_layer_init(next(keys), in_c, out_c, 5, cfg.norm, dtype))
        else:
            raise KeyError(f"unknown recurrent_block_type {cfg.recurrent_block_type}")

        if cfg.state_combination in ("convlstm", "convgru"):
            comb_img.append(L.recurrent_conv_layer_init(next(keys), out_c, cfg.state_combination, dtype))
            if not cfg.is_baseline:
                comb_ev.append(L.recurrent_conv_layer_init(next(keys), out_c, cfg.state_combination, dtype))
        elif cfg.state_combination == "conv":
            comb_img.append(L.conv_layer_init(next(keys), out_c * 2, out_c, 5, cfg.norm, dtype))
            if not cfg.is_baseline:
                comb_ev.append(L.conv_layer_init(next(keys), out_c * 2, out_c, 5, cfg.norm, dtype))
        # 'sum': parameter-free

    p["encoders_rgb"] = enc_rgb
    p["state_combination_images"] = comb_img
    if not cfg.is_baseline:
        p["encoders_events"] = enc_ev
        p["state_combination_events"] = comb_ev

    p["resblocks"] = [
        L.residual_block_init(next(keys), cfg.max_num_channels, cfg.max_num_channels, cfg.norm, dtype)
        for _ in range(cfg.num_residual_blocks)
    ]
    decoder_input_sizes = list(reversed(cfg.encoder_output_sizes))
    decs = []
    for i, in_c in enumerate(decoder_input_sizes):
        # NOTE deviation: the reference sizes ALL decoders at 2x for
        # concat/no_skip (statenet.py:111) but its forward gives decoder 0
        # no skip and identity skips single-width tensors — so only
        # skip_type='sum' actually runs upstream.  We size decoders to what
        # the forward really feeds, making concat/no_skip functional.
        if cfg.skip_type == "concat" and i > 0:
            dec_in = 2 * in_c
        else:
            dec_in = in_c
        if cfg.use_upsample_conv:
            decs.append(L.upsample_conv_layer_init(next(keys), dec_in, in_c // 2, 5, cfg.norm, dtype))
        else:
            decs.append(L.transposed_conv_layer_init(next(keys), dec_in, in_c // 2, 5, cfg.norm, dtype))
    p["decoders"] = decs
    # statenet's pred has NO head skip (statenet.py:313) -> base channels
    p["pred"] = L.conv_layer_init(next(keys), nb, cfg.num_output_channels, 1, cfg.norm, dtype)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _skip(cfg: ModelConfig, x1, x2):
    if cfg.skip_type == "sum":
        return x1 + x2
    if cfg.skip_type == "concat":
        return jnp.concatenate([x1, x2], axis=-1)
    return x1  # no_skip


def _super_hidden(cfg: ModelConfig, s):
    """The tensor part of a per-scale super state (hidden for convlstm comb,
    statenet.py:292-295)."""
    if (not cfg.is_baseline) and cfg.state_combination == "convlstm":
        return s[0]
    return s


def forward_modality(params, cfg: ModelConfig, x, state: StateNetState,
                     modality: str, times=None, input_layout: str = "NHWC",
                     norm_ctx=None, allow_fused: bool = False):
    """One encoder sweep of one modality, updating the shared super states.

    modality: 'events' -> head_events/encoders_events/state_combination_events
              'image'  -> head_rgb/encoders_rgb/state_combination_images
    Reference: statenet.py forward_events:204-239 / forward_images:241-288.
    norm_ctx: layers.NormCtx for training-mode BN/IN (batch stats + running
    stat collection); None = eval semantics.
    allow_fused: permit the full fused Pallas ConvGRU cell for the
    per-scale state combination (inference only — no VJP).
    Returns (new_state, None).
    """
    is_events = modality == "events"
    if is_events:
        head_p = params["head_events"]
        encoders = params["encoders_events"]
        combs = params.get("state_combination_events", [])
        enc_states = state.events.encoders
        head_name, enc_name = "head_events", "encoders_events"
        comb_name = "state_combination_events"
    else:
        head_p = params["head_rgb"]
        encoders = params["encoders_rgb"]
        combs = params.get("state_combination_images", [])
        enc_states = state.image.encoders
        head_name, enc_name = "head_rgb", "encoders_rgb"
        comb_name = "state_combination_images"

    x = x.astype(compute_dtype(cfg))
    # head has no norm (statenet.py:139-146)
    x = L.conv_layer_apply(head_p, x, 1, 2, "relu", None,
                           input_layout=input_layout)

    new_supers: List[Any] = []
    new_enc_states: List[Any] = []
    for i in range(cfg.num_encoders):
        prev_super = state.super_states[i]
        if cfg.recurrent_block_type == "conv":
            x = L.conv_layer_apply(encoders[i], x, 2, 2, "relu", cfg.norm,
                                   ctx=norm_ctx, path=f"{enc_name}.{i}")
            # remat-policy tag (trainer.remat_policy='enc_out'): lets the
            # per-step jax.checkpoint SAVE the per-scale encoder outputs so
            # the backward skips the head+encoder conv recompute.  Identity
            # outside a policy'd checkpoint.
            x = jax.ad_checkpoint.checkpoint_name(x, "enc_out")
        elif cfg.use_phased_arch:
            t = times if times is not None else jnp.zeros((x.shape[0],), x.dtype)
            # fused Pallas LSTM h-side cell inside the phased encoder
            # (x/h split, differentiable — ~1 ulp summation-order
            # deviation, so only allow_fused callers get it)
            fuse = allow_fused and _use_fused_cell(cfg, enc_states[i][0],
                                                   lstm=True)
            x, enc_st = L.recurrent_phased_conv_layer_apply(
                encoders[i], x, t, enc_states[i], 2, 2, cfg.norm, fused=fuse)
            new_enc_states.append(enc_st)
        else:  # convlstm encoder
            x, enc_st = L.recurrent2_conv_layer_apply(
                encoders[i], x, enc_states[i], 2, 2, "convlstm", cfg.norm,
                ctx=norm_ctx, path=f"{enc_name}.{i}")
            new_enc_states.append(enc_st)

        if cfg.is_baseline and not is_events:
            # baselines: the recurrent unit output feeds the next encoder
            # (statenet.py:276-283); super state is that output.
            if cfg.state_combination in ("convlstm", "convgru"):
                x, _ = L.recurrent_conv_layer_apply(
                    combs[i], x, prev_super, cfg.state_combination)
            elif cfg.state_combination == "conv":
                x = L.conv_layer_apply(
                    combs[i], jnp.concatenate([x, prev_super], -1), 1, 2,
                    "relu", cfg.norm, ctx=norm_ctx, path=f"{comb_name}.{i}")
            elif cfg.state_combination == "sum":
                x = x + prev_super
            new_supers.append(x)
        else:
            if cfg.state_combination == "convlstm":
                # hidden+cell both come from the shared previous super state
                # (statenet.py:222-229: lstm_states arg = prev_super_state[i])
                if allow_fused and _use_fused_cell(cfg, prev_super[0],
                                                   lstm=True):
                    # x/h split + fused Pallas LSTM h-side (differentiable;
                    # ~1 ulp summation-order deviation vs the single fused
                    # [x, h] conv, like the precompute path)
                    from ..ops.gru_hside import conv_lstm_hside_fused
                    gx = L.conv_lstm_x_gates(combs[i]["recurrent_block"], x)
                    super_state = conv_lstm_hside_fused(
                        combs[i]["recurrent_block"], gx, prev_super)
                else:
                    _, super_state = L.recurrent_conv_layer_apply(
                        combs[i], x, prev_super, "convlstm")
            elif cfg.state_combination == "convgru":
                # lstm=True: the full cell's K=6C temps need the halved
                # (256K) VMEM budget — same footprint as the LSTM cell —
                # so the gate must use the budget the kernel picks tiles
                # with (a mismatch resolved tile_h=0 -> ZeroDivisionError)
                if allow_fused and _use_fused_cell(cfg, prev_super,
                                                   lstm=True):
                    # inference-only full fused Pallas cell (K=6C MXU
                    # contraction; no VJP — training paths never set
                    # allow_fused)
                    from ..ops.gru_hside import conv_gru_full_fused
                    super_state = conv_gru_full_fused(
                        combs[i]["recurrent_block"], x, prev_super)
                else:
                    super_state, _ = L.recurrent_conv_layer_apply(
                        combs[i], x, prev_super, "convgru")
            elif cfg.state_combination == "conv":
                super_state = L.conv_layer_apply(
                    combs[i], jnp.concatenate([x, prev_super], -1), 1, 2,
                    "relu", cfg.norm, ctx=norm_ctx, path=f"{comb_name}.{i}")
            elif cfg.state_combination == "sum":
                super_state = x + prev_super
            else:
                raise KeyError(cfg.state_combination)
            new_supers.append(super_state)

    if cfg.recurrent_block_type == "convlstm":
        if is_events:
            new_state = state._replace(
                super_states=tuple(new_supers),
                events=ModalityState(encoders=tuple(new_enc_states)))
        else:
            new_state = state._replace(
                super_states=tuple(new_supers),
                image=ModalityState(encoders=tuple(new_enc_states)))
    else:
        new_state = state._replace(super_states=tuple(new_supers))
    return new_state


def supports_x_precompute(cfg: ModelConfig) -> bool:
    """True when the encoder chain is state-independent and the state
    combination is ConvGRU/ConvLSTM — the configs whose per-step x-side
    work (head + strided encoders + recurrent x-side gate convs) can be
    batched over all steps of a sequence outside the scan.  The flagship
    EventScape recipe (recurrent_block_type='conv', convgru) and its
    convlstm state-combination variant."""
    return (not cfg.is_baseline and cfg.recurrent_block_type == "conv"
            and cfg.state_combination in ("convgru", "convlstm"))


def encoder_features(params, cfg: ModelConfig, x, modality: str,
                     input_layout: str = "NHWC") -> List[Any]:
    """State-independent encoder sweep (recurrent_block_type='conv' only):
    head conv + strided encoder convs, returning the per-scale
    pre-state-combination features — the `x` each scale's GRU consumes in
    forward_modality.  Callable on ANY batch (e.g. all L*(K+1) steps of a
    sequence at once, statenet.py:204-239 runs it per step)."""
    assert cfg.recurrent_block_type == "conv"
    is_events = modality == "events"
    head_p = params["head_events" if is_events else "head_rgb"]
    encoders = params["encoders_events" if is_events else "encoders_rgb"]
    x = x.astype(compute_dtype(cfg))
    x = L.conv_layer_apply(head_p, x, 1, 2, "relu", None,
                           input_layout=input_layout)
    xs = []
    for i in range(cfg.num_encoders):
        x = L.conv_layer_apply(encoders[i], x, 2, 2, "relu", cfg.norm)
        xs.append(x)
    return xs


def gru_x_gates(params, cfg: ModelConfig, xs: Sequence[Any],
                modality: str) -> List[Any]:
    """Per-scale precomputed x-side recurrent gate contributions (layers
    .conv_gru_x_gates / .conv_lstm_x_gates) for the given
    encoder_features."""
    combs = params["state_combination_events" if modality == "events"
                   else "state_combination_images"]
    fn = (L.conv_lstm_x_gates if cfg.state_combination == "convlstm"
          else L.conv_gru_x_gates)
    # remat-policy tag (trainer.remat_policy='gru_gx', with
    # trainer.precompute_x): lets the per-step jax.checkpoint SAVE the
    # per-scale x-side gate pre-activations so the backward skips the
    # head+encoder+gate-conv recompute entirely (~60% of the step's
    # recomputed MACs).  Identity outside a policy'd checkpoint.  Memory
    # cost is the point of the A/B: ~135 MB/sweep at the flagship shapes,
    # stacked over all L steps of the window.
    return [jax.ad_checkpoint.checkpoint_name(fn(c["recurrent_block"], x),
                                              "gru_gx")
            for c, x in zip(combs, xs)]


def _use_fused_cell(cfg: ModelConfig, hidden, lstm: bool = False) -> bool:
    """cfg.fused_gru policy for a per-scale hidden array (the convgru and
    convlstm fused Pallas cells differ only in VMEM budget)."""
    mode = getattr(cfg, "fused_gru", "auto")
    if mode == "off":
        return False
    from ..ops import gru_hside
    if not gru_hside.supports(hidden, lstm=lstm):
        return False
    if mode == "on":
        return True
    # auto: single-chip TPU only — the Pallas kernels ignore shardings, so
    # under a multi-device mesh they'd silently compute on unsharded
    # layouts; 'on' overrides for callers who know their arrays are
    # replicated/unsharded
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def combine_hside(params, cfg: ModelConfig, supers: Tuple, gx_scales,
                  modality: str, allow_fused: bool = False) -> Tuple:
    """One modality step of per-scale recurrent state combination from
    precomputed x-side gates (the sequential h-side only).  supers are
    per-scale arrays for convgru, (hidden, cell) tuples for convlstm.

    allow_fused: permit the Pallas fused GRU cell (cfg.fused_gru policy;
    ops/gru_hside.py — 2.1x XLA at the flagship scale-0).  Round 3: the
    fused cells carry a custom VJP, so gradient consumers
    (trainer.precompute_x) may set this too."""
    combs = params["state_combination_events" if modality == "events"
                   else "state_combination_images"]
    if cfg.state_combination == "convlstm":
        if allow_fused:
            from ..ops.gru_hside import conv_lstm_hside_fused

            def fn(p, g, s):
                if _use_fused_cell(cfg, s[0], lstm=True):
                    return conv_lstm_hside_fused(p, g, s)
                return L.conv_lstm_apply_hside(p, g, s)
        else:
            fn = L.conv_lstm_apply_hside
    elif allow_fused:
        from ..ops.gru_hside import conv_gru_hside_fused

        def fn(p, g, s):
            if _use_fused_cell(cfg, s):
                return conv_gru_hside_fused(p, g, s)
            return L.conv_gru_apply_hside(p, g, s)

        # cross-scale merged launch (ops/gru_pair): scales 0+1 in ONE
        # pallas_call — removes one custom-call boundary (~31 us of XLA
        # while bookkeeping) per modality step.  Opt-in via
        # cfg.fused_pair='on' (inference paths; no VJP).
        if (getattr(cfg, "fused_pair", "auto") == "on" and len(supers) >= 2
                and _use_fused_cell(cfg, supers[0])
                and _use_fused_cell(cfg, supers[1])):
            from ..ops import gru_pair
            if gru_pair.supports_pair(supers[0], supers[1]):
                h0, h1 = gru_pair.conv_gru_hside_pair(
                    combs[0]["recurrent_block"], combs[1]["recurrent_block"],
                    gx_scales[0], gx_scales[1], supers[0], supers[1])
                rest = tuple(fn(c["recurrent_block"], g, s)
                             for c, g, s in zip(combs[2:], gx_scales[2:],
                                                supers[2:]))
                return (h0, h1) + rest
    else:
        fn = L.conv_gru_apply_hside
    return tuple(fn(c["recurrent_block"], g, s)
                 for c, g, s in zip(combs, gx_scales, supers))


_fused_decoder_mesh_warned = False
_composed_auto_announced = False


def _use_fused_decoder(cfg: ModelConfig, x, cout: int) -> bool:
    """cfg.fused_decoder policy for one upsample-conv layer (the fused
    Pallas upsample+5x5 kernel, ops/upsample_conv.py).

    MEASURED DEAD-END on v5e, kept opt-in ('on') only — 'auto' is OFF:
    the kernel wins ISOLATED per-layer microbenches at small batch (up to
    1.94x at B=6, exp/upsample_conv_hw.json) but loses IN CONTEXT
    everywhere it was tried: chunked bf16 record 810 -> 716 maps/s (the
    96-deep decode batch lets XLA's conv amortize far better while the
    VMEM-budgeted tiles cannot grow — tile_h=8 OOMs the compile — and the
    column-upsample interleave pass scales linearly,
    exp/upsample_conv_b96.json); per-package latency mode 494 -> 271.
    Same pathology as the full fused GRU cell (PERF.md): custom-call
    operand layout constraints force relayouts of XLA-produced inputs
    that XLA's own conv fusions avoid.

    Like the fused cells, the kernel ignores shardings — 'on' is
    single-device only (warned once under a multi-device mesh)."""
    mode = getattr(cfg, "fused_decoder", "auto")
    if mode != "on":
        return False
    from ..ops import upsample_conv
    if not upsample_conv.supports(x, cout):
        return False
    if jax.device_count() > 1 and jax.default_backend() == "tpu":
        # explicit opt-in stays honored (interpret-mode tests run on a
        # multi-device CPU mesh), but make the hazard visible: the kernel
        # ignores shardings, so sharded inputs would compute on unsharded
        # layouts
        global _fused_decoder_mesh_warned
        if not _fused_decoder_mesh_warned:
            _fused_decoder_mesh_warned = True
            import warnings
            warnings.warn(
                "model.fused_decoder='on' under a multi-device mesh: the "
                "Pallas decoder kernel ignores shardings — it is intended "
                "for single-device runs; outputs on sharded inputs will "
                "gather to unsharded layouts", stacklevel=2)
    return True


def _use_composed_decoder(cfg: ModelConfig, x) -> bool:
    """cfg.composed_decoder policy for one upsample-conv layer: the
    composed stride-2 transposed-conv formulation
    (layers.upsample_conv_layer_composed_apply — pure XLA, differentiable,
    sharding-safe).  auto = LARGE decode batches (>= 24) in bf16 on TPU:
    measured 1.5-1.6x XLA on the two narrow layers at the 96-deep chunked
    decode batch but a LOSS at latency-mode batches
    (exp/decoder_composed_probe.json).  Callers gate with allow_composed
    so the bit-identical deferred-decode contract survives by default."""
    mode = getattr(cfg, "composed_decoder", "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    on = (jax.default_backend() == "tpu" and x.dtype == jnp.bfloat16
          and x.shape[0] >= 24)
    if on:
        # surface the auto-flip once: bf16 deferred-decode TRAINING configs
        # with decode batch >= 24 silently changed decoder summation order
        # (and hence loss/gradient bits) when this gate landed in round 3 —
        # make the reproducibility change visible at trace time
        global _composed_auto_announced
        if not _composed_auto_announced:
            _composed_auto_announced = True
            import logging
            logging.getLogger(__name__).info(
                "composed_decoder auto-engaged (TPU bf16 decode batch %d "
                ">= 24): decoder float summation order deviates from the "
                "two-stage layers at float tolerance; set "
                "model.composed_decoder='off' for bitwise reproducibility "
                "of pre-round-3 runs", x.shape[0])
    return on


def supers_decoder_view(cfg: ModelConfig, supers: Tuple) -> Tuple:
    """decoder_view on a bare supers tuple (hidden parts only)."""
    return tuple(_super_hidden(cfg, s) for s in supers)


def decoder_view(cfg: ModelConfig, state: StateNetState) -> Tuple:
    """The per-scale tensors the decoder actually reads: hidden parts only.
    Deferred-decode snapshots stack THIS instead of the full state — the
    convlstm cells and the encoder recurrent states never feed the decoder,
    so snapshotting them would double the scan-output HBM traffic."""
    return tuple(_super_hidden(cfg, s) for s in state.super_states)


def forward_decoder(params, cfg: ModelConfig, state: StateNetState,
                    norm_ctx=None, allow_fused: bool = False,
                    allow_composed: bool = False):
    """Shared decoder over the current super states (statenet.py:290-315).

    First decoder consumes the deepest super state (no skip); subsequent
    decoders skip-connect the shallower super states; 1x1 pred conv +
    activation (sigmoid), NO head skip.
    """
    return forward_decoder_supers(params, cfg, decoder_view(cfg, state),
                                  norm_ctx=norm_ctx, allow_fused=allow_fused,
                                  allow_composed=allow_composed)


def forward_decoder_supers(params, cfg: ModelConfig, supers: Tuple,
                           norm_ctx=None, allow_fused: bool = False,
                           allow_composed: bool = False):
    """forward_decoder on a pre-extracted `decoder_view` tuple (per-scale
    hidden tensors).

    allow_fused: permit the fused Pallas upsample+5x5-conv decoder kernel
    (ops/upsample_conv.py; INFERENCE paths only — it defines no VJP) for
    norm-free sum/no_skip upsample-conv layers; cfg.fused_decoder policy +
    shape support gate per layer.
    allow_composed: permit the composed transposed-conv upsample layers
    (layers.upsample_conv_layer_composed_apply; differentiable, pure XLA
    — float-summation-order deviation only).  Set by paths whose outputs
    are already not bit-identical (the precomputed inference path) or
    that opt in (deferred-decode training); cfg.composed_decoder policy +
    batch-size gate per call (statenet._use_composed_decoder)."""
    x = supers[-1]
    for ri, rb in enumerate(params["resblocks"]):
        x = L.residual_block_apply(rb, x, cfg.norm,
                                   ctx=norm_ctx, path=f"resblocks.{ri}")
    n = cfg.num_encoders
    fuse_layers = (allow_fused and cfg.use_upsample_conv
                   and not cfg.fast_upsample and cfg.norm is None
                   and cfg.skip_type in ("sum", "no_skip"))
    composed_layers = (allow_composed and cfg.use_upsample_conv
                       and not cfg.fast_upsample and cfg.norm is None)
    for i, dec in enumerate(params["decoders"]):
        skip_t = supers[n - i - 1] if i > 0 else None
        if fuse_layers and _use_fused_decoder(
                cfg, x, dec["conv2d"]["weight"].shape[-1]):
            from ..ops.upsample_conv import upsample_conv_fused
            sk = skip_t if cfg.skip_type == "sum" else None
            x = upsample_conv_fused(dec, x, skip=sk, activation="relu")
            continue
        if skip_t is not None:
            x = _skip(cfg, x, skip_t)
        if composed_layers and _use_composed_decoder(cfg, x):
            x = L.upsample_conv_layer_composed_apply(dec, x, "relu")
            continue
        if cfg.use_upsample_conv:
            if cfg.fast_upsample:
                x = L.upsample_conv_layer_fast_apply(
                    dec, x, 2, "relu", cfg.norm,
                    ctx=norm_ctx, path=f"decoders.{i}")
            else:
                x = L.upsample_conv_layer_apply(
                    dec, x, 2, "relu", cfg.norm,
                    ctx=norm_ctx, path=f"decoders.{i}")
        else:
            x = L.transposed_conv_layer_apply(
                dec, x, 2, "relu", cfg.norm,
                ctx=norm_ctx, path=f"decoders.{i}")
    pred = L.conv_layer_apply(params["pred"], x, 1, 0, None, cfg.norm,
                              ctx=norm_ctx, path="pred")
    # predictions/losses stay float32 regardless of compute dtype
    return L._activation_fn(cfg.activation)(pred.astype(jnp.float32))
