"""Task-level model architectures (ERGB2Depth, ERGB2DepthRecurrent).

Capability reference: RAM_Net/model/model.py:79-219.  The reference threads
python dicts through per-step module calls; here each architecture exposes

  init_params(key, cfg)                       -> params pytree
  init_state(cfg, B, H, W)                    -> state pytree (zeros)
  forward_package(params, cfg, state, pkg)    -> (state, {key: pred})
  forward_sequence(params, cfg, state, seq)   -> (state, {key: [L, ...] preds})

where a "datapackage" pkg is {'events': [B, K, H, W, Ce], 'image':
[B, H, W, Ci]} — K event voxel grids followed by one frame, mirroring the
reference datapackage keys events0..K-1/image (data_loader/dataset.py:331-415).
forward_sequence runs the L datapackages of a TBPTT window under lax.scan.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.registry import MODELS
from . import statenet, unet


def event_loop_range(cfg: ModelConfig) -> int:
    """Number of event sub-steps per datapackage (model/model.py:161-175)."""
    if not cfg.is_baseline:
        return cfg.every_x_rgb_frame
    if cfg.baseline == "ergb0" or (
            cfg.baseline == "e" and cfg.loss_composition == "image"):
        return cfg.every_x_rgb_frame - 1
    return 0  # 'rgb', 'ergb', plain 'e': no separate event steps


def prediction_keys(cfg: ModelConfig) -> Tuple[str, ...]:
    return tuple(f"events{k}" for k in range(event_loop_range(cfg))) + ("image",)


def _checkpoint_with_policy(step, remat_policy):
    """jax.checkpoint for the per-package scan step.  remat_policy: None /
    'none' = save nothing (recompute the whole step in the backward);
    otherwise a '+'-joined list of checkpoint_name tags to SAVE (e.g.
    'enc_out' — statenet tags the per-scale encoder conv outputs), trading
    activation HBM for skipped recompute (trainer.remat_policy)."""
    if not remat_policy or remat_policy == "none":
        return jax.checkpoint(step)
    pol = jax.checkpoint_policies.save_only_these_names(
        *remat_policy.split("+"))
    return jax.checkpoint(step, policy=pol)


_TL_RENAME = {"events_tcf": "events_cf", "image_tcf": "image_cf",
              "times_events_t": "times_events", "times_image_t": "times_image",
              "reset_t": "reset"}


def _time_leading_seq(seq):
    """Normalize a sequence dict to time-leading scan inputs.  '*_tcf'/'*_t'
    keys arrive already time-leading from pack_train_batch / chunked loaders
    (no in-jit transpose: an XLA copy of the whole sequence into a
    lane-padded layout would cost up to 25x HBM, see PERF.md); plain keys
    are transposed here.  'reset'/'reset_t' [B, L]/[L, B] bool zeroes the
    recurrent state before the flagged package (lane-batched chunked
    streaming: sequence boundaries fall mid-chunk)."""
    seq_t = {}
    for k, v in seq.items():
        if k in _TL_RENAME:
            seq_t[_TL_RENAME[k]] = v
        elif k in ("events", "image", "times_events", "times_image", "reset"):
            seq_t[k] = jnp.moveaxis(v, 1, 0)
    return seq_t


def _apply_reset(reset, tree):
    """Zero the per-lane leaves of a state pytree where reset [B] is set."""
    if reset is None:
        return tree

    def mask_leaf(leaf):
        m = reset.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, jnp.zeros_like(leaf), leaf)

    return jax.tree_util.tree_map(mask_leaf, tree)


def _package_snapshot_step(params, cfg: ModelConfig, state, pkg, sel_keys,
                           allow_fused=False):
    """One datapackage of state updates (K event steps + image step, NO
    decodes), returning the batch-concatenated decoder_view snapshots for
    `sel_keys` — the shared body of both batched-decode paths.  Snapshots
    carry hidden parts only: convlstm cells and encoder recurrent states
    never feed the decoder (statenet.decoder_view)."""
    from . import statenet
    loop = event_loop_range(cfg)
    event_modality = "image" if cfg.is_baseline else "events"
    times_ev = pkg.get("times_events") if cfg.use_phased_arch else None
    times_im = pkg.get("times_image") if cfg.use_phased_arch else None
    state = _apply_reset(pkg.get("reset"), state)
    snaps = []
    for k in range(loop):
        if "events_cf" in pkg:
            x, layout = pkg["events_cf"][:, k], "NCHW"
        else:
            x, layout = pkg["events"][:, k], "NHWC"
        t = times_ev[:, k] if times_ev is not None else None
        state = statenet.forward_modality(params, cfg, x, state,
                                          event_modality, times=t,
                                          input_layout=layout,
                                          allow_fused=allow_fused)
        if f"events{k}" in sel_keys:
            snaps.append(statenet.decoder_view(cfg, state))
    img, layout = ((pkg["image_cf"], "NCHW") if "image_cf" in pkg
                   else (pkg["image"], "NHWC"))
    state = statenet.forward_modality(params, cfg, img, state, "image",
                                      times=times_im, input_layout=layout,
                                      allow_fused=allow_fused)
    if "image" in sel_keys:
        snaps.append(statenet.decoder_view(cfg, state))
    # [S*B, h, w, c] per leaf — fold the step axis into batch so a scan
    # stacks a single batch-major buffer per scale
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *snaps)
    return state, stacked


def _package_snapshot_step_pre(params, cfg: ModelConfig, state, pkg,
                               sel_keys, allow_fused=False):
    """_package_snapshot_step with the package's x-side work batched:
    the K event encoder sweeps + x-side GRU gate convs run as ONE (K*B)-deep
    pass (they are state-independent under recurrent_block_type='conv'),
    leaving only the K+1 h-side GRU completions sequential.  gx memory is
    bounded to one package, so this composes with remat'd training scans
    (unlike forward_sequence_precomputed's whole-chunk buffers).
    allow_fused: permit the Pallas fused h-side cells (round 3: they carry
    a custom VJP, so GRADIENT consumers may set this too)."""
    loop = event_loop_range(cfg)
    if "events_cf" in pkg:
        ev, layout = pkg["events_cf"], "NCHW"    # [B, K, C, H, W]
    else:
        ev, layout = pkg["events"], "NHWC"       # [B, K, H, W, C]
    b = ev.shape[0]
    ev_flat = ev.reshape((b * loop,) + ev.shape[2:])
    gx_ev = [g.reshape((b, loop) + g.shape[1:])
             for g in statenet.gru_x_gates(
                 params, cfg,
                 statenet.encoder_features(params, cfg, ev_flat, "events",
                                           layout),
                 "events")]
    img, im_layout = ((pkg["image_cf"], "NCHW") if "image_cf" in pkg
                      else (pkg["image"], "NHWC"))
    gx_im = statenet.gru_x_gates(
        params, cfg,
        statenet.encoder_features(params, cfg, img, "image", im_layout),
        "image")
    supers = _apply_reset(pkg.get("reset"), tuple(state.super_states))
    supers, stacked = _hside_package(params, cfg, supers, gx_ev, gx_im,
                                     sel_keys, loop,
                                     allow_fused=allow_fused)
    return state._replace(super_states=supers), stacked


def _hside_package(params, cfg: ModelConfig, supers, gev, gim, sel_keys,
                   loop, allow_fused=False):
    """The sequential h-side completions of one package from precomputed
    x-side gates (gev: per-scale [B, loop, h, w, gC]; gim: per-scale
    [B, h, w, gC]), returning new supers and the batch-concatenated
    hidden-only snapshots for sel_keys — shared by
    _package_snapshot_step_pre and forward_sequence_precomputed."""
    snaps = []
    for k in range(loop):
        supers = statenet.combine_hside(
            params, cfg, supers, [g[:, k] for g in gev], "events",
            allow_fused=allow_fused)
        if f"events{k}" in sel_keys:
            snaps.append(statenet.supers_decoder_view(cfg, supers))
    supers = statenet.combine_hside(params, cfg, supers, gim, "image",
                                    allow_fused=allow_fused)
    if "image" in sel_keys:
        snaps.append(statenet.supers_decoder_view(cfg, supers))
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *snaps)
    return supers, stacked


def _decode_snapshots(params, cfg: ModelConfig, snapshots, sel_keys, l, b,
                      squeeze_preds, allow_fused_decoder=False,
                      allow_composed=False):
    """ONE decoder pass over scan-stacked snapshot pyramids (leaves
    [L, S*B, h, w, c]), regrouped into per-key [L, B, H, W(, 1)] preds —
    the shared tail of the deferred-decode sequence paths.
    allow_fused_decoder: permit the Pallas upsample-conv decoder kernel
    (inference callers only — no VJP).
    allow_composed: permit the composed transposed-conv upsample layers
    (differentiable; float-summation deviation only)."""
    flat = jax.tree_util.tree_map(
        lambda v: v.reshape((-1,) + v.shape[2:]), snapshots)
    batched_preds = statenet.forward_decoder_supers(
        params, cfg, flat, allow_fused=allow_fused_decoder,
        allow_composed=allow_composed)
    # [L, S, B, H, W, 1] -> per-key [L, B, H, W, 1]
    grouped = batched_preds.reshape((l, len(sel_keys), b)
                                    + batched_preds.shape[1:])
    preds = {}
    for i, key in enumerate(sel_keys):
        p = grouped[:, i]
        preds[key] = p[..., 0] if squeeze_preds else p
    return preds


@MODELS.register("ERGB2DepthRecurrent")
class ERGB2DepthRecurrent:
    """The RAM-Net model (model/model.py:114-219)."""

    @staticmethod
    def init_params(key, cfg: ModelConfig, dtype=jnp.float32):
        return statenet.init_params(key, cfg, dtype)

    @staticmethod
    def init_state(cfg: ModelConfig, batch: int, height: int, width: int,
                   dtype=None):
        return statenet.init_state(cfg, batch, height, width, dtype)

    @staticmethod
    def forward_package(params, cfg: ModelConfig, state, pkg,
                        decode_keys: Optional[Sequence[str]] = None,
                        norm_ctx=None, allow_fused: bool = False,
                        allow_fused_decoder: bool = False,
                        allow_composed: bool = False):
        """One datapackage: K event steps then the image step, decoding after
        every modality update (dense supervision, model.py:176-217).

        decode_keys: restrict decoder invocations (e.g. to the supervised
        keys during training — gradients are identical since unsupervised
        decodes don't feed the loss; reference decodes all).
        norm_ctx: layers.NormCtx for training-mode BN/IN.
        allow_composed: permit the composed transposed-conv upsample layers
        (explicit cfg.composed_decoder='on' opt-in from the inference
        engines — per-package decode batches only reach the >=24 auto gate
        at high lane counts anyway).
        """
        preds: Dict[str, Any] = {}
        loop = event_loop_range(cfg)
        state = _apply_reset(pkg.get("reset"), state)
        # baselines route events through the image encoder (model.py:181-189)
        event_modality = "image" if cfg.is_baseline else "events"
        times_ev = pkg.get("times_events") if cfg.use_phased_arch else None
        times_im = pkg.get("times_image") if cfg.use_phased_arch else None
        # channel-first sequence storage ('events_cf' [B,K,C,H,W] /
        # 'image_cf' [B,C,H,W]): tiny channel counts on the lane-minor dim
        # make XLA pad stacked TBPTT tensors up to 25x on TPU.  The head
        # conv consumes NCHW directly (dimension_numbers) so no transpose
        # exists for XLA to hoist into a padded full-sequence buffer
        # (see PERF.md).
        for k in range(loop):
            if "events_cf" in pkg:
                x, layout = pkg["events_cf"][:, k], "NCHW"
            else:
                x, layout = pkg["events"][:, k], "NHWC"
            t = times_ev[:, k] if times_ev is not None else None
            state = statenet.forward_modality(params, cfg, x, state,
                                              event_modality, times=t,
                                              input_layout=layout,
                                              norm_ctx=norm_ctx,
                                              allow_fused=allow_fused)
            key = f"events{k}"
            if decode_keys is None or key in decode_keys:
                preds[key] = statenet.forward_decoder(
                    params, cfg, state, norm_ctx=norm_ctx,
                    allow_fused=allow_fused_decoder,
                    allow_composed=allow_composed)
        if "image_cf" in pkg:
            img, layout = pkg["image_cf"], "NCHW"
        else:
            img, layout = pkg["image"], "NHWC"
        state = statenet.forward_modality(params, cfg, img, state,
                                          "image", times=times_im,
                                          input_layout=layout,
                                          norm_ctx=norm_ctx,
                                          allow_fused=allow_fused)
        if decode_keys is None or "image" in decode_keys:
            preds["image"] = statenet.forward_decoder(
                params, cfg, state, norm_ctx=norm_ctx,
                allow_fused=allow_fused_decoder,
                allow_composed=allow_composed)
        return state, preds

    @staticmethod
    def forward_package_batched_decode(params, cfg: ModelConfig, state, pkg,
                                       allow_fused: bool = False,
                                       allow_fused_decoder: bool = False,
                                       allow_composed: bool = False):
        """Identical math to forward_package, but the K+1 decoder passes run
        as ONE batched pass: the per-step super-state pyramids are stacked
        on the batch dim and decoded together.  Decodes do not feed back
        into the recurrent state, so outputs are bit-identical per sample;
        the (K+1)x decoder batch fills the MXU better for small lane counts
        (the decoder is ~57% of package time, PERF.md).  The phased
        (irregular-timestamp) regime is supported: times feed only the
        PhasedLSTM gates inside forward_modality — the decoder reads just
        the super states, so deferring decodes is orthogonal."""
        keys = prediction_keys(cfg)
        state, stacked = _package_snapshot_step(params, cfg, state, pkg, keys,
                                                allow_fused=allow_fused)
        batched_preds = statenet.forward_decoder_supers(
            params, cfg, stacked, allow_fused=allow_fused_decoder,
            allow_composed=allow_composed)
        b = (pkg["image_cf"] if "image_cf" in pkg else pkg["image"]).shape[0]
        preds = {}
        for i, key in enumerate(keys):
            preds[key] = batched_preds[i * b:(i + 1) * b]
        return state, preds

    @staticmethod
    def forward_sequence_batched_decode(params, cfg: ModelConfig, state, seq,
                                        decode_keys: Optional[Sequence[str]] = None,
                                        remat: bool = False,
                                        squeeze_preds: bool = False,
                                        package_precompute: bool = False,
                                        allow_fused: bool = False,
                                        allow_fused_decoder: bool = False,
                                        allow_composed: bool = False,
                                        remat_policy: Optional[str] = None):
        """forward_sequence with ALL decodes deferred and batched: lax.scan
        runs only the sequential work (encoders + per-scale recurrent state
        combination), stacking the per-package super-state pyramids; ONE
        decoder pass then processes all L*S*B snapshots (S = number of
        decoded keys).

        Outputs are bit-identical per package to forward_sequence — decodes
        never feed the recurrent state (model/model.py:176-217 reads only
        super_states) — but the decoder (~57% of package time, narrow
        C_out in {1,32,64} that a sequential pass cannot fill the 128-lane
        MXU with) runs at an L*S-deep batch.

        Two consumers:
        * offline / throughput streaming (test.py --scan_chunk; recorded
          sequences, per-package latency irrelevant); chunk L bounds
          snapshot memory (~15 MB f32 per lane-step at 256x512);
        * training (trainer.deferred_decode): decode_keys = the supervised
          keys; with remat=True only the encoder+GRU scan step is
          checkpointed — the decoder runs ONCE outside the scan with
          normally-stored activations, so its recompute cost disappears
          from the backward entirely.

        seq: same layout as forward_sequence.  Returns (state, {key:
        [L, B, H, W, 1]} or squeezed [L, B, H, W]).  The phased (times)
        regime is supported — times feed only the PhasedLSTM gates in the
        scan; the decoder is unaffected.  Training-mode BN/IN (norm_stats)
        is NOT supported here: batch statistics over the stacked decode
        batch would differ from the reference's per-step statistics.

        package_precompute: batch each package's state-independent x-side
        work (encoder sweeps + ConvGRU x-side gate convs, a (K*B)-deep
        pass) inside the scan step — see _package_snapshot_step_pre.
        Unlike forward_sequence_precomputed, gx memory stays bounded to
        one package, so this composes with remat (trainer.precompute_x).
        Gradients equal to float-summation order (~1 ulp, NOT bitwise)."""
        sel_keys = [k for k in prediction_keys(cfg)
                    if decode_keys is None or k in decode_keys]
        if not sel_keys:
            # nothing to decode (e.g. a decode_keys typo): degrade exactly
            # like forward_sequence — state updates + empty preds — rather
            # than tracing a zero-tree stack
            return ERGB2DepthRecurrent.forward_sequence(
                params, cfg, state, seq, decode_keys=(), remat=remat,
                squeeze_preds=squeeze_preds)

        if package_precompute and not statenet.supports_x_precompute(cfg):
            raise ValueError(
                "package_precompute requires recurrent_block_type='conv' + "
                "convgru/convlstm state combination (non-baseline)")
        step_fn = (_package_snapshot_step_pre if package_precompute
                   else _package_snapshot_step)

        def step(state, pkg):
            return step_fn(params, cfg, state, pkg, sel_keys,
                           allow_fused=allow_fused)

        if remat:
            step = _checkpoint_with_policy(step, remat_policy)

        seq_t = _time_leading_seq(seq)
        final_state, snapshots = jax.lax.scan(step, state, seq_t)
        img_t = seq_t["image_cf"] if "image_cf" in seq_t else seq_t["image"]
        preds = _decode_snapshots(params, cfg, snapshots, sel_keys,
                                  img_t.shape[0], img_t.shape[1],
                                  squeeze_preds,
                                  allow_fused_decoder=allow_fused_decoder,
                                  allow_composed=allow_composed)
        return final_state, preds

    @staticmethod
    def forward_sequence_precomputed(params, cfg: ModelConfig, state, seq,
                                     decode_keys: Optional[Sequence[str]] = None,
                                     squeeze_preds: bool = False,
                                     unroll: int = 1,
                                     chunk_cells: bool = False,
                                     stream_cells: Optional[bool] = None):
        """forward_sequence_batched_decode with the per-step x-side work ALSO
        hoisted out of the scan: for recurrent_block_type='conv' +
        state_combination='convgru' (the flagship recipe) the encoder chain
        is state-independent (statenet.py:204-239 — head + strided convs
        see only the input), and each ConvGRU gate conv on cat(x, h) splits
        into conv_x(x) + conv_h(h).  So:

          1. ONE batched pass runs head+encoders+GRU-x-side gate convs for
             all L*(K+1) steps (events and image separately — disjoint
             params);
          2. the lax.scan carries only the per-scale h-side GRU completions
             (HALF the GRU conv MACs — the sequential critical path);
          3. one batched decoder pass over the selected snapshots, as in
             forward_sequence_batched_decode.

        Outputs match forward_sequence to float-summation order (the split
        conv sums its halves post-dot; ~1 ulp — NOT bit-identical, unlike
        the pure deferred-decode paths).  Inference-path only: no remat /
        norm_stats (the full-sequence gx buffers are the point — in
        training they would displace the remat savings).

        seq: same layouts as forward_sequence ('events'/'image' batch-
        leading or '*_tcf' time-leading channel-first)."""
        if not statenet.supports_x_precompute(cfg):
            raise ValueError(
                "forward_sequence_precomputed requires recurrent_block_type="
                "'conv' + convgru/convlstm state combination (non-baseline); "
                "got "
                f"{cfg.recurrent_block_type}/{cfg.state_combination}")
        sel_keys = [k for k in prediction_keys(cfg)
                    if decode_keys is None or k in decode_keys]
        if not sel_keys:
            return ERGB2DepthRecurrent.forward_sequence_batched_decode(
                params, cfg, state, seq, decode_keys=(),
                squeeze_preds=squeeze_preds)
        loop = event_loop_range(cfg)
        seq_t = _time_leading_seq(seq)
        ev, ev_layout = ((seq_t["events_cf"], "NCHW")
                         if "events_cf" in seq_t
                         else (seq_t["events"], "NHWC"))
        img, im_layout = ((seq_t["image_cf"], "NCHW")
                          if "image_cf" in seq_t
                          else (seq_t["image"], "NHWC"))
        l, b, kk = ev.shape[0], ev.shape[1], ev.shape[2]
        assert kk == loop, (kk, loop)
        # flatten (l, b, k) -> batch: pure reshapes, no transposes (the
        # in-scan step indexes gx[:, k] instead)
        ev_flat = ev.reshape((l * b * loop,) + ev.shape[3:])
        im_flat = img.reshape((l * b,) + img.shape[2:])
        gx_ev = [g.reshape((l, b, loop) + g.shape[1:])
                 for g in statenet.gru_x_gates(
                     params, cfg,
                     statenet.encoder_features(params, cfg, ev_flat,
                                               "events", ev_layout),
                     "events")]
        gx_im = [g.reshape((l, b) + g.shape[1:])
                 for g in statenet.gru_x_gates(
                     params, cfg,
                     statenet.encoder_features(params, cfg, im_flat,
                                               "image", im_layout),
                     "image")]

        # the reset mask joins the scan inputs only when a caller supplies
        # one (lane-batched chunked streaming) — an all-False mask would
        # cost a traced select over every state leaf per step
        reset_t = seq_t.get("reset")

        if chunk_cells:
            # opt-in: run ALL S = l*(K+1) sequential h-side completions of
            # each scale in ONE resident-state Pallas call (ops/gru_chunk)
            # instead of a lax.scan of per-step cells — h stays in VMEM
            # for the whole chunk, only the x-side gates stream in.
            from ..ops import gru_chunk
            if (cfg.state_combination != "convgru" or b != 1
                    or reset_t is not None
                    or not all(gru_chunk.supports(s)
                               for s in state.super_states)):
                raise ValueError(
                    "chunk_cells requires convgru state combination, "
                    "batch 1, no reset mask, and bf16 super states within "
                    "the kernel's VMEM envelope")
            sel_pos = [loop if k == "image" else int(k[len("events"):])
                       for k in sel_keys]
            combs_ev = params["state_combination_events"]
            combs_im = params["state_combination_images"]
            new_supers, snaps_scales = [], []
            for i, h0 in enumerate(state.super_states):
                gev = gx_ev[i].reshape((l * loop,) + gx_ev[i].shape[3:])
                gim = gx_im[i].reshape((l,) + gx_im[i].shape[2:])
                gseq = jnp.concatenate(
                    [gev.reshape((l, loop) + gev.shape[1:]),
                     gim[:, None]], axis=1).reshape(
                         (l * (loop + 1),) + gev.shape[1:])
                snaps = gru_chunk.conv_gru_hside_chunk(
                    combs_ev[i]["recurrent_block"],
                    combs_im[i]["recurrent_block"], gseq, h0, K=loop)
                new_supers.append(snaps[-1:])
                per_pkg = snaps.reshape((l, loop + 1) + snaps.shape[1:])
                snaps_scales.append(
                    per_pkg if sel_pos == list(range(loop + 1))
                    else per_pkg[:, jnp.asarray(sel_pos)])
            preds = _decode_snapshots(params, cfg, tuple(snaps_scales),
                                      sel_keys, l, b, squeeze_preds,
                                      allow_fused_decoder=True,
                                      allow_composed=True)
            return state._replace(super_states=tuple(new_supers)), preds

        if stream_cells is None:
            stream_cells = getattr(cfg, "fused_stream", "auto") == "on"
        if stream_cells:
            # round 4: gx-STREAMING cells — the scan closes over the full
            # gx buffers and carries only the package index; each cell
            # reads its gx block via a scalar-prefetched BlockSpec index
            # map, so the per-step slice materialization that custom-call
            # operands force disappears (ops/gru_stream.py).
            from ..ops import gru_stream
            if (cfg.state_combination != "convgru" or b != 1
                    or reset_t is not None
                    or not all(gru_stream.supports(s)
                               for s in state.super_states)):
                raise ValueError(
                    "stream_cells requires convgru state combination, "
                    "batch 1, no reset mask, and fused-cell-supported "
                    "(bf16, aligned) super states")
            combs_e = params["state_combination_events"]
            combs_i = params["state_combination_images"]
            plans = [gru_stream.StreamPlan(
                         combs_e[i]["recurrent_block"],
                         combs_i[i]["recurrent_block"],
                         gx_ev[i], gx_im[i], state.super_states[i])
                     for i in range(len(state.super_states))]

            # optional cross-scale merge: scales 0+1 share one launch per
            # step (the gru_pair dispatch structure + streamed gx)
            pair = (getattr(cfg, "fused_pair", "auto") == "on"
                    and len(plans) >= 2)

            def one_step(supers, pkg_idx, k):
                if pair:
                    h0, h1 = gru_stream.stream_pair_step(
                        plans[0], plans[1], supers[0], supers[1], pkg_idx, k)
                    rest = tuple(pl_.step(h, pkg_idx, k)
                                 for pl_, h in zip(plans[2:], supers[2:]))
                    return (h0, h1) + rest
                return tuple(pl_.step(h, pkg_idx, k)
                             for pl_, h in zip(plans, supers))

            def stream_step(supers, pkg_idx):
                snaps = []
                for k in range(loop):
                    supers = one_step(supers, pkg_idx, k)
                    if f"events{k}" in sel_keys:
                        snaps.append(statenet.supers_decoder_view(cfg,
                                                                  supers))
                supers = one_step(supers, pkg_idx, None)
                if "image" in sel_keys:
                    snaps.append(statenet.supers_decoder_view(cfg, supers))
                stacked = jax.tree_util.tree_map(
                    lambda *leaves: jnp.concatenate(leaves, axis=0), *snaps)
                return supers, stacked

            final_supers, snapshots = jax.lax.scan(
                stream_step, tuple(state.super_states),
                jnp.arange(l, dtype=jnp.int32), unroll=unroll)
            preds = _decode_snapshots(params, cfg, snapshots, sel_keys, l,
                                      b, squeeze_preds,
                                      allow_fused_decoder=True,
                                      allow_composed=True)
            return state._replace(super_states=final_supers), preds

        def step(supers, gx):
            reset = gx[2] if len(gx) == 3 else None
            supers = _apply_reset(reset, supers)
            # inference-only path: the fused Pallas GRU cell is allowed
            # (no VJP; training uses _package_snapshot_step_pre)
            return _hside_package(params, cfg, supers, gx[0], gx[1],
                                  sel_keys, loop, allow_fused=True)

        xs = (tuple(gx_ev), tuple(gx_im))
        if reset_t is not None:
            xs = xs + (reset_t,)
        # unroll: merge scan bodies so the per-step snapshot
        # dynamic-update-slices get static offsets and XLA fuses the loop
        # glue (the record trace charges ~0.56 ms/pkg to while-loop
        # bookkeeping around 1.07 ms of cell work)
        final_supers, snapshots = jax.lax.scan(
            step, tuple(state.super_states), xs, unroll=unroll)
        # inference-only path (~1 ulp already): fused Pallas decoder
        # kernel + composed transposed-conv layers allowed
        preds = _decode_snapshots(params, cfg, snapshots, sel_keys, l, b,
                                  squeeze_preds, allow_fused_decoder=True,
                                  allow_composed=True)
        return state._replace(super_states=final_supers), preds

    @staticmethod
    def forward_sequence(params, cfg: ModelConfig, state, seq,
                         decode_keys: Optional[Sequence[str]] = None,
                         remat: bool = False, squeeze_preds: bool = False,
                         norm_stats=None, remat_chunk: int = 1,
                         remat_policy: Optional[str] = None):
        """seq: {'events': [B, L, K, H, W, Ce], 'image': [B, L, H, W, Ci]}
        (or the channel-first variants 'events_cf' [B, L, K, Ce, H, W] /
        'image_cf' [B, L, Ci, H, W] — see forward_package).
        Scans the per-package step over L (the reference's TBPTT inner loop,
        trainer/lstm_trainer.py:256-380).  remat=True wraps the step in
        jax.checkpoint to trade recompute for activation memory (longer L
        than the reference can fit).  squeeze_preds=True drops the trailing
        1-channel dim of the stacked predictions ([L, B, H, W]) so the
        scan-stacked output is not lane-padded 128x on TPU.

        remat_chunk: checkpoint every `remat_chunk` packages instead of
        every package — the backward recompute fraction drops from 1 extra
        forward per step to 1/remat_chunk, at remat_chunk x the live
        activation memory.  Requires L % remat_chunk == 0.

        norm_stats: flat running-stats dict (layers.extract_norm_stats) to
        run training-mode BN/IN; the stats ride the scan carry so per-call
        momentum updates match torch across the window.  When given, returns
        (final_state, preds, final_stats)."""
        from .layers import NormCtx

        def one_package(carry, pkg):
            if norm_stats is not None:
                mstate, stats = carry
                ctx = NormCtx(stats)
                new_state, preds = ERGB2DepthRecurrent.forward_package(
                    params, cfg, mstate, pkg, decode_keys, norm_ctx=ctx)
                new_carry = (new_state, {**stats, **ctx.out})
            else:
                new_carry, preds = ERGB2DepthRecurrent.forward_package(
                    params, cfg, carry, pkg, decode_keys)
            if squeeze_preds:
                preds = {k: v[..., 0] for k, v in preds.items()}
            return new_carry, preds

        if remat_chunk > 1:
            def step(carry, pkgs):
                # python-unrolled inner loop over the chunk (fusion-friendly)
                outs = []
                for j in range(remat_chunk):
                    pkg_j = jax.tree_util.tree_map(lambda v: v[j], pkgs)
                    carry, preds = one_package(carry, pkg_j)
                    outs.append(preds)
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *outs)
                return carry, stacked
        else:
            step = one_package

        if remat:
            step = _checkpoint_with_policy(step, remat_policy)
        seq_t = _time_leading_seq(seq)
        if remat_chunk > 1:
            # group the time axis: [L, ...] -> [L/chunk, chunk, ...]
            def group(v):
                assert v.shape[0] % remat_chunk == 0, \
                    (v.shape, remat_chunk, "L must be divisible by remat_chunk")
                return v.reshape((v.shape[0] // remat_chunk, remat_chunk)
                                 + v.shape[1:])
            seq_t = jax.tree_util.tree_map(group, seq_t)
        carry0 = state if norm_stats is None else (state, norm_stats)
        final_carry, preds = jax.lax.scan(step, carry0, seq_t)
        if remat_chunk > 1:
            # [L/chunk, chunk, B, ...] -> [L, B, ...]
            preds = jax.tree_util.tree_map(
                lambda v: v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:]),
                preds)
        # [L, B, H, W(, 1)] per key -> keep time-leading layout for the loss
        if norm_stats is not None:
            return final_carry[0], preds, final_carry[1]
        return final_carry, preds


@MODELS.register("ERGB2Depth")
class ERGB2Depth:
    """Non-recurrent UNet baseline (model/model.py:79-111).  The datapackage
    'image' carries the fused voxel+gray input built by the asynchronous
    dataset (data_loader/dataset_asynchronous.py:246)."""

    @staticmethod
    def init_params(key, cfg: ModelConfig, dtype=jnp.float32):
        return unet.init_params(key, cfg, dtype)

    @staticmethod
    def init_state(cfg: ModelConfig, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        return ()

    @staticmethod
    def forward_package(params, cfg: ModelConfig, state, pkg,
                        decode_keys: Optional[Sequence[str]] = None,
                        norm_ctx=None, allow_fused: bool = False,
                        allow_fused_decoder: bool = False,
                        allow_composed: bool = False):
        # allow_composed accepted for engine-call compatibility; the UNet
        # decoder has no upsample-conv layers to compose
        if "image_cf" in pkg:
            img, layout = pkg["image_cf"], "NCHW"
        else:
            img, layout = pkg["image"], "NHWC"
        return state, {"image": unet.forward(params, cfg, img,
                                             norm_ctx=norm_ctx,
                                             input_layout=layout)}

    @staticmethod
    def forward_sequence(params, cfg: ModelConfig, state, seq,
                         decode_keys: Optional[Sequence[str]] = None,
                         remat: bool = False, squeeze_preds: bool = False,
                         norm_stats=None, remat_chunk: int = 1):
        # stateless: fold L into the batch for one big MXU-friendly pass
        # (remat/remat_chunk are no-ops here).
        # NOTE: under training-mode BN this folds time into the batch-stat
        # axis (one update of the running stats for the whole window) —
        # torch would update per step; for the non-recurrent baseline the
        # per-window statistics are identical in expectation.
        if "image_tcf" in seq:
            # chunked-driver packing: TIME-LEADING channel-first
            # [L, B, C, H, W] (run_chunked_streaming.load_chunk) — the
            # stateless fallback of the chunked drivers lands here
            img, layout, time_leading = seq["image_tcf"], "NCHW", True
            l, b = img.shape[0], img.shape[1]
        else:
            img, layout, time_leading = seq["image"], "NHWC", False
            b, l = img.shape[0], img.shape[1]
        flat = img.reshape((b * l,) + img.shape[2:])
        if norm_stats is not None:
            from .layers import NormCtx
            ctx = NormCtx(norm_stats)
            pred = unet.forward(params, cfg, flat, norm_ctx=ctx,
                                input_layout=layout)
            stats_out = {**norm_stats, **ctx.out}
        else:
            pred = unet.forward(params, cfg, flat, input_layout=layout)
        if time_leading:
            pred = pred.reshape((l, b) + pred.shape[1:])
            preds = {"image": pred[..., 0] if squeeze_preds else pred}
        else:
            pred = pred.reshape((b, l) + pred.shape[1:])
            if squeeze_preds:
                pred = pred[..., 0]
            preds = {"image": jnp.moveaxis(pred, 1, 0)}
        if norm_stats is not None:
            return state, preds, stats_out
        return state, preds


def get_model(arch: str):
    return MODELS.get(arch)


def summary(params, arch: str = "", log=None) -> int:
    """Trainable-parameter count + per-top-level breakdown
    (reference BaseModel.summary, base/base_model.py:24-31)."""
    import numpy as np
    total = 0
    lines = [f"Model: {arch}" if arch else "Model"]
    items = params.items() if isinstance(params, dict) else enumerate(params)
    for name, sub in items:
        n = sum(int(np.prod(np.shape(p)))
                for p in jax.tree_util.tree_leaves(sub))
        total += n
        lines.append(f"  {name}: {n:,} params")
    lines.append(f"Trainable parameters: {total:,}")
    out = "\n".join(lines)
    (log or print)(out)
    return total
