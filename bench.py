#!/usr/bin/env python
"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: end-to-end depth FPS of the full RAM-Net model (3 encoders, base
32, K=5 events + 1 frame per package) streaming at the reference's test
resolution 256x512, single stream (test.py semantics).  vs_baseline is the
ratio against the reference PyTorch model measured on this host's CPU (the
reference's GPU baseline is not measurable in this environment).

Timing methodology: this TPU is reached through a tunnel where per-dispatch
latency is ~30ms and async dispatch makes naive per-call timing meaningless.
Every benchmark therefore runs N chained iterations INSIDE one jitted
program (dynamic trip count -> one compilation) and reports
(t(N_hi) - t(N_lo)) / (N_hi - N_lo), which cancels dispatch latency,
readback and any constant overhead.

Secondary benchmarks (written to BENCH_DETAILS.json): batched multi-lane
streaming throughput (BASELINE config 5) and Pallas voxelizer Mev/s vs the
reference's np.add.at CPU voxelizer.

Execution model (round 4 — the round-3 driver run TIMED OUT at 25 min with
nothing captured): the HEADLINE program (chunked bf16 precompute, the
shipped flagship inference path) is measured FIRST and the one-line JSON is
printed + flushed IMMEDIATELY.  The detail sweep then runs inside an
explicit wall-clock budget (BENCH_BUDGET_S, default 1140 s from process
start — the driver kills at ~1500 s), writing BENCH_DETAILS.json
incrementally after every item so a kill loses nothing.  BENCH_FULL=1
ignores the budget and runs everything (use for validated full sweeps).

Round-5 budget fixes (r04: the parity guard alone consumed 921 s and every
detail item was skipped): the guard's default legs compile as ONE merged
program and it runs AFTER the voxelizer/train/phased/lane items; the
torch-CPU baseline is cached to exp/torch_baseline_cache.json between
budget-bound runs (BENCH_FULL re-measures); the persistent XLA compile
cache actually persists now (utils/platform.py), so a warmed rig cache-hits
through the entire schedule.  The headline is measured as the median of
k=3 interleaved (lo, hi) trip-count pairs with the spread recorded
(fps_pairs/fps_spread_pct in the roofline dict) — this rig shows ±6%
run-to-run variance for identical programs, so single-point A/B deltas
under ~10% are inconclusive by policy (PERF.md).
"""
import json
import os
import sys
import time

import numpy as np


def _timed_scalar(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    val = float(np.asarray(out).ravel()[0])  # forces full sync + readback
    return time.perf_counter() - t0, val


def _per_iter_seconds(run_n, args_lo, args_hi, n_lo, n_hi, repeats=3):
    _timed_scalar(run_n, *args_lo)  # warm
    lo = min(_timed_scalar(run_n, *args_lo)[0] for _ in range(repeats))
    hi = min(_timed_scalar(run_n, *args_hi)[0] for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def _per_iter_seconds_spread(run_n, args_lo, args_hi, n_lo, n_hi, pairs=3):
    """Interleaved lo/hi trip-count pairs -> per-pair per-iteration estimates.

    This rig shows ±6% run-to-run variance for the IDENTICAL program minutes
    apart (PERF.md round-4), so headline / default-flip numbers must carry a
    spread: k>=3 (lo, hi) pairs measured back-to-back in one process, each
    pair yielding its own estimate.  Returns (median_sec, [sec...])."""
    _timed_scalar(run_n, *args_lo)  # warm (compile + first dispatch)
    ests = []
    for _ in range(pairs):
        lo = _timed_scalar(run_n, *args_lo)[0]
        hi = _timed_scalar(run_n, *args_hi)[0]
        ests.append((hi - lo) / (n_hi - n_lo))
    return float(np.median(ests)), ests


def bench_jax_fps(H=256, W=512, lanes=1, n_lo=2, n_hi=12, dtype="float32",
                  with_costs=False, fast_upsample=False, decode_keys=None,
                  batched_decode=False, composed_decoder="auto"):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": dtype,
        "fast_upsample": fast_upsample, "composed_decoder": composed_decoder})
    # mirrors the inference engines: composed layers on streaming paths are
    # an EXPLICIT config opt-in (they deviate in float summation order)
    allow_comp = composed_decoder == "on"
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, lanes, H, W)
    rng = np.random.RandomState(0)
    pkg = {
        "events": jnp.asarray(rng.randn(lanes, K, H, W, 5).astype(np.float32)),
        "image": jnp.asarray(rng.rand(lanes, H, W, 1).astype(np.float32)),
    }

    @jax.jit
    def run_n(params, state, pkg, n):
        def body(i, carry):
            st, acc = carry
            # per-iteration input perturbation: prevents XLA from hoisting
            # the (state-independent) encoder convs out of the loop, which
            # would overstate streaming FPS
            eps = (i + 1).astype(jnp.float32) * 1e-9
            pkg_i = {"events": pkg["events"] + eps, "image": pkg["image"] + eps}
            if batched_decode:
                st, preds = ERGB2DepthRecurrent.forward_package_batched_decode(
                    params, mcfg, st, pkg_i, allow_fused_decoder=True,
                    allow_composed=allow_comp)
            else:
                st, preds = ERGB2DepthRecurrent.forward_package(
                    params, mcfg, st, pkg_i, decode_keys=decode_keys,
                    allow_fused_decoder=True, allow_composed=allow_comp)
            # CONSUME the predictions: the recurrent state does not depend
            # on the decoder outputs, so without this XLA dead-code
            # eliminates every decode and the "fps" measures an
            # encoders+GRU-only program (caught in round 2: image-only
            # decode ran at the same package rate as full decode)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s)) for s in jax.tree_util.tree_leaves(st))

    sec = _per_iter_seconds(run_n,
                            (params, state0, pkg, n_lo),
                            (params, state0, pkg, n_hi), n_lo, n_hi)
    depth_maps_per_package = len(decode_keys) if decode_keys else K + 1
    fps = lanes * depth_maps_per_package / sec
    if not with_costs:
        return fps

    # --- MFU / roofline accounting (analytic + XLA cost model) ------------
    from rpg_ramnet_tpu.utils import costs as C
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw, _ = C.device_peaks(kind)
    act_bytes = 2 if dtype == "bfloat16" else 4
    ana = C.package_costs(mcfg, H, W, batch=lanes, act_bytes=act_bytes)
    step_fn = jax.jit(lambda p, s, k: ERGB2DepthRecurrent.forward_package(
        p, mcfg, s, k))
    comp = C.compiled_costs(step_fn, params, state0, pkg)
    out = {
        "fps": fps,
        "sec_per_package": sec,
        "device_kind": kind,
        "compute_dtype": dtype,
        "analytic_flops_per_package": ana.flops,
        "analytic_min_bytes_per_package": ana.bytes_min,
        "xla_cost_flops_per_package": comp.get("flops"),
        "xla_cost_bytes_per_package": comp.get("bytes"),
        "achieved_tflops": ana.flops / sec / 1e12,
        "mfu_vs_bf16_peak": ana.flops / sec / peak_flops,
        "achieved_min_gbps": ana.bytes_min / sec / 1e9,
        "hbm_bw_utilization_min": ana.bytes_min / sec / peak_bw,
    }
    if comp.get("bytes"):
        out["achieved_xla_gbps"] = comp["bytes"] / sec / 1e9
        out["hbm_bw_utilization_xla"] = comp["bytes"] / sec / peak_bw
    return out


def bench_chunked_fps(H=256, W=512, lanes=1, L=16, n_lo=1, n_hi=4,
                      dtype="float32", with_costs=False, precompute=False,
                      fused_gru="auto", fused_decoder="auto",
                      composed_decoder="auto", scan_unroll=1,
                      fused_pair="auto", fused_stream="auto", spread=0):
    """Offline chunked streaming (test.py --scan_chunk semantics): scan the
    sequential encoder+GRU work over L packages, decode ALL L*(K+1)
    snapshots in ONE batch (model.forward_sequence_batched_decode; outputs
    bit-identical to per-package streaming).  This is the throughput mode
    for recorded datasets — exactly the reference test.py regime
    (test.py:207-384), where per-package latency is irrelevant.

    precompute=True additionally hoists the state-independent x-side work
    (encoders + GRU x-side gate convs) out of the scan
    (model.forward_sequence_precomputed; ~1 ulp from bit-identical)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": dtype,
        "fused_gru": fused_gru, "fused_decoder": fused_decoder,
        "composed_decoder": composed_decoder, "fused_pair": fused_pair,
        "fused_stream": fused_stream})
    K = mcfg.every_x_rgb_frame
    allow_comp = composed_decoder == "on"   # mirrors the inference engines
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, lanes, H, W)
    rng = np.random.RandomState(0)
    # channel-first time-leading inputs (an NHWC [L,B,K,H,W,5] buffer would
    # be lane-padded up to 25x in HBM — PERF.md memory rules)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, lanes, K, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, lanes, 1, H, W).astype(np.float32))}

    @jax.jit
    def run_n(params, state, seq, n):
        def body(i, carry):
            st, acc = carry
            eps = (i + 1).astype(jnp.float32) * 1e-9
            seq_i = {k: v + eps for k, v in seq.items()}
            if precompute == "package":
                # package-scoped x-side batching inside the scan (bounded
                # gx memory; the training-path variant)
                st, preds = \
                    ERGB2DepthRecurrent.forward_sequence_batched_decode(
                        params, mcfg, st, seq_i, package_precompute=True,
                        allow_composed=allow_comp)
            elif precompute:
                st, preds = ERGB2DepthRecurrent.forward_sequence_precomputed(
                    params, mcfg, st, seq_i, unroll=scan_unroll)
            else:
                # allow_fused_decoder matches the inference engines
                # (eval/inference.py): the fused Pallas decoder kernel on
                # supported shapes (cfg.fused_decoder='auto')
                st, preds = \
                    ERGB2DepthRecurrent.forward_sequence_batched_decode(
                        params, mcfg, st, seq_i, allow_fused_decoder=True,
                        allow_composed=allow_comp)
            # consume every prediction (decodes don't feed the state; see
            # the DCE note in bench_jax_fps)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                         for s in jax.tree_util.tree_leaves(st))

    pair_secs = None
    if spread:
        # headline mode: interleaved (lo, hi) pairs -> median + spread
        # (the rig's ±6% run-to-run variance must be visible in the record)
        sec_per_chunk, pair_secs = _per_iter_seconds_spread(
            run_n, (params, state0, seq, n_lo),
            (params, state0, seq, n_hi), n_lo, n_hi, pairs=spread)
    else:
        sec_per_chunk = _per_iter_seconds(run_n,
                                          (params, state0, seq, n_lo),
                                          (params, state0, seq, n_hi),
                                          n_lo, n_hi)
    fps = lanes * L * (K + 1) / sec_per_chunk
    if not with_costs:
        return fps

    from rpg_ramnet_tpu.utils import costs as C
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw, _ = C.device_peaks(kind)
    act_bytes = 2 if dtype == "bfloat16" else 4
    ana = C.package_costs(mcfg, H, W, batch=lanes, act_bytes=act_bytes)
    sec = sec_per_chunk / L  # per package
    spread_fields = {}
    if pair_secs:
        fps_all = [lanes * L * (K + 1) / s for s in pair_secs]
        spread_fields = {
            "fps_pairs": [round(f, 1) for f in fps_all],
            "fps_min": round(min(fps_all), 1),
            "fps_max": round(max(fps_all), 1),
            "fps_spread_pct": round(100 * (max(fps_all) - min(fps_all))
                                    / fps, 1),
        }
    return {
        "fps": fps,
        **spread_fields,
        "sec_per_package": sec,
        "chunk_packages": L,
        "device_kind": kind,
        "compute_dtype": dtype,
        "analytic_flops_per_package": ana.flops,
        "analytic_min_bytes_per_package": ana.bytes_min,
        "achieved_tflops": ana.flops / sec / 1e12,
        "mfu_vs_bf16_peak": ana.flops / sec / peak_flops,
        "achieved_min_gbps": ana.bytes_min / sec / 1e9,
        "hbm_bw_utilization_min": ana.bytes_min / sec / peak_bw,
    }


def bench_train_step(B=8, L=10, H=224, W=224, n_lo=1, n_hi=4,
                     dtype="float32", remat=True, remat_chunk=1,
                     deferred_decode=False, precompute_x=False,
                     remat_policy="none", phased=False, fused_gru="auto"):
    """Full TBPTT training-step throughput (the reference recipe: batch 8,
    sequence 10, 224x224 random crops, SI + multi-scale-grad loss) in
    sequences/sec.  Loop-in-jit timing like the fps bench.
    dtype='bfloat16': bf16 activations, f32 params/loss (mixed precision).
    deferred_decode: supervised decodes run ONCE outside the remat'd scan
    as one L*B*|keys| batch (identical gradients, tests/test_train.py).
    phased=True: the irregular-timestamp arch (phased conv-LSTM encoders +
    convlstm state combination, continuous times through the gates) — the
    BASELINE config-3 / MVSEC fine-tuning regime."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import optax
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.train.optim import make_optimizer

    model = {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
             "recurrent_block_type": "conv", "state_combination": "convgru",
             "num_encoders": 3, "base_num_channels": 32,
             "num_residual_blocks": 2, "use_upsample_conv": True,
             "norm": "none", "compute_dtype": dtype, "fused_gru": fused_gru}
    if phased:
        model.update({"recurrent_block_type": "convlstm",
                      "state_combination": "convlstm",
                      "use_phased_arch": True,
                      "spatial_resolution": [H, W]})
    cfg = Config.from_dict({
        "arch": "ERGB2DepthRecurrent", "use_phased_arch": phased,
        "data_loader": {"train": {"every_x_rgb_frame": 5, "baseline": False,
                                  "clip_distance": 80.0, "reg_factor": 3.70378},
                        "batch_size": B},
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "trainer": {"epochs": 1, "sequence_length": L,
                    "loss_composition": ["image", "events4"],
                    "loss_weights": [1, 1], "remat_chunk": remat_chunk,
                    "deferred_decode": deferred_decode,
                    "precompute_x": precompute_x,
                    "remat_policy": remat_policy},
        "model": model,
    })
    mcfg = cfg.model
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    loss_fn = make_sequence_loss(cfg, remat=remat)
    rng = np.random.RandomState(0)
    # TPU training layout: channel-first inputs + squeezed depth targets
    # (see train/sequence_loss.pack_train_batch and PERF.md)
    batch = {
        "events_tcf": jnp.asarray(rng.randn(L, B, K, 5, H, W).astype(np.float32)),
        "image_tcf": jnp.asarray(rng.rand(L, B, 1, H, W).astype(np.float32)),
        "depth_events_t": jnp.asarray(rng.rand(L, B, K, H, W).astype(np.float32)),
        "depth_image_t": jnp.asarray(rng.rand(L, B, H, W).astype(np.float32)),
    }
    if phased:
        # monotone irregular times over the whole window ([L, B, K] / [L, B])
        t_all = np.cumsum(rng.uniform(0.001, 0.01, (L, B, K + 1)),
                          axis=0).astype(np.float32)
        batch["times_events_t"] = jnp.asarray(t_all[:, :, :K])
        batch["times_image_t"] = jnp.asarray(t_all[:, :, K])

    @jax.jit
    def run_n(params, opt_state, batch, n):
        # no input perturbation needed: params update every iteration, so
        # the whole loop body is already loop-variant (and a full-sequence
        # add would itself materialize a lane-padded copy — see PERF.md)
        def body(i, carry):
            p, s = carry
            state0 = ERGB2DepthRecurrent.init_state(mcfg, B, H, W)
            grads = jax.grad(lambda pp: loss_fn(pp, state0, batch)[0])(p)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s)
        p, s = lax.fori_loop(0, n, body, (params, opt_state))
        return sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(p))

    sec = _per_iter_seconds(run_n, (params, opt_state, batch, n_lo),
                            (params, opt_state, batch, n_hi), n_lo, n_hi,
                            repeats=2)

    # measured peak HBM of the full training program (resolves any doubt
    # about whether the reference recipe fits one chip) + train-side MFU
    out = {"seq_per_sec": B / sec, "sec_per_window": sec / B}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in ms:
            out["peak_hbm_gib"] = ms["peak_bytes_in_use"] / 2 ** 30
            out["hbm_limit_gib"] = ms.get("bytes_limit", 0) / 2 ** 30
    except Exception:
        pass
    from rpg_ramnet_tpu.utils import costs as C
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw, _ = C.device_peaks(kind)
    ana = C.train_window_costs(mcfg, H, W, batch=B, L=L,
                               supervised_decodes=2, remat=remat)
    out.update({
        "analytic_flops_per_step": ana.flops,
        "achieved_tflops": ana.flops * (B / sec) / B / 1e12,
        "mfu_vs_bf16_peak": ana.flops / sec / peak_flops,
        "achieved_min_gbps": ana.bytes_min / sec / 1e9,
        "hbm_bw_utilization_min": ana.bytes_min / sec / peak_bw,
    })
    return out


def check_fused_parity(H=256, W=512, L=2, tol=0.05, include_optin=True,
                       optin_errors=None):
    """HARDWARE guard for the non-default numerics (run every bench): the
    shipped bf16 flagship path (fused GRU cells + fused decoder + composed
    transposed-conv upsample layers, all forced on) must agree with the
    all-XLA two-stage path on the same inputs.  A Mosaic/layout regression
    fails the bench loudly instead of shipping wrong numbers.
    L=2 keeps the decode batch at 12 <= the fused decoder's latency-mode
    gate (statenet._use_fused_decoder) so BOTH Pallas kernel families run;
    composed_decoder='on' overrides its >=24-batch auto gate so the
    composed formulation is covered too.
    Tolerance: the fused cells accumulate gates in f32 vs bf16-native XLA
    (~1.5e-4/cell measured round 2); over L*(K+1) gated steps 0.05 bounds
    the drift on [0,1] sigmoid outputs."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent as M

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16",
        # decoder kernel is opt-in-only in production (measured in-context
        # loss) but the guard runs it deliberately for parity coverage;
        # composed is default-on at large decode batches in production
        "fused_decoder": "on", "composed_decoder": "on"})
    off = dataclasses.replace(mcfg, fused_gru="off", fused_decoder="off",
                              composed_decoder="off")
    params = M.init_params(jax.random.PRNGKey(0), mcfg)
    st0 = M.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, 5, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32))}
    # the fused Pallas decoder takes per-layer precedence over the composed
    # formulation, so the composed layers need their own Pallas-free config
    comp = dataclasses.replace(mcfg, fused_gru="off", fused_decoder="off")

    # ONE compiled program covers the plain + both default-on kernel paths
    # (round 5: the r04 driver run spent 921 s compiling these as three
    # separate remote programs, blowing the whole detail budget; one merged
    # program is one remote compile and the persistent cache keys it once)
    @jax.jit
    def run_default_legs():
        _, pp = M.forward_sequence_precomputed(params, off, st0, seq)
        _, pf = M.forward_sequence_precomputed(params, mcfg, st0, seq)
        _, pc = M.forward_sequence_precomputed(params, comp, st0, seq)
        return pp, pf, pc

    p_plain, p_fused, p_comp = run_default_legs()
    # (name, is_optin, result-or-thunk); is_optin is an explicit flag — a
    # leg RENAME must not silently change whether its failure is fatal
    legs = [("fused GRU cells + fused decoder", False, lambda: p_fused),
            ("composed decoder layers", False, lambda: p_comp)]
    if include_optin:
        # opt-in kernels (each a separate remote compile — covered on
        # BENCH_FULL sweeps; the budget-bound driver path guards only the
        # default-on kernels): whole-chunk resident-state scratch
        # persistence, the cross-scale pair launch, and the
        # gx-streaming cells — all Mosaic behaviors
        # interpret-mode CI cannot validate
        pair = dataclasses.replace(mcfg, fused_decoder="off",
                                   composed_decoder="off", fused_pair="on")
        legs += [
            ("whole-chunk resident-state kernel", True, lambda: jax.jit(
                 lambda: M.forward_sequence_precomputed(
                     params, comp, st0, seq, chunk_cells=True))()[1]),
            ("cross-scale merged pair launch", True, lambda: jax.jit(
                 lambda: M.forward_sequence_precomputed(
                     params, pair, st0, seq))()[1]),
            ("gx-streaming cells", True, lambda: jax.jit(
                 lambda: M.forward_sequence_precomputed(
                     params, comp, st0, seq, stream_cells=True))()[1]),
        ]
    worst = 0.0
    for name, is_optin, run_leg in legs:
        try:
            p_alt = run_leg()
        except Exception as e:
            # an opt-in kernel failing to COMPILE/RUN is a rig/Mosaic
            # availability problem, not a numerics failure of the shipped
            # path (observed 2026-08-18: the tunnel's chipless AOT helper
            # dies on the scalar-prefetched pair/stream programs, PERF.md)
            # — record it LOUDLY and keep guarding; never trigger the
            # corrected-headline path for it.  Default-on legs still raise.
            if is_optin:
                print(f"WARNING: opt-in parity leg '{name}' failed to "
                      f"compile/run: {str(e)[:300]}", file=sys.stderr)
                if optin_errors is not None:
                    optin_errors[name] = str(e)[:300]
                continue
            raise
        for k in p_plain:
            d = float(jnp.max(jnp.abs(p_alt[k].astype(jnp.float32)
                                      - p_plain[k].astype(jnp.float32))))
            worst = max(worst, d)
            if d > tol:
                raise AssertionError(
                    f"kernel parity FAILED on hardware: max diff {d} > "
                    f"{tol} ({name} vs XLA)")
    return worst


def check_phased_fused_parity(H=256, W=352, tol=0.05):
    """HARDWARE guard for the phased (irregular-timestamp) fused path: one
    package through fused_gru='on' bf16 (single-launch phased cells in the
    encoders, ops/phased_cell.py + the fused LSTM h-side in the convlstm
    state combination) vs the all-XLA bf16 forward on the same
    params/inputs.  Run by the _phased_fused detail item before timing —
    the kernels are opt-in, so interpret-mode CI is their only other
    guard.  Tolerance as check_fused_parity (f32 gate accumulation vs
    bf16-native XLA over K+1 gated steps)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent as M

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16", "fused_gru": "on",
        "use_phased_arch": True, "spatial_resolution": [H, W]})
    off = dataclasses.replace(mcfg, fused_gru="off")
    params = M.init_params(jax.random.PRNGKey(0), mcfg)
    st0 = M.init_state(mcfg, 1, H, W)
    K = mcfg.every_x_rgb_frame
    rng = np.random.RandomState(0)
    pkg = {"events": jnp.asarray(
               rng.randn(1, K, H, W, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32)),
           "times_events": jnp.asarray(np.cumsum(
               rng.uniform(0.01, 0.1, (1, K)), 1).astype(np.float32)),
           "times_image": jnp.asarray(np.float32([0.5]))}
    _, p_on = jax.jit(lambda: M.forward_package(
        params, mcfg, st0, pkg, allow_fused=True))()
    _, p_off = jax.jit(lambda: M.forward_package(
        params, off, st0, pkg, allow_fused=True))()
    worst = 0.0
    for k in p_off:
        d = float(jnp.max(jnp.abs(p_on[k].astype(jnp.float32)
                                  - p_off[k].astype(jnp.float32))))
        worst = max(worst, d)
        if d > tol:
            raise AssertionError(
                f"phased fused parity FAILED on hardware: max diff {d} > "
                f"{tol} ({k})")
    return worst


def bench_torch_reference_fps(H=256, W=512, iters=3):
    """Reference PyTorch model on this host's CPU, same shapes/semantics."""
    import torch
    sys.path.insert(0, "/root/repo/tests")
    from reference_loader import make_reference_model
    cfg = dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
               state_combination="convgru", num_encoders=3, base_num_channels=32,
               num_residual_blocks=2, recurrent_block_type="conv", norm="none",
               use_upsample_conv=True, every_x_rgb_frame=5, baseline=False,
               loss_composition=["image", "events4"], gpu=0,
               spatial_resolution=[H, W], use_phased_arch=False)
    tm = make_reference_model("ERGB2DepthRecurrent", cfg)
    rng = np.random.RandomState(0)
    item = {f"events{k}": torch.from_numpy(rng.randn(1, 5, H, W).astype(np.float32))
            for k in range(5)}
    item["image"] = torch.from_numpy(rng.rand(1, 1, H, W).astype(np.float32))
    prev_lstm = {f"events{k}": None for k in range(5)}
    prev_lstm["image"] = None

    with torch.no_grad():
        preds, supers, lstm = tm(item, None, prev_lstm)  # warmup + init
        t0 = time.perf_counter()
        for _ in range(iters):
            tm(item, supers["image"], lstm)
        sec = (time.perf_counter() - t0) / iters
    return 6 / sec


def bench_phased_fps(H=256, W=352, n_lo=2, n_hi=10, dtype="float32",
                     fused_gru="off"):
    """Irregular-timestamp (MVSEC/BASELINE config 3) regime: the phased
    architecture (PhasedConvLSTM state combination; continuous `times`
    modulate the recurrent time gates — reference submodules.py:218-411,
    dormant on the vendored branch) streaming one package per step at the
    MVSEC-like resolution.  Reported so the second BASELINE regime has a
    measured speed, not just parity tests.

    fused_gru='on': the round-4 phased fused path — x/h-split Pallas LSTM
    h-side cells in the phased encoders + the convlstm state combination
    (bf16 only; statenet._use_fused_cell gates per scale)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": dtype, "fused_gru": fused_gru,
        "use_phased_arch": True, "spatial_resolution": [H, W]})
    allow_fused = fused_gru == "on"
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    pkg = {
        "events": jnp.asarray(rng.randn(1, K, H, W, 5).astype(np.float32)),
        "image": jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32)),
        "times_events": jnp.asarray(
            np.cumsum(rng.uniform(0.001, 0.01, (1, K)), axis=1)
            .astype(np.float32)),
        "times_image": jnp.asarray(rng.rand(1).astype(np.float32) + 0.06),
    }

    @jax.jit
    def run_n(params, state, pkg, n):
        def body(i, carry):
            st, acc = carry
            # irregular per-iteration times: the MVSEC regime's defining
            # property (also keeps the loop body loop-variant)
            dt = (i + 1).astype(jnp.float32) * 1e-4
            pkg_i = dict(pkg)
            pkg_i["times_events"] = pkg["times_events"] + dt
            pkg_i["times_image"] = pkg["times_image"] + dt
            st, preds = ERGB2DepthRecurrent.forward_package(
                params, mcfg, st, pkg_i, allow_fused=allow_fused)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                         for s in jax.tree_util.tree_leaves(st))

    sec = _per_iter_seconds(run_n, (params, state0, pkg, n_lo),
                            (params, state0, pkg, n_hi), n_lo, n_hi)
    return (K + 1) / sec


def bench_phased_chunked_fps(H=256, W=352, L=8, n_lo=1, n_hi=3,
                             dtype="float32", fused_gru="off", lanes=1,
                             composed_decoder="auto"):
    """Offline chunked throughput for the irregular-timestamp regime
    (BASELINE config 3 / MVSEC recorded data): scan encoders + phased
    cells over L packages, decode all L*(K+1) snapshots in ONE batch
    (model.forward_sequence_batched_decode — times feed only the
    PhasedLSTM gates inside the scan, so deferring decodes is exact; the
    x-side can NOT be hoisted like the EventScape flagship because the
    phased encoder chain is state-dependent, scale i+1 consumes scale i's
    LSTM output).  The phased analog of the headline's chunked mode —
    recorded MVSEC evaluation is offline, so throughput is the number that
    matters for BASELINE config 3."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": dtype, "fused_gru": fused_gru,
        "use_phased_arch": True, "spatial_resolution": [H, W],
        "composed_decoder": composed_decoder})
    allow_fused = fused_gru == "on"
    # batched_decode is a bit-identical-contract engine, so the composed
    # decoder (float-summation-order deviation) is an EXPLICIT opt-in here,
    # like the lane engines.  Round-5 phased trace: the 48-deep decode
    # batch is exactly the composed win region, and data formatting is 26%
    # of this program vs the flagship's 10.5% (exp/trace_phased_chunked.py).
    allow_comp = composed_decoder == "on"
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, lanes, H, W)
    rng = np.random.RandomState(0)
    # monotone irregular times across the whole chunk ([L, B, K] / [L, B];
    # every lane shares the schedule — lane-batched MVSEC eval streams
    # different sequences at the same package cadence)
    t_all = np.cumsum(rng.uniform(0.001, 0.01, (L, 1, K + 1)),
                      axis=None).reshape(L, 1, K + 1).astype(np.float32)
    t_all = np.repeat(t_all, lanes, axis=1)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, lanes, K, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, lanes, 1, H, W).astype(np.float32)),
           "times_events_t": jnp.asarray(t_all[:, :, :K]),
           "times_image_t": jnp.asarray(t_all[:, :, K])}
    t_span = float(t_all[-1, 0, K]) + 0.01

    @jax.jit
    def run_n(params, state, seq, n):
        def body(i, carry):
            st, acc = carry
            # keep times monotone across chunk repetitions (MVSEC regime)
            dt = (i + 1).astype(jnp.float32) * t_span
            seq_i = dict(seq)
            seq_i["times_events_t"] = seq["times_events_t"] + dt
            seq_i["times_image_t"] = seq["times_image_t"] + dt
            st, preds = ERGB2DepthRecurrent.forward_sequence_batched_decode(
                params, mcfg, st, seq_i, allow_fused=allow_fused,
                allow_fused_decoder=True, allow_composed=allow_comp)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                         for s in jax.tree_util.tree_leaves(st))

    sec = _per_iter_seconds(run_n, (params, state0, seq, n_lo),
                            (params, state0, seq, n_hi), n_lo, n_hi)
    return lanes * L * (K + 1) / sec


def bench_voxelizer(n_events=1_000_000, num_bins=5, H=260, W=346,
                    n_lo=1, n_hi=6):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu import ops
    from rpg_ramnet_tpu.ops import voxel as V

    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0, 0.05, n_events))
    ev = np.stack([t, rng.randint(0, W, n_events).astype(np.float64),
                   rng.randint(0, H, n_events).astype(np.float64),
                   rng.randint(0, 2, n_events).astype(np.float64)], axis=1)
    ev32 = jnp.asarray(ev.astype(np.float32))
    nv = jnp.int32(n_events)

    # reference CPU path (np.add.at)
    t0 = time.perf_counter()
    ops.events_to_voxel_grid_np(ev.copy(), num_bins, H, W)
    cpu_sec = time.perf_counter() - t0
    cpu_mevs = n_events / cpu_sec / 1e6

    out = {"cpu_np_add_at_mevs": cpu_mevs}
    try:  # native C++ host kernel (serial + all-cores threaded)
        from rpg_ramnet_tpu.native import voxelize_native
        ev32_np = np.ascontiguousarray(ev.astype(np.float32))
        if voxelize_native(ev32_np, num_bins, H, W) is not None:
            t0 = time.perf_counter()
            voxelize_native(ev32_np, num_bins, H, W)
            out["cpu_native_mevs"] = n_events / (time.perf_counter() - t0) / 1e6
            out["cpu_native_vs_np"] = out["cpu_native_mevs"] / cpu_mevs
            voxelize_native(ev32_np, num_bins, H, W, threads=0)  # warm
            t0 = time.perf_counter()
            voxelize_native(ev32_np, num_bins, H, W, threads=0)
            out["cpu_native_mt_mevs"] = \
                n_events / (time.perf_counter() - t0) / 1e6
            out["cpu_native_mt_threads"] = os.cpu_count()
    except Exception:
        pass
    backend = jax.default_backend()
    import functools
    pallas_bf16 = functools.partial(V.events_to_voxel_grid_pallas,
                                    factor_dtype=jnp.bfloat16)
    kernels = {"pallas": V.events_to_voxel_grid_pallas,
               "pallas_bf16": pallas_bf16,
               "sortseg": V.events_to_voxel_grid_sortseg,
               "scatter": V.events_to_voxel_grid_scatter} if backend != "cpu" \
        else {"scatter": V.events_to_voxel_grid_scatter}

    for name, kern in kernels.items():
        try:
            @jax.jit
            def run_n(events, n_valid, n, _kern=kern):
                def body(i, carry):
                    # carry-dependent perturbation defeats loop-invariant hoisting
                    e = events.at[0, 0].add(carry * 1e-20)
                    g = _kern(e, n_valid, num_bins=num_bins, height=H, width=W)
                    return jnp.sum(jnp.abs(g))
                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            sec = _per_iter_seconds(run_n, (ev32, nv, n_lo), (ev32, nv, n_hi),
                                    n_lo, n_hi, repeats=2)
            out[f"{backend}_{name}_mevs"] = n_events / sec / 1e6
            out[f"{backend}_{name}_vs_cpu"] = out[f"{backend}_{name}_mevs"] / cpu_mevs
        except Exception as e:  # one variant must not lose the others
            out[f"{backend}_{name}_error"] = str(e)[:300]

    if backend != "cpu" and f"{backend}_sortseg_mevs" in out:
        # sort/prep vs Pallas-sweep split of the shipped sortseg path: the
        # prep program is everything BEFORE the kernel (bilinear split + ONE
        # global lax.sort + chunk padding; ops/voxel.sortseg_prep) measured
        # under the same loop-in-jit discipline; sweep = total - prep
        try:
            @jax.jit
            def prep_n(events, n_valid, n):
                def body(i, carry):
                    e = events.at[0, 0].add(carry * 1e-20)
                    idx_s, vl_s, vr_s = V.sortseg_prep(
                        e, n_valid, num_bins=num_bins, height=H, width=W)
                    return (jnp.sum(vl_s) + jnp.sum(vr_s)
                            + jnp.sum(idx_s).astype(jnp.float32) * 1e-20)
                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            prep_sec = _per_iter_seconds(prep_n, (ev32, nv, n_lo),
                                         (ev32, nv, n_hi), n_lo, n_hi,
                                         repeats=2)
            total_sec = n_events / out[f"{backend}_sortseg_mevs"] / 1e6
            out["sortseg_prep_sort_ms"] = prep_sec * 1e3
            out["sortseg_sweep_ms"] = max(total_sec - prep_sec, 0.0) * 1e3
        except Exception as e:
            out["sortseg_split_error"] = str(e)[:300]
    return out


def main():
    t_start = time.time()
    full = os.environ.get("BENCH_FULL") == "1"
    budget = float(os.environ.get("BENCH_BUDGET_S", "1140"))
    deadline = t_start + budget

    # keep stdout clean for the single JSON result line — all sub-benchmarks
    # (incl. the chatty reference torch model constructor) log to stderr
    real_stdout = sys.stdout
    sys.stdout = sys.stderr

    # device init can HANG outright when the TPU tunnel is down (observed
    # round 4: jax backend init sleeps forever after the axon banner).
    # Run it on a daemon thread and leave an auditable BENCH_DETAILS marker
    # if it exceeds BENCH_INIT_TIMEOUT_S, then KEEP waiting — if the tunnel
    # recovers inside the driver's budget the real run still happens.
    import threading
    init_result = {}

    def _init():
        from rpg_ramnet_tpu.utils import ensure_platform
        init_result["backend"] = ensure_platform()

    th = threading.Thread(target=_init, daemon=True)
    th.start()
    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "480"))
    th.join(init_timeout)
    if "backend" not in init_result:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump({"device_init_timeout_s": init_timeout,
                       "error": "jax backend init did not complete — the "
                                "TPU tunnel is likely down; still waiting"},
                      f, indent=2)
        print(f"bench: device init exceeded {init_timeout}s "
              "(TPU tunnel down?); waiting...", file=sys.stderr)
        th.join()  # wait for recovery or the driver's kill

    backend = init_result["backend"]
    details = {"backend": backend,
               "budget_s": None if full else budget,
               "timings_s": {}}

    def save():
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)

    # ---- stage 1: HEADLINE first, JSON out immediately --------------------
    # (round-3 driver run: rc=124 after 25 min, nothing captured — the old
    # main printed the line only after ~15 remote-compiled programs)
    # The torch-CPU reference is a fixed quantity of this host (the upstream
    # model under torch.no_grad on the same shapes) — measuring it costs
    # ~120 s of the driver budget every run for a number that cannot change.
    # Budget-bound runs reuse the last measured value from
    # exp/torch_baseline_cache.json; BENCH_FULL re-measures and refreshes it.
    torch_cache = os.environ.get(
        "BENCH_TORCH_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp", "torch_baseline_cache.json"))
    torch_fps = None
    if not full and os.path.exists(torch_cache):
        try:
            with open(torch_cache) as f:
                torch_fps = json.load(f)["torch_cpu_reference_fps"]
            details["torch_cpu_reference_fps"] = torch_fps
            details["torch_cpu_reference_source"] = "cached:" + torch_cache
        except Exception:
            torch_fps = None
    if torch_fps is None:
        try:
            t0 = time.time()
            torch_fps = bench_torch_reference_fps()
            details["torch_cpu_reference_fps"] = torch_fps
            details["torch_cpu_reference_source"] = "measured"
            details["timings_s"]["torch_reference"] = round(time.time() - t0, 1)
            with open(torch_cache, "w") as f:
                json.dump({"torch_cpu_reference_fps": torch_fps,
                           "measured_unix": time.time()}, f)
        except Exception as e:
            torch_fps = None
            details["torch_cpu_reference_fps_error"] = str(e)[:300]
    save()

    # best-default-on single-stream configuration first (the shipped bf16
    # flagship path: test.py --scan_chunk + precompute + fused/composed
    # kernels), with all-XLA fallbacks if a Pallas/Mosaic regression breaks it
    fps_headline = None
    for name, roofline_key, fn in (
            ("jax_fps_single_stream_chunked_bf16_precompute",
             "chunked_bf16_precompute_roofline",
             lambda: bench_chunked_fps(lanes=1, L=16, dtype="bfloat16",
                                       precompute=True, with_costs=True,
                                       spread=3)),
            ("jax_fps_single_stream_chunked_bf16", None,
             lambda: bench_chunked_fps(lanes=1, L=16, dtype="bfloat16")),
            ("jax_fps_single_stream", "single_stream_roofline",
             lambda: bench_jax_fps(lanes=1, n_hi=42, with_costs=True,
                                   batched_decode=True)),
    ):
        try:
            t0 = time.time()
            r = fn()
            fps = r["fps"] if isinstance(r, dict) else r
            details[name] = fps
            if roofline_key and isinstance(r, dict):
                details[roofline_key] = r
            details["timings_s"][name] = round(time.time() - t0, 1)
            fps_headline = fps
            details["headline_source"] = name
            break
        except Exception as e:
            details[name + "_error"] = str(e)[:300]
        finally:
            save()

    vs = (round(fps_headline / torch_fps, 3)
          if fps_headline and torch_fps else None)   # null, not NaN:
    # json.dumps would emit bare NaN (invalid strict JSON) and could break
    # the driver's parser
    print(json.dumps({"metric": "e2e_depth_fps_256x512",
                      "value": round(fps_headline, 3) if fps_headline
                      else None,
                      "unit": "depth_maps/s",
                      "vs_baseline": vs}),
          file=real_stdout)
    real_stdout.flush()
    if fps_headline is None:
        save()
        return

    # ---- stage 2: detail sweep, budget-gated, incrementally persisted -----
    def run_detail(key, fn, est_s):
        if not full and time.time() + est_s > deadline:
            details.setdefault("skipped_for_budget", []).append(key)
            save()
            return
        t0 = time.time()
        try:
            fn()
        except Exception as e:
            details[key + "_error"] = str(e)[:300]
        details["timings_s"][key] = round(time.time() - t0, 1)
        save()

    def _parity():
        # hardware parity guard: fused Pallas kernels (cells, decoder,
        # whole-chunk, pair) vs XLA must agree every bench run — a Mosaic
        # regression fails loudly here instead of shipping wrong numbers.
        # The headline printed BEFORE this guard (driver-capture first);
        # if the guard fails AND the headline used the fused path, measure
        # the all-XLA configuration and print a corrected line — the wrong-
        # numerics number must not stand as the record.
        try:
            # budget-bound driver runs guard the default-on kernels only
            # (2 compiles); BENCH_FULL sweeps cover the opt-in kernels too.
            # Opt-in legs that fail to compile (rig AOT-helper limitation,
            # PERF.md round-4) are recorded, not fatal.
            optin_errors = {}
            details["fused_parity_max_diff"] = check_fused_parity(
                include_optin=full, optin_errors=optin_errors)
            if optin_errors:
                details["fused_parity_optin_leg_errors"] = optin_errors
        except Exception:
            details["fused_parity_FAILED"] = True
            save()
            if details.get("headline_source") == \
                    "jax_fps_single_stream_chunked_bf16_precompute":
                corrected = bench_chunked_fps(
                    lanes=1, L=16, dtype="bfloat16", precompute=True,
                    fused_gru="off", fused_decoder="off",
                    composed_decoder="off")
                details["jax_fps_corrected_all_xla"] = corrected
                vs2 = (round(corrected / torch_fps, 3) if torch_fps
                       else None)
                print(json.dumps({"metric": "e2e_depth_fps_256x512",
                                  "value": round(corrected, 3),
                                  "unit": "depth_maps/s",
                                  "vs_baseline": vs2}), file=real_stdout)
                real_stdout.flush()
            raise

    def _vox():
        details["voxelizer"] = bench_voxelizer()

    def _train_flagship():
        # flagship TPU recipe (configs/..._tpu_bf16.json): bf16 + B=16 +
        # deferred decode
        tfl = bench_train_step(B=16, dtype="bfloat16", deferred_decode=True)
        details["train_bf16_deferred_seq_per_sec_B16_L10_224"] = \
            tfl["seq_per_sec"]
        details["train_bf16_deferred_B16_roofline"] = tfl

    def _chunked_f32():
        # reference-semantics f32 chunked mode (test.py --scan_chunk 16):
        # outputs bit-identical to per-package streaming
        chunked = bench_chunked_fps(lanes=1, L=16, with_costs=True)
        details["jax_fps_single_stream_chunked"] = chunked["fps"]
        details["single_stream_chunked_roofline"] = chunked

    def _latency():
        # per-package latency mode (no chunking), f32 reference semantics
        single = bench_jax_fps(lanes=1, n_hi=42, with_costs=True,
                               batched_decode=True)
        details["jax_fps_single_stream"] = single["fps"]
        details["single_stream_roofline"] = single

    def _phased():
        # the irregular-timestamp (MVSEC) regime — BASELINE config 3
        details["jax_fps_phased_single_stream_256x352"] = bench_phased_fps()

    def _phased_fused():
        # round-4 phased fused path: bf16 + the single-launch phased cell
        # (4-gate h-side + time-gate blend in VMEM, ops/phased_cell.py) in
        # the phased encoders + the x/h-split LSTM h-side cell in the
        # convlstm state combination; A/B against the plain bf16 point.
        # Parity first: the phased kernel is opt-in so interpret-mode CI is
        # its only other guard — validate the Mosaic build on hardware
        # before timing it.
        details["phased_fused_parity_maxdiff"] = check_phased_fused_parity()
        details["jax_fps_phased_single_stream_256x352_bf16"] = \
            bench_phased_fps(dtype="bfloat16")
        details["jax_fps_phased_single_stream_256x352_bf16_fused"] = \
            bench_phased_fps(dtype="bfloat16", fused_gru="on")

    def _phased_chunked():
        # offline chunked throughput (deferred batched decode) for the
        # irregular-timestamp regime — the recorded-MVSEC evaluation mode.
        # The composed-decoder opt-in leg is the round-5 measured best
        # (552.5 -> 609.8, +10.4% — exp/phased_composed_bench.json: the
        # 48-deep decode batch is the composed win region); A/B the fused
        # phased cells on top of the plain point.
        details["jax_fps_phased_chunked_256x352_bf16"] = \
            bench_phased_chunked_fps(dtype="bfloat16")
        details["jax_fps_phased_chunked_256x352_bf16_composed"] = \
            bench_phased_chunked_fps(dtype="bfloat16",
                                     composed_decoder="on")
        # lane-batched aggregate throughput (test.py --lanes 2): the
        # round-5 measured best for offline multi-sequence MVSEC eval
        # (611.8 -> 712.9, +16.5% — exp/phased_lanes_bench.json; lanes=4
        # at L=4 is 696.6, so 2 lanes is the knee on 16 GiB HBM).
        details["jax_fps_phased_chunked_256x352_bf16_composed_l2"] = \
            bench_phased_chunked_fps(dtype="bfloat16", lanes=2,
                                     composed_decoder="on")
        details["jax_fps_phased_chunked_256x352_bf16_fused"] = \
            bench_phased_chunked_fps(dtype="bfloat16", fused_gru="on")

    def _train_phased():
        # BASELINE config-3 training (the reference fine-tunes on MVSEC):
        # phased arch TBPTT at the flagship recipe shapes
        tp = bench_train_step(dtype="bfloat16", deferred_decode=True,
                              phased=True)
        details["train_phased_bf16_deferred_seq_per_sec_B8_L10_224"] = \
            tp["seq_per_sec"]
        details["train_phased_bf16_deferred_roofline"] = tp

    def _lane64():
        # lane-batched record config (round 3): composed decoder unlocks
        # 64 lanes on this rig; explicit opt-in (float summation order)
        details["jax_fps_64lane_bf16_composed_throughput"] = bench_jax_fps(
            lanes=64, n_hi=4, dtype="bfloat16", batched_decode=True,
            composed_decoder="on")

    def _train_f32():
        train = bench_train_step()
        details["train_seq_per_sec_B8_L10_224"] = train["seq_per_sec"]
        details["train_roofline"] = train

    def _train_bf16():
        train_bf16 = bench_train_step(dtype="bfloat16")
        details["train_bf16_seq_per_sec_B8_L10_224"] = \
            train_bf16["seq_per_sec"]
        details["train_bf16_roofline"] = train_bf16

    def _train_deferred():
        td = bench_train_step(deferred_decode=True)
        details["train_deferred_seq_per_sec_B8_L10_224"] = td["seq_per_sec"]
        details["train_deferred_roofline"] = td

    def _chunked_bf16():
        details["jax_fps_single_stream_chunked_bf16"] = bench_chunked_fps(
            lanes=1, L=16, dtype="bfloat16")

    def _lane8():
        details["jax_fps_8lane_throughput"] = bench_jax_fps(
            lanes=8, n_hi=8, batched_decode=True)

    def _lane8_bf16():
        lanes_bf16 = bench_jax_fps(lanes=8, n_hi=8, dtype="bfloat16",
                                   with_costs=True, batched_decode=True)
        details["jax_fps_8lane_bf16_throughput"] = lanes_bf16["fps"]
        details["lane8_bf16_roofline"] = lanes_bf16

    def _lane32():
        l32 = bench_jax_fps(lanes=32, n_hi=4, dtype="bfloat16",
                            with_costs=True, batched_decode=True)
        details["jax_fps_32lane_bf16_throughput"] = l32["fps"]
        details["lane32_bf16_roofline"] = l32

    def _single_bf16():
        details["jax_fps_single_stream_bf16"] = bench_jax_fps(
            lanes=1, dtype="bfloat16")

    def _trace():
        # one profiler trace artifact of the streaming forward (PERF.md's
        # bandwidth-bound claims are verifiable from it)
        import jax
        import jax.numpy as jnp
        from rpg_ramnet_tpu.core.config import ModelConfig
        from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
        mcfg = ModelConfig.from_dict({
            "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
            "recurrent_block_type": "conv", "state_combination": "convgru",
            "num_encoders": 3, "base_num_channels": 32,
            "num_residual_blocks": 2, "use_upsample_conv": True,
            "norm": "none", "every_x_rgb_frame": 5, "baseline": False})
        params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
        st = ERGB2DepthRecurrent.init_state(mcfg, 1, 256, 512)
        rng2 = np.random.RandomState(0)
        pkg = {"events": jnp.asarray(
                   rng2.randn(1, 5, 256, 512, 5).astype("float32")),
               "image": jnp.asarray(
                   rng2.rand(1, 256, 512, 1).astype("float32"))}
        step = jax.jit(lambda p, s, k: ERGB2DepthRecurrent.forward_package(
            p, mcfg, s, k))
        st2, _ = step(params, st, pkg)  # compile outside the trace
        with jax.profiler.trace("./profile_trace"):
            for _ in range(3):
                st2, preds = step(params, st2, pkg)
            jax.block_until_ready(preds)
        details["profile_trace"] = "./profile_trace"

    # value-ordered (round 5 — r04 learned the parity guard's remote
    # compiles can eat the whole budget: 921 s vs its 300 s estimate, every
    # detail item skipped).  The guard now (a) compiles its default legs as
    # ONE merged program, (b) runs AFTER the four most valuable detail
    # items, so a cold-cache run still lands voxelizer/train/phased/lane
    # numbers.  Estimates are ~1.3x the WARM-cache actuals of the round-5
    # full sweep (BENCH_DETAILS timings_s): the persistent compile cache
    # (fixed round 5 — it had never written a single entry) makes every
    # driver run on this rig warm, and cold-cache estimates gated off
    # phased_chunked — the item carrying the config-3 records — at its
    # projected 600 s.  A genuinely cold run can overshoot an estimate;
    # run_detail never kills a started item, the headline is already
    # printed, and details save incrementally, so overshoot degrades to
    # exactly the skip behavior the estimates exist to schedule.
    schedule = [
        ("voxelizer_bench", _vox, 100),
        ("train_flagship", _train_flagship, 300),
        ("phased_chunked", _phased_chunked, 250),
        ("lane64_composed", _lane64, 140),
        ("fused_parity", _parity, 180),
        ("chunked_f32", _chunked_f32, 110),
        ("latency_mode", _latency, 90),
        ("phased_fps", _phased, 60),
        ("phased_fps_bf16_fused", _phased_fused, 520),
        ("phased_train", _train_phased, 220),
        ("train_f32", _train_f32, 260),
        ("train_bf16", _train_bf16, 190),
        ("train_deferred", _train_deferred, 110),
        ("chunked_bf16_plain", _chunked_bf16, 50),
        ("lane8", _lane8, 40),
        ("lane8_bf16", _lane8_bf16, 90),
        ("lane32", _lane32, 210),
        ("single_bf16", _single_bf16, 40),
        ("profile_trace_capture", _trace, 40),
    ]
    for key, fn, est in schedule:
        run_detail(key, fn, est)
    details["total_wall_s"] = round(time.time() - t_start, 1)
    save()


if __name__ == "__main__":
    main()
