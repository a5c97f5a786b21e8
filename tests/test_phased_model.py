"""Phased (irregular-timestamp) StateNet integration tests — the MVSEC
regime of BASELINE config 3.  The vendored reference branch keeps the phased
machinery dormant (use_phased_arch false in all shipped configs; the
activating branch is not vendored), so these are behavioral tests of our
integration: continuous `times` inputs modulate the recurrent state through
the PhasedConvLSTM time gates."""
import numpy as np

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

from test_train import tiny_config, make_batch


def phased_config(spatial=(16, 16)):
    cfg = tiny_config(recurrent_block_type="convlstm",
                      state_combination="convlstm",
                      spatial_resolution=list(spatial))
    raw = dict(cfg.raw)
    raw["use_phased_arch"] = True
    raw["model"] = {**raw["model"], "use_phased_arch": True,
                    "spatial_resolution": list(spatial)}
    return Config.from_dict(raw)


def _batch_with_times(cfg, seed=0):
    batch = make_batch(cfg, seed=seed)
    B, L, K = 2, 2, cfg.model.every_x_rgb_frame
    rng = np.random.RandomState(seed + 100)
    t0 = np.cumsum(rng.uniform(0.01, 0.2, (B, L, K)), axis=1).astype(np.float32)
    batch["times_events"] = jnp.asarray(t0)
    batch["times_image"] = jnp.asarray(t0[:, :, -1] + 0.005)
    return batch


def test_phased_forward_and_time_sensitivity():
    cfg = phased_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = _batch_with_times(cfg)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, 2, 16, 16)
    _, preds_a = ERGB2DepthRecurrent.forward_sequence(
        params, cfg.model, state0,
        {k: batch[k] for k in ("events", "image", "times_events", "times_image")})
    assert preds_a["image"].shape == (2, 2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(preds_a["image"])))

    # different timestamps -> different predictions (the time gate works)
    batch_b = dict(batch)
    batch_b["times_events"] = batch["times_events"] * 7.3 + 1.0
    batch_b["times_image"] = batch["times_image"] * 7.3 + 1.0
    _, preds_b = ERGB2DepthRecurrent.forward_sequence(
        params, cfg.model, state0,
        {k: batch_b[k] for k in ("events", "image", "times_events", "times_image")})
    diff = np.abs(np.asarray(preds_a["image"]) - np.asarray(preds_b["image"])).max()
    assert diff > 1e-5, diff


def test_phased_streaming_inference(tmp_path):
    """Phased model streaming over synthetic data with real timestamps
    threaded from the dataset (times_events/times_image plumbing)."""
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    from rpg_ramnet_tpu.data import SequenceSynchronizedFramesEventsDataset
    from rpg_ramnet_tpu.eval.inference import StreamingInference

    root = tmp_path / "seq"
    generate_eventscape_sequence(str(root), n_frames=12, height=32, width=32,
                                 events_per_frame=200)
    cfg = phased_config(spatial=(32, 32))  # gate params are per-feature
    ds = SequenceSynchronizedFramesEventsDataset(
        base_folder=str(root), event_folder="events/voxels",
        depth_folder="depth/data", frame_folder="rgb/data",
        sequence_length=1, step_size=1, clip_distance=80.0,
        every_x_rgb_frame=3, reg_factor=3.70378, use_phased_arch=True)
    assert len(ds) >= 2
    item = ds[0]
    assert "times_events" in item and item["times_events"].shape == (1, 3)

    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), cfg.model)
    engine = StreamingInference(params, cfg.model)
    for i in range(2):
        it = ds[i]
        preds = engine.step({"events": it["events"][0],
                             "image": it["image"][0],
                             "times_events": it["times_events"][0],
                             "times_image": it["times_image"][0]})
        assert preds["image"].shape == (32, 32, 1)
        assert np.all(np.isfinite(preds["image"]))


def test_phased_training_step():
    from rpg_ramnet_tpu.train.optim import make_optimizer
    from rpg_ramnet_tpu.train.train_step import make_train_step
    cfg = phased_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, donate=False)
    batch = _batch_with_times(cfg, seed=5)
    first = None
    for _ in range(6):
        params, opt_state, aux = step(params, opt_state, batch)
        assert np.isfinite(float(aux["loss"]))
        if first is None:
            first = float(aux["loss"])
    assert float(aux["loss"]) < first
    # tau/phase gate parameters receive gradients (they're in the pytree)
    leaf = params["encoders_rgb"][0]["recurrent_block"]["phased_cell"]["tau"]
    assert leaf.shape[0] > 0


def test_phased_gate_nhwc_layout_equals_flattened():
    """phased_gate_k (NHWC, no per-step transposes) must be bitwise equal
    to the reference-layout flattened gate (phased_lstm_gate_apply) — same
    scalar ops, only the layout of the tau/phase broadcast changes."""
    from rpg_ramnet_tpu.models import layers as L
    rng = np.random.RandomState(3)
    B, H, W, C = 2, 4, 6, 3
    F = C * H * W
    p = {"tau": jnp.asarray(rng.uniform(0.02, 50, F).astype(np.float32)),
         "phase": jnp.asarray(rng.uniform(0, 5, F).astype(np.float32))}
    t = jnp.asarray((rng.rand(B) * 10).astype(np.float32))
    k_nhwc = L.phased_gate_k(p, t, H, W, C)
    # flattened oracle: blend 1 vs 0 returns k itself (k*1 + (1-k)*0 = k)
    ones = jnp.ones((B, F), jnp.float32)
    zeros = jnp.zeros((B, F), jnp.float32)
    h_new, _ = L.phased_lstm_gate_apply(p, zeros, ones, zeros, zeros, t)
    k_flat = np.asarray(h_new).reshape(B, C, H, W).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(k_nhwc), k_flat)


def test_phased_fused_cells_match_unfused():
    """fused_gru='on' + bf16 on the phased arch: the x/h-split fused Pallas
    LSTM h-side cells (phased encoders AND convlstm state combination,
    interpret mode) must match the all-XLA forward at bf16 tolerance."""
    import dataclasses
    from rpg_ramnet_tpu.ops import gru_hside

    cfg = phased_config(spatial=(32, 32))
    m_on = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                               fused_gru="on")
    m_off = dataclasses.replace(m_on, fused_gru="off")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), m_on)
    state0 = ERGB2DepthRecurrent.init_state(m_on, 1, 32, 32)
    K = m_on.every_x_rgb_frame
    rng = np.random.RandomState(0)
    pkg = {
        "events": jnp.asarray(rng.randn(1, K, 32, 32, 5).astype(np.float32)),
        "image": jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32)),
        "times_events": jnp.asarray(
            np.cumsum(rng.uniform(0.01, 0.1, (1, K)), 1).astype(np.float32)),
        "times_image": jnp.asarray(np.float32([0.5])),
    }
    gru_hside._INTERPRET = True
    try:
        st_f, p_f = ERGB2DepthRecurrent.forward_package(
            params, m_on, state0, pkg, allow_fused=True)
        st_f, p_f = jax.tree_util.tree_map(np.asarray, (st_f, p_f))
    finally:
        gru_hside._INTERPRET = False
    st_p, p_p = ERGB2DepthRecurrent.forward_package(
        params, m_off, state0, pkg, allow_fused=True)
    for k in p_p:
        d = np.max(np.abs(np.asarray(p_f[k], np.float32)
                          - np.asarray(p_p[k], np.float32)))
        assert d < 0.05, (k, d)   # bf16 tolerance (f32-accum kernel gates)
    for a, b in zip(jax.tree_util.tree_leaves(st_f),
                    jax.tree_util.tree_leaves(st_p)):
        d = np.max(np.abs(np.asarray(a, np.float32)
                          - np.asarray(b, np.float32)))
        assert d < 0.05, d


def test_phased_deferred_decode_training_equivalence():
    """trainer.deferred_decode under the phased arch: times feed only the
    PhasedLSTM gates inside the scan, so the deferred batched decode must
    reproduce the in-scan decode's loss and gradients exactly."""
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    cfg1 = phased_config()
    cfg2 = Config.from_dict({**cfg1.raw,
                             "trainer": {**cfg1.raw["trainer"],
                                         "deferred_decode": True}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg1.model)
    batch = _batch_with_times(cfg1, seed=3)
    state0 = ERGB2DepthRecurrent.init_state(cfg1.model, 2, 16, 16)
    outs = {}
    for name, cfg in (("inscan", cfg1), ("deferred", cfg2)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["inscan"][0] - outs["deferred"][0]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        outs["inscan"][1], outs["deferred"][1])
