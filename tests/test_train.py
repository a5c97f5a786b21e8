"""Training-stack tests: loss gradient flow, optimizer parity with the
reference recipe, DP sharding == single-device equivalence on the virtual
8-device CPU mesh (SURVEY.md §4 rebuild test strategy)."""
import json
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss, supervised_keys
from rpg_ramnet_tpu.train.optim import make_optimizer, lr_at_epoch, set_learning_rate
from rpg_ramnet_tpu.train.train_step import make_train_step, make_eval_step
from rpg_ramnet_tpu.parallel import make_mesh, shard_batch, replicate


def tiny_config(**model_over):
    model = dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
                 recurrent_block_type="conv", state_combination="convgru",
                 num_encoders=2, base_num_channels=4, num_residual_blocks=1,
                 use_upsample_conv=True, norm="none")
    model.update(model_over)
    cfg = {
        "name": "tiny", "arch": "ERGB2DepthRecurrent",
        "use_phased_arch": False,
        "data_loader": {
            "train": {"every_x_rgb_frame": 3, "baseline": False,
                      "clip_distance": 80.0, "reg_factor": 3.70378},
            "batch_size": 2,
        },
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
        "lr_scheduler_type": "ExponentialLR", "lr_scheduler_freq": 100,
        "lr_scheduler": {"gamma": 0.5},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "trainer": {"epochs": 2, "sequence_length": 2,
                    "loss_composition": ["image", "events2"],
                    "loss_weights": [1, 1]},
        "model": model,
    }
    return Config.from_dict(cfg)


def make_batch(cfg, B=2, L=2, H=16, W=16, seed=0):
    rng = np.random.RandomState(seed)
    K = cfg.model.every_x_rgb_frame
    return {
        "events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
        "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
        "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
        "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
    }


def test_supervised_keys():
    cfg = tiny_config()
    assert supervised_keys(cfg) == ("events2", "image")


@pytest.mark.smoke
def test_loss_finite_and_grads_flow():
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(cfg)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, 2, 16, 16)
    loss_fn = make_sequence_loss(cfg)
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state0, batch)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # every parameter should receive gradient (shared decoder + both encoders)
    nonzero = [float(jnp.abs(g).sum()) > 0 for g in leaves]
    assert np.mean(nonzero) > 0.95, f"{np.mean(nonzero)} of leaves have grad"


def test_nan_targets_do_not_poison_grads():
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(cfg)
    di = np.asarray(batch["depth_image"]).copy()
    di[:, :, 2:5, 3:7] = np.nan
    batch["depth_image"] = jnp.asarray(di)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, 2, 16, 16)
    loss_fn = make_sequence_loss(cfg)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state0, batch)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads))


def test_train_step_reduces_loss():
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, donate=False)
    batch = make_batch(cfg, seed=5)
    first = None
    for i in range(12):
        params, opt_state, aux = step(params, opt_state, batch)
        if first is None:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert last < first, (first, last)


def test_legacy_loss_scaling_factor():
    cfg = tiny_config()
    cfg_legacy = Config.from_dict({**cfg.raw, "trainer": {**cfg.raw["trainer"],
                                                          "legacy_loss_scaling": True}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    batch = make_batch(cfg)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, 2, 16, 16)
    l_fixed, _ = make_sequence_loss(cfg)(params, state0, batch)
    l_legacy, _ = make_sequence_loss(cfg_legacy)(params, state0, batch)
    np.testing.assert_allclose(float(l_legacy), 2 * float(l_fixed), rtol=1e-6)


def test_lr_schedule_matches_reference_semantics():
    cfg = tiny_config()
    lr0 = 3e-4
    assert lr_at_epoch(cfg, 0) == lr0
    assert lr_at_epoch(cfg, 99) == lr0
    np.testing.assert_allclose(lr_at_epoch(cfg, 100), lr0 * 0.5)
    np.testing.assert_allclose(lr_at_epoch(cfg, 200), lr0 * 0.25)


def test_dp_mesh_equals_single_device():
    """The same program on an 8-device 'data' mesh must produce the same
    params as single-device execution (the JAX-native distributed test)."""
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), cfg.model)
    opt = make_optimizer(cfg)
    batch = make_batch(cfg, B=8, seed=9)

    p1 = params
    s1 = opt.init(p1)
    step1 = make_train_step(cfg, opt, donate=False)
    for _ in range(2):
        p1, s1, aux1 = step1(p1, s1, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    p2 = replicate(params, mesh)
    s2 = opt.init(p2)
    step8 = make_train_step(cfg, opt, mesh=mesh, donate=False)
    sb = shard_batch(batch, mesh)
    for _ in range(2):
        p2, s2, aux2 = step8(p2, s2, sb)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        p1, p2)


def test_packed_batch_layout_equivalence():
    """pack_train_batch (channel-first + squeezed targets, the TPU memory
    layout) must produce identical loss and gradients to the NHWC batch."""
    from rpg_ramnet_tpu.train.sequence_loss import pack_train_batch
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(4), cfg.model)
    batch = make_batch(cfg, seed=11)
    batch_np = {k: np.asarray(v) for k, v in batch.items()}
    packed = pack_train_batch(batch_np)
    # time-leading channel-first: [L, B, K, C, H, W]
    assert "events_tcf" in packed and packed["events_tcf"].shape[3] == 5
    assert packed["events_tcf"].shape[:2] == (2, 2)
    assert packed["depth_image_t"].ndim == 4

    state0 = ERGB2DepthRecurrent.init_state(cfg.model, 2, 16, 16)
    loss_fn = make_sequence_loss(cfg)
    (l1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(params, state0, batch)
    (l2, _), g2 = jax.value_and_grad(loss_fn, has_aux=True)(
        params, state0, {k: jnp.asarray(v) for k, v in packed.items()})
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4), g1, g2)


def test_grad_accumulation():
    """trainer.grad_accum splits the batch into micro-batches; losses/grads
    are micro-batch means (close to, not bit-equal with, full-batch SI loss
    whose mean-term is batch-global)."""
    cfg = tiny_config()
    cfg2 = Config.from_dict({**cfg.raw,
                             "trainer": {**cfg.raw["trainer"], "grad_accum": 2}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(6), cfg.model)
    opt = make_optimizer(cfg)
    batch = make_batch(cfg, B=4, seed=13)

    s1 = make_train_step(cfg, opt, donate=False)
    s2 = make_train_step(cfg2, opt, donate=False)
    p1, o1, a1 = s1(params, opt.init(params), batch)
    p2, o2, a2 = s2(params, opt.init(params), batch)
    assert np.isfinite(float(a2["loss"]))
    # the SI term is a batch mean -> nearly batch-size independent; the
    # multi-scale-grad term scales with batch size by reference design
    # (loss.py:55 multiplies by batch), so micro-batching halves it — the
    # same loss you'd get training at the micro-batch size.
    np.testing.assert_allclose(float(a1["L_si"]), float(a2["L_si"]), rtol=0.05)
    np.testing.assert_allclose(float(a1["L_grad"]) / 2,
                               float(a2["L_grad"]), rtol=0.05)


def test_eval_step():
    cfg = tiny_config()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(3), cfg.model)
    ev = make_eval_step(cfg)
    aux = ev(params, make_batch(cfg))
    assert np.isfinite(float(aux["loss"]))


def test_remat_chunk_equivalence():
    """remat_chunk groups packages per checkpoint (recompute/memory trade);
    loss and grads must be identical to the per-package scan."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    cfg1 = tiny_config()
    cfg2 = tiny_config()
    cfg2.raw.setdefault("trainer", {})["remat_chunk"] = 2
    from rpg_ramnet_tpu.core.config import Config
    cfg2 = Config.from_dict({**cfg2.raw,
                             "trainer": {**cfg2.raw["trainer"], "remat_chunk": 2}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg1.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg1.model, B, H, W)
    outs = {}
    for name, cfg in (("chunk1", cfg1), ("chunk2", cfg2)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["chunk1"][0] - outs["chunk2"][0]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        outs["chunk1"][1], outs["chunk2"][1])


def test_deferred_decode_equivalence():
    """trainer.deferred_decode moves the supervised decodes outside the
    (remat'd) scan into ONE batched decoder pass; loss and every gradient
    must match the in-scan decode path."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    cfg1 = tiny_config()
    cfg2 = Config.from_dict({**cfg1.raw,
                             "trainer": {**cfg1.raw["trainer"],
                                         "deferred_decode": True}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg1.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg1.model, B, H, W)
    outs = {}
    for name, cfg in (("inscan", cfg1), ("deferred", cfg2)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["inscan"][0] - outs["deferred"][0]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-5),
        outs["inscan"][1], outs["deferred"][1])


def test_precompute_x_training_equivalence():
    """trainer.precompute_x batches each package's encoder sweeps + ConvGRU
    x-side gate convs inside the remat'd deferred-decode scan step; loss and
    gradients must match the plain deferred path to float-summation
    tolerance (conv([x,h]) == conv_x(x)+conv_h(h) exactly; ~1 ulp float)."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    cfg1 = Config.from_dict({**tiny_config().raw,
                             "trainer": {**tiny_config().raw["trainer"],
                                         "deferred_decode": True}})
    cfg2 = Config.from_dict({**cfg1.raw,
                             "trainer": {**cfg1.raw["trainer"],
                                         "precompute_x": True}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg1.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg1.model, B, H, W)
    outs = {}
    for name, cfg in (("deferred", cfg1), ("precompute", cfg2)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["deferred"][0] - outs["precompute"][0]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        outs["deferred"][1], outs["precompute"][1])


def test_precompute_x_unsupported_config_warns_and_falls_back():
    """precompute_x on a config without state-independent encoders (convlstm
    blocks) must warn and use the plain path, not crash."""
    import warnings
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    raw = tiny_config().raw
    cfg = Config.from_dict({**raw,
                            "model": {**raw["model"],
                                      "recurrent_block_type": "convlstm"},
                            "trainer": {**raw["trainer"],
                                        "deferred_decode": True,
                                        "precompute_x": True}})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loss_fn = make_sequence_loss(cfg, remat=True)
    assert any("precompute_x" in str(x.message) for x in w)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 1, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, B, H, W)
    loss, aux = loss_fn(params, state0, batch)
    assert np.isfinite(float(loss))


def test_dp_mesh_deferred_decode_equals_single_device():
    """The flagship TPU recipe combines DP sharding with deferred decode:
    the snapshot concat/reshape crosses the sharded batch axis, so GSPMD
    must produce the same result as single-device execution."""
    cfg = Config.from_dict({**tiny_config().raw,
                            "trainer": {**tiny_config().raw["trainer"],
                                        "deferred_decode": True}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), cfg.model)
    opt = make_optimizer(cfg)
    batch = make_batch(cfg, B=8, seed=9)

    p1 = params
    s1 = opt.init(p1)
    step1 = make_train_step(cfg, opt, donate=False)
    for _ in range(2):
        p1, s1, aux1 = step1(p1, s1, batch)

    mesh = make_mesh()
    p2 = replicate(params, mesh)
    s2 = opt.init(p2)
    step8 = make_train_step(cfg, opt, mesh=mesh, donate=False)
    sb = shard_batch(batch, mesh)
    for _ in range(2):
        p2, s2, aux2 = step8(p2, s2, sb)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        p1, p2)


def test_deferred_decode_bn_training_warns_and_falls_back():
    """trainer.deferred_decode under training-mode BN must WARN (round-2
    verdict: users of the flagship config with norm enabled silently lost
    the deferral) and fall back to the in-scan decode path — loss identical
    to the same config without deferred_decode."""
    import warnings
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    raw = tiny_config().raw
    raw_bn = {**raw, "model": {**raw["model"], "norm": "BN"}}
    cfg_def = Config.from_dict({**raw_bn,
                                "trainer": {**raw_bn["trainer"],
                                            "deferred_decode": True}})
    cfg_ref = Config.from_dict(raw_bn)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loss_def = make_sequence_loss(cfg_def, remat=True, training=True)
    assert any("deferred_decode is incompatible with training-mode"
               in str(x.message) for x in w)
    loss_ref = make_sequence_loss(cfg_ref, remat=True, training=True)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0),
                                             cfg_def.model)
    rng = np.random.RandomState(3)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg_def.model, B, H, W)
    l_def, aux_def = loss_def(params, state0, batch)
    l_ref, aux_ref = loss_ref(params, state0, batch)
    assert abs(float(l_def) - float(l_ref)) < 1e-7
    # the fallback really ran training-mode BN (running stats returned)
    assert "norm_stats" in aux_def


@pytest.mark.parametrize("comb", ["convgru", "convlstm"])
def test_precompute_x_fused_training_grads_match(monkeypatch, comb):
    """The FULL training path with the fused Pallas h-side cells on its
    sequential critical path (trainer.precompute_x + fused_gru='on',
    remat'd scan, custom VJP): loss and all gradients must match the
    unfused path.  Kernels run via force_tpu_interpret_mode on CPU;
    supports() is patched to admit f32 (hardware is bf16-only)."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.ops import gru_hside

    real_pick = gru_hside._pick_tile_h

    def fake_supports(prev_state, lstm=False):
        if prev_state.ndim != 4:
            return False
        _, H, W, C = prev_state.shape
        budget = 256 * 1024 if lstm else 512 * 1024
        return (real_pick(H, W, C, 4, budget=budget) > 0
                and W % 8 == 0 and C % 8 == 0)

    monkeypatch.setattr(gru_hside, "supports", fake_supports)
    # interpret mode via the module hook: plain pallas interpret evaluation
    # composes with remat, unlike force_tpu_interpret_mode's ordered
    # callback effect
    monkeypatch.setattr(gru_hside, "_INTERPRET", True)

    raw = tiny_config(state_combination=comb).raw
    raw_def = {**raw, "trainer": {**raw["trainer"], "deferred_decode": True,
                                  "precompute_x": True}}
    cfg_unfused = Config.from_dict({**raw_def,
                                    "model": {**raw_def["model"],
                                              "fused_gru": "off"}})
    cfg_fused = Config.from_dict({**raw_def,
                                  "model": {**raw_def["model"],
                                            "fused_gru": "on"}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0),
                                             cfg_fused.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg_fused.model, B, H, W)
    outs = {}
    for name, cfg in (("unfused", cfg_unfused), ("fused", cfg_fused)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["unfused"][0] - outs["fused"][0]) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-5, rtol=1e-3),
        outs["unfused"][1], outs["fused"][1])


def test_remat_policy_equivalence():
    """trainer.remat_policy='enc_out' saves the tagged per-scale encoder
    outputs inside the per-step jax.checkpoint (backward skips the
    head+encoder recompute); loss and every gradient must be identical to
    the save-nothing default — on BOTH the deferred-decode and in-scan
    paths."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    for deferred in (False, True):
        cfg1 = Config.from_dict({**tiny_config().raw,
                                 "trainer": {**tiny_config().raw["trainer"],
                                             "deferred_decode": deferred}})
        cfg2 = Config.from_dict({**cfg1.raw,
                                 "trainer": {**cfg1.raw["trainer"],
                                             "remat_policy": "enc_out"}})
        params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0),
                                                 cfg1.model)
        state0 = ERGB2DepthRecurrent.init_state(cfg1.model, B, H, W)
        outs = {}
        for name, cfg in (("none", cfg1), ("enc_out", cfg2)):
            loss_fn = make_sequence_loss(cfg, remat=True)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state0, batch)
            outs[name] = (float(loss), grads)
        assert abs(outs["none"][0] - outs["enc_out"][0]) < 1e-6, deferred
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=f"deferred={deferred}"),
            outs["none"][1], outs["enc_out"][1])


def test_remat_policy_gru_gx_equivalence():
    """trainer.remat_policy='gru_gx' (round 5) saves the tagged per-scale
    x-side gate pre-activations inside the per-step jax.checkpoint on the
    precompute_x path — the backward skips the head+encoder+gate-conv
    recompute.  Loss and every gradient must match the save-nothing
    precompute_x run exactly."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    rng = np.random.RandomState(1)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    base = Config.from_dict({**tiny_config().raw,
                             "trainer": {**tiny_config().raw["trainer"],
                                         "deferred_decode": True,
                                         "precompute_x": True}})
    pol = Config.from_dict({**base.raw,
                            "trainer": {**base.raw["trainer"],
                                        "remat_policy": "gru_gx"}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), base.model)
    state0 = ERGB2DepthRecurrent.init_state(base.model, B, H, W)
    outs = {}
    for name, cfg in (("none", base), ("gru_gx", pol)):
        loss_fn = make_sequence_loss(cfg, remat=True)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        outs[name] = (float(loss), grads)
    assert abs(outs["none"][0] - outs["gru_gx"][0]) < 1e-6
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        outs["none"][1], outs["gru_gx"][1])


def test_precompute_x_fused_bwd_kernel_training_grads_match(monkeypatch):
    """Same full-training-path equivalence, with the Pallas BACKWARD kernel
    (gru_hside._BWD_KERNEL) on the remat'd scan's reverse pass: loss and all
    gradients must match the unfused path."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.ops import gru_hside

    real_pick = gru_hside._pick_tile_h

    def fake_supports(prev_state, lstm=False):
        if prev_state.ndim != 4:
            return False
        _, H, W, C = prev_state.shape
        budget = 256 * 1024 if lstm else 512 * 1024
        return (real_pick(H, W, C, 4, budget=budget) > 0
                and W % 8 == 0 and C % 8 == 0)

    monkeypatch.setattr(gru_hside, "supports", fake_supports)
    monkeypatch.setattr(gru_hside, "bwd_supports", lambda h: h.ndim == 4)
    monkeypatch.setattr(gru_hside, "_INTERPRET", True)

    raw = tiny_config(state_combination="convgru").raw
    raw_def = {**raw, "trainer": {**raw["trainer"], "deferred_decode": True,
                                  "precompute_x": True}}
    cfg_unfused = Config.from_dict({**raw_def,
                                    "model": {**raw_def["model"],
                                              "fused_gru": "off"}})
    cfg_fused = Config.from_dict({**raw_def,
                                  "model": {**raw_def["model"],
                                            "fused_gru": "on"}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0),
                                             cfg_fused.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    state0 = ERGB2DepthRecurrent.init_state(cfg_fused.model, B, H, W)
    loss_fn_ref = make_sequence_loss(cfg_unfused, remat=True)
    (l_ref, _), g_ref = jax.value_and_grad(loss_fn_ref, has_aux=True)(
        params, state0, batch)
    monkeypatch.setattr(gru_hside, "_BWD_KERNEL", True)
    loss_fn = make_sequence_loss(cfg_fused, remat=True)
    (l_k, _), g_k = jax.value_and_grad(loss_fn, has_aux=True)(
        params, state0, batch)
    assert abs(float(l_ref) - float(l_k)) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-5, rtol=1e-3),
        g_ref, g_k)



def test_phased_fused_training_grads_match(monkeypatch):
    """fused_gru='on' + deferred decode on the PHASED arch: the
    single-launch phased cell (ops/phased_cell.py, custom VJP incl.
    tau/phase/times grads) on the TBPTT scan's critical path must
    reproduce the unfused loss and ALL gradients (interpret mode)."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
    from rpg_ramnet_tpu.core.config import Config
    from rpg_ramnet_tpu.ops import gru_hside

    real_pick = gru_hside._pick_tile_h

    def fake_supports(prev_state, lstm=False):
        if prev_state.ndim != 4:
            return False
        _, H, W, C = prev_state.shape
        budget = 256 * 1024 if lstm else 512 * 1024
        return (real_pick(H, W, C, 4, budget=budget) > 0
                and W % 8 == 0 and C % 8 == 0)

    monkeypatch.setattr(gru_hside, "supports", fake_supports)
    monkeypatch.setattr(gru_hside, "_INTERPRET", True)

    raw = tiny_config(recurrent_block_type="convlstm",
                      state_combination="convlstm",
                      spatial_resolution=[16, 16]).raw
    raw = {**raw, "use_phased_arch": True,
           "trainer": {**raw["trainer"], "deferred_decode": True},
           "model": {**raw["model"], "use_phased_arch": True,
                     "spatial_resolution": [16, 16]}}
    cfg_unfused = Config.from_dict({**raw, "model": {**raw["model"],
                                                     "fused_gru": "off"}})
    cfg_fused = Config.from_dict({**raw, "model": {**raw["model"],
                                                   "fused_gru": "on"}})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0),
                                             cfg_fused.model)
    rng = np.random.RandomState(0)
    B, L, K, H, W = 2, 2, 3, 16, 16
    batch = {"events": jnp.asarray(
                 rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(
                 rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(
                 rng.rand(B, L, H, W, 1).astype(np.float32)),
             "times_events": jnp.asarray(np.cumsum(
                 rng.uniform(0.01, 0.2, (B, L, K)), 1).astype(np.float32))}
    batch["times_image"] = batch["times_events"][:, :, -1] + 0.005
    state0 = ERGB2DepthRecurrent.init_state(cfg_fused.model, B, H, W)
    loss_fn_ref = make_sequence_loss(cfg_unfused, remat=True)
    (l_ref, _), g_ref = jax.value_and_grad(loss_fn_ref, has_aux=True)(
        params, state0, batch)
    loss_fn = make_sequence_loss(cfg_fused, remat=True)
    (l_f, _), g_f = jax.value_and_grad(loss_fn, has_aux=True)(
        params, state0, batch)
    assert abs(float(l_ref) - float(l_f)) < 1e-5
    # tau/phase gate params must carry matching (non-trivial) grads
    tau_g = g_f["encoders_rgb"][0]["recurrent_block"]["phased_cell"]["tau"]
    assert float(jnp.max(jnp.abs(tau_g))) > 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=5e-5, rtol=1e-3),
        g_ref, g_f)


def test_frame_reconstruction_trainer():
    """TPU-native equivalent of the reference's legacy E2VID Trainer
    (trainer/trainer.py:8-189): events->frame reconstruction with contrast
    loss.  Loss decreases over epochs; the contrast term matches a numpy
    re-derivation (torch.std ddof=1 semantics); previews are [ev|pred|gt]
    1x3 grids."""
    import jax.numpy as jnp
    import optax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2Depth
    from rpg_ramnet_tpu.train.frame_trainer import (
        FrameReconstructionTrainer, contrast_loss, make_preview)

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 5, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 2, "base_num_channels": 4, "num_residual_blocks": 1,
        "use_upsample_conv": True, "norm": "none", "baseline": False})
    params = ERGB2Depth.init_params(jax.random.PRNGKey(0), mcfg)

    def apply(p, events):
        _, preds = ERGB2Depth.forward_package(p, mcfg, None,
                                              {"image": events})
        return preds["image"]

    def mse(pred, target):
        return jnp.mean((pred - target) ** 2)

    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 16
    batches = [{"events": rng.randn(B, H, W, 5).astype(np.float32),
                "frame": rng.rand(B, H, W, 1).astype(np.float32)}
               for _ in range(3)]
    tr = FrameReconstructionTrainer(
        params, apply, mse, optax.adam(1e-3), weight_contrast_loss=0.5,
        metrics=[("mse", lambda p, t: float(np.mean((p - t) ** 2)))])
    log1 = tr.train_epoch(batches,
                          preview_items=[{k: v[0] for k, v in
                                          batches[0].items()}])
    for _ in range(4):
        log2 = tr.train_epoch(batches)
    assert log2["loss"] < log1["loss"]
    assert np.isfinite(log1["metrics"][0])
    assert log1["previews"][0].shape == (H, 3 * W)
    val = tr.valid_epoch(batches[:1])
    assert np.isfinite(val["val_loss"])

    # contrast term vs numpy (sample std, ddof=1 — torch.std default)
    a = rng.randn(2, 8, 8, 1).astype(np.float32)
    b = rng.rand(2, 8, 8, 1).astype(np.float32)
    got = float(contrast_loss(jnp.asarray(a), jnp.asarray(b), 0.7))
    want = 0.7 * (np.std(a, ddof=1) - np.std(b, ddof=1)) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # preview normalization: each panel spans [0, 1]
    g = make_preview(a[0].repeat(5, -1), b[0], a[0])
    assert g.min() >= 0.0 and g.max() <= 1.0 + 1e-6
