"""Full-architecture numerical parity vs the reference PyTorch models.

Builds the reference torch model (random torch init), converts its
state_dict with compat.state_dict_to_params, runs both implementations on
identical random datapackages, and compares every prediction and carried
state.  This is the checkpoint-compatibility guarantee for the released
ramnet_sim checkpoints (BASELINE configs 1-3) without needing the weights.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import ModelConfig
from rpg_ramnet_tpu.compat import state_dict_to_params
from rpg_ramnet_tpu.models import ERGB2Depth, ERGB2DepthRecurrent
from rpg_ramnet_tpu.models import statenet

from reference_loader import make_reference_model

ATOL = 2e-5


def base_cfg(**over):
    d = dict(
        num_bins_rgb=1, num_bins_events=5, skip_type="sum",
        state_combination="convgru", num_encoders=3, base_num_channels=8,
        num_residual_blocks=2, recurrent_block_type="conv", norm="none",
        use_upsample_conv=True, every_x_rgb_frame=3, baseline=False,
        loss_composition=["image", "events2"], gpu=0, spatial_resolution=[32, 32],
        use_phased_arch=False,
    )
    d.update(over)
    return d


def make_package(rng, cfg: ModelConfig, B=2, H=32, W=32):
    K = cfg.every_x_rgb_frame if not cfg.is_baseline else cfg.every_x_rgb_frame - 1
    ev = rng.randn(B, max(K, 0), H, W, cfg.num_bins_events).astype(np.float32)
    img_bins = cfg.num_bins_rgb
    img = rng.randn(B, H, W, img_bins).astype(np.float32)
    return {"events": ev, "image": img}


def torch_item_from_package(pkg, cfg: ModelConfig, loop_range):
    item = {}
    for k in range(loop_range):
        item[f"events{k}"] = torch.from_numpy(
            np.moveaxis(pkg["events"][:, k], -1, 1).copy())
    item["image"] = torch.from_numpy(np.moveaxis(pkg["image"], -1, 1).copy())
    return item


def run_reference(tm, cfg: ModelConfig, packages, loop_range):
    prev_super = None
    prev_lstm = {f"events{k}": None for k in range(cfg.every_x_rgb_frame)}
    prev_lstm["image"] = None
    all_preds = []
    with torch.no_grad():
        for pkg in packages:
            item = torch_item_from_package(pkg, cfg, loop_range)
            preds, supers, lstm = tm(item, prev_super, prev_lstm)
            prev_super = supers["image"]
            prev_lstm = lstm
            all_preds.append({k: np.moveaxis(v.numpy(), 1, -1) for k, v in preds.items()})
    return all_preds, prev_super


def run_ours(params, cfg: ModelConfig, packages):
    B, _, H, W = packages[0]["events"].shape[0], None, packages[0]["image"].shape[1], packages[0]["image"].shape[2]
    state = ERGB2DepthRecurrent.init_state(cfg, B, H, W)
    fwd = jax.jit(lambda p, s, pkg: ERGB2DepthRecurrent.forward_package(p, cfg, s, pkg))
    all_preds = []
    for pkg in packages:
        state, preds = fwd(params, state, {k: jnp.asarray(v) for k, v in pkg.items()})
        all_preds.append({k: np.asarray(v) for k, v in preds.items()})
    return all_preds, state


# NOTE: the reference's non-baseline 'sum'/'conv' state combinations are
# broken upstream (statenet.py:231 unpacks the single tensor returned by
# state_sum/state_conv into two, iterating over the batch dim -> crash).  We
# implement the evident intent (super = x + prev / conv(cat)); no parity test
# is possible against crashing code, so only working variants are compared.
# NOTE: the reference StateNet only RUNS with skip_type='sum' — for
# concat/no_skip it builds 2x-wide decoders but feeds decoder 0 unskipped /
# identity-skipped single-width tensors (statenet.py:111,303) -> channel
# mismatch crash.  Parity is therefore only testable for 'sum'; our
# implementation makes concat/no_skip functional (tested separately below).
@pytest.mark.smoke
@pytest.mark.parametrize("variant", [
    "ramnet_convgru",       # the shipped RAM-Net config (conv enc + convgru comb)
    "convlstm_enc_comb",    # convlstm encoders + convlstm state combination
])
def test_ergb2depth_recurrent_parity(variant):
    over = {}
    if variant == "convlstm_enc_comb":
        over = dict(recurrent_block_type="convlstm", state_combination="convlstm")
    elif variant == "sum_comb":
        over = dict(state_combination="sum")
    cfg_d = base_cfg(**over)
    tm = make_reference_model("ERGB2DepthRecurrent", cfg_d)
    cfg = ModelConfig.from_dict(cfg_d)
    params = state_dict_to_params(tm.state_dict())

    rng = np.random.RandomState(0)
    packages = [make_package(rng, cfg) for _ in range(3)]
    loop_range = cfg.every_x_rgb_frame

    ref_preds, ref_super = run_reference(tm, cfg, packages, loop_range)
    our_preds, our_state = run_ours(params, cfg, packages)

    for step, (rp, op) in enumerate(zip(ref_preds, our_preds)):
        assert set(rp) == set(op), (step, set(rp), set(op))
        for k in rp:
            np.testing.assert_allclose(
                op[k], rp[k], atol=ATOL, rtol=1e-4,
                err_msg=f"variant={variant} step={step} key={k}")

    # final super states must match too (they carry across TBPTT windows)
    for i, s in enumerate(our_state.super_states):
        ref_s = ref_super[i]
        if isinstance(ref_s, (list, tuple)):
            for j in range(2):
                np.testing.assert_allclose(
                    np.asarray(s[j]), np.moveaxis(ref_s[j].numpy(), 1, -1),
                    atol=ATOL, rtol=1e-4)
        else:
            np.testing.assert_allclose(
                np.asarray(s), np.moveaxis(ref_s.numpy(), 1, -1),
                atol=ATOL, rtol=1e-4)


@pytest.mark.parametrize("baseline,loss_comp,num_bins_rgb", [
    ("rgb", ["image"], 1),
    ("ergb0", ["image"], 6),
])
def test_baseline_parity(baseline, loss_comp, num_bins_rgb):
    cfg_d = base_cfg(baseline=baseline, loss_composition=loss_comp,
                     num_bins_rgb=num_bins_rgb)
    tm = make_reference_model("ERGB2DepthRecurrent", cfg_d)
    cfg = ModelConfig.from_dict(cfg_d)
    params = state_dict_to_params(tm.state_dict())

    rng = np.random.RandomState(1)
    from rpg_ramnet_tpu.models.model import event_loop_range
    loop = event_loop_range(cfg)
    B, H, W = 2, 32, 32
    packages = []
    for _ in range(2):
        ev = rng.randn(B, max(loop, 1), H, W, num_bins_rgb).astype(np.float32)
        img = rng.randn(B, H, W, num_bins_rgb).astype(np.float32)
        packages.append({"events": ev, "image": img})

    ref_preds, _ = run_reference(tm, cfg, packages, loop)
    our_preds, _ = run_ours(params, cfg, packages)
    for step, (rp, op) in enumerate(zip(ref_preds, our_preds)):
        assert set(rp) == set(op)
        for k in rp:
            np.testing.assert_allclose(op[k], rp[k], atol=ATOL, rtol=1e-4,
                                       err_msg=f"{baseline} step={step} key={k}")


@pytest.mark.parametrize("skip_type", ["concat", "no_skip", "sum"])
def test_skip_variants_functional(skip_type):
    """Our StateNet runs all skip variants (the reference crashes for
    concat/no_skip; see note above) with correct shapes and finite output."""
    cfg = ModelConfig.from_dict(base_cfg(skip_type=skip_type))
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    pkg = {k: jnp.asarray(v) for k, v in make_package(rng, cfg).items()}
    state = ERGB2DepthRecurrent.init_state(cfg, 2, 32, 32)
    state, preds = ERGB2DepthRecurrent.forward_package(params, cfg, state, pkg)
    for k, v in preds.items():
        assert v.shape == (2, 32, 32, 1)
        assert np.all(np.isfinite(np.asarray(v)))


def test_unet_parity():
    cfg_d = base_cfg(num_bins_rgb=6, baseline="ergb", every_x_rgb_frame=1)
    tm = make_reference_model("ERGB2Depth", cfg_d)
    cfg = ModelConfig.from_dict(cfg_d)
    params = state_dict_to_params(tm.state_dict())

    rng = np.random.RandomState(2)
    x = rng.randn(2, 32, 32, 6).astype(np.float32)
    with torch.no_grad():
        ref, _, _ = tm({"image": torch.from_numpy(np.moveaxis(x, -1, 1).copy())}, None, None)
    ref_img = np.moveaxis(ref["image"].numpy(), 1, -1)
    _, preds = ERGB2Depth.forward_package(params, cfg, (), {"image": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(preds["image"]), ref_img, atol=ATOL, rtol=1e-4)


def test_forward_sequence_matches_stepwise():
    """lax.scan over L packages == explicit python loop (scan correctness)."""
    cfg_d = base_cfg()
    cfg = ModelConfig.from_dict(cfg_d)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    B, L, K, H, W = 2, 4, cfg.every_x_rgb_frame, 32, 32
    seq = {
        "events": jnp.asarray(rng.randn(B, L, K, H, W, cfg.num_bins_events).astype(np.float32)),
        "image": jnp.asarray(rng.randn(B, L, H, W, cfg.num_bins_rgb).astype(np.float32)),
    }
    state0 = ERGB2DepthRecurrent.init_state(cfg, B, H, W)
    final_state, preds = ERGB2DepthRecurrent.forward_sequence(params, cfg, state0, seq)

    state = state0
    for l in range(L):
        pkg = {"events": seq["events"][:, l], "image": seq["image"][:, l]}
        state, p = ERGB2DepthRecurrent.forward_package(params, cfg, state, pkg)
        for k in p:
            np.testing.assert_allclose(np.asarray(preds[k][l]), np.asarray(p[k]),
                                       atol=1e-5, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        final_state, state)
