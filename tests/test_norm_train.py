"""Training-mode BN / IN parity vs the reference in torch .train() mode.

The reference trains with BatchNorm2d / InstanceNorm2d(track_running_stats=
True) when `norm` is configured (submodules.py:13-24); round 1 only had eval
semantics.  These tests drive BOTH implementations through a 2-package
training-mode forward with carried state and assert (a) every prediction and
(b) every updated running-stat buffer agree."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.models.layers import extract_norm_stats, merge_norm_stats
from rpg_ramnet_tpu.compat.torch_import import state_dict_to_params
from reference_loader import make_reference_model

B, H, W, K, L = 2, 16, 16, 2, 2


def model_cfg(norm):
    return dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
                state_combination="convgru", num_encoders=2,
                base_num_channels=4, num_residual_blocks=1,
                recurrent_block_type="conv", norm=norm,
                use_upsample_conv=True, every_x_rgb_frame=K, baseline=False,
                loss_composition=["image", f"events{K-1}"], gpu=0,
                spatial_resolution=[H, W], use_phased_arch=False)


def run_reference_train(tm, seq):
    """Drive the torch model in .train() mode over L packages, carrying
    states exactly like the reference trainer (lstm_trainer.py:256-272)."""
    import torch
    tm.train()
    prev_supers = None
    prev_lstm = {f"events{k}": None for k in range(K)}
    prev_lstm["image"] = None
    all_preds = []
    with torch.no_grad():
        for l in range(L):
            item = {f"events{k}": torch.from_numpy(seq["events"][:, l, k])
                    for k in range(K)}
            item["image"] = torch.from_numpy(seq["image"][:, l])
            preds, supers, lstm = tm(item, prev_supers, prev_lstm)
            prev_supers, prev_lstm = supers["image"], lstm
            all_preds.append({k: v.numpy() for k, v in preds.items()})
    return all_preds


@pytest.mark.parametrize("norm", ["BN", "IN"])
def test_train_mode_norm_parity(norm):
    cfg_d = model_cfg(norm)
    tm = make_reference_model("ERGB2DepthRecurrent", cfg_d)
    cfg = Config.from_dict({"model": cfg_d, "arch": "ERGB2DepthRecurrent",
                            "trainer": {"loss_composition": cfg_d["loss_composition"]},
                            "data_loader": {"train": {"every_x_rgb_frame": K,
                                                      "baseline": False}}})
    # seed nontrivial running stats so the momentum blend is exercised
    import torch
    with torch.no_grad():
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(0.05 * torch.randn_like(buf))
            elif name.endswith("running_var"):
                buf.mul_(1.0 + 0.1 * torch.rand_like(buf))
    params = state_dict_to_params(tm.state_dict())

    rng = np.random.RandomState(0)
    seq = {"events": rng.randn(B, L, K, 5, H, W).astype(np.float32),
           "image": rng.rand(B, L, 1, H, W).astype(np.float32)}

    ref_preds = run_reference_train(tm, seq)

    # ours: channel-last layout, one scan over the window in training mode
    seq_j = {"events": jnp.asarray(np.transpose(seq["events"], (0, 1, 2, 4, 5, 3))),
             "image": jnp.asarray(np.transpose(seq["image"], (0, 1, 3, 4, 2)))}
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, B, H, W)
    stats0 = extract_norm_stats(params)
    assert stats0, "config with norm must create tracked stats"
    _, preds, stats1 = ERGB2DepthRecurrent.forward_sequence(
        params, cfg.model, state0, seq_j, norm_stats=stats0)

    for l in range(L):
        for key, ref in ref_preds[l].items():
            ours = np.moveaxis(np.asarray(preds[key][l]), -1, 1)
            np.testing.assert_allclose(ours, ref, atol=2e-5,
                                       err_msg=f"pred {key} step {l}")

    # updated running stats must match the torch buffers after L calls
    params1 = merge_norm_stats(params, stats1)
    ref_sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    checked = 0
    for name, ref_v in ref_sd.items():
        if not (name.endswith("running_mean") or name.endswith("running_var")):
            continue
        node = params1
        for part in name.split(".")[1:]:  # strip arch prefix
            node = node[int(part)] if part.isdigit() else node[part]
        np.testing.assert_allclose(np.asarray(node), ref_v, atol=1e-5,
                                   err_msg=name)
        checked += 1
    assert checked >= 8


@pytest.mark.parametrize("norm", ["BN", "IN"])
def test_train_step_with_norm_updates_stats(norm):
    """One optimizer step with norm configured: loss finite, running stats
    actually move, eval afterwards uses the new stats."""
    from rpg_ramnet_tpu.train.optim import make_optimizer
    from rpg_ramnet_tpu.train.train_step import make_train_step
    cfg_d = {
        "arch": "ERGB2DepthRecurrent", "use_phased_arch": False,
        "data_loader": {"train": {"every_x_rgb_frame": K, "baseline": False,
                                  "clip_distance": 80.0, "reg_factor": 3.70378},
                        "batch_size": B},
        "optimizer_type": "Adam", "optimizer": {"lr": 1e-3, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "grad_loss": {"weight": 0.25},
        "trainer": {"epochs": 1, "sequence_length": L,
                    "loss_composition": ["image", f"events{K-1}"],
                    "loss_weights": [1, 1]},
        "model": dict(model_cfg(norm)),
    }
    cfg = Config.from_dict(cfg_d)
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, donate=False)

    rng = np.random.RandomState(1)
    batch = {"events": jnp.asarray(rng.randn(B, L, K, H, W, 5).astype(np.float32)),
             "image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32)),
             "depth_events": jnp.asarray(rng.rand(B, L, K, H, W, 1).astype(np.float32)),
             "depth_image": jnp.asarray(rng.rand(B, L, H, W, 1).astype(np.float32))}
    stats0 = extract_norm_stats(params)
    new_params, opt_state, aux = step(params, opt_state, batch)
    assert np.isfinite(float(aux["loss"]))
    assert "norm_stats" not in aux  # buffers are merged, not logged
    stats1 = extract_norm_stats(new_params)
    moved = sum(
        float(np.abs(np.asarray(stats1[p]["running_mean"]) -
                     np.asarray(stats0[p]["running_mean"])).max()) > 1e-7
        for p in stats0)
    assert moved >= len(stats0) // 2, f"only {moved}/{len(stats0)} stats moved"
