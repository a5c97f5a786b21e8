"""Multi-step TRAINING-TRAJECTORY parity vs the reference (round-3 verdict
item 4): same init, same data, N=10 Adam steps in both frameworks at tiny
scale — per-step losses must track and final params stay close, with
legacy_loss_scaling both off AND on, crossing LR-schedule boundaries.

Reference semantics being replicated per step:
* TBPTT window loss: per supervised key, sum of per-step SI losses over the
  window / L (trainer/lstm_trainer.py:152-226); `legacy` multiplies by
  num_keys (the reference's loss-dict aliasing, lstm_trainer.py:253,281).
* Adam(lr, defaults) on the summed loss (base_trainer.py:36-43).
* ExponentialLR stepped every lr_scheduler_freq "epochs"
  (base_trainer.py:119-121) — here 1 epoch == 2 optimizer steps, so the
  10-step run crosses 5 LR boundaries (lr halves each time).

One first-order check (single-window gradient parity) lives in
test_grad_parity.py; this test pins the ACCUMULATED behavior: optimizer
moments, LR schedule application, and loss composition over a real
multi-step run.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
from rpg_ramnet_tpu.train.optim import (make_optimizer, lr_at_epoch,
                                        set_learning_rate)
from rpg_ramnet_tpu.compat.torch_import import (state_dict_to_params,
                                                params_to_state_dict)
from reference_loader import make_reference_model

B, L, K, H, W = 2, 2, 2, 16, 16
N_STEPS = 10
STEPS_PER_EPOCH = 2


def cfg_dict(legacy):
    model = dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
                 state_combination="convgru", num_encoders=2,
                 base_num_channels=4, num_residual_blocks=1,
                 recurrent_block_type="conv", norm="none",
                 use_upsample_conv=True, every_x_rgb_frame=K, baseline=False,
                 loss_composition=["image", f"events{K-1}"], gpu=0,
                 spatial_resolution=[H, W], use_phased_arch=False)
    return {
        "arch": "ERGB2DepthRecurrent", "use_phased_arch": False,
        "data_loader": {"train": {"every_x_rgb_frame": K, "baseline": False,
                                  "clip_distance": 80.0,
                                  "reg_factor": 3.70378},
                        "batch_size": B},
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4,
                                                "weight_decay": 0},
        "lr_scheduler_type": "ExponentialLR", "lr_scheduler_freq": 1,
        "lr_scheduler": {"gamma": 0.5},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "trainer": {"epochs": 1, "sequence_length": L,
                    "loss_composition": ["image", f"events{K-1}"],
                    "loss_weights": [1, 1],
                    "legacy_loss_scaling": legacy},
        "model": model,
    }


def make_batches(n):
    rng = np.random.RandomState(42)
    out = []
    for _ in range(n):
        out.append({
            "ev": rng.randn(B, L, K, 5, H, W).astype(np.float32),
            "im": rng.rand(B, L, 1, H, W).astype(np.float32),
            "tev": rng.rand(B, L, K, 1, H, W).astype(np.float32),
            "tim": rng.rand(B, L, 1, H, W).astype(np.float32),
        })
    return out


def torch_trajectory(cfgd, batches, legacy):
    import sys
    import torch
    sys.path.insert(0, "tests")
    import ref_shims
    ref_shims.install_all()
    from model.loss import scale_invariant_loss as ref_si

    tm = make_reference_model("ERGB2DepthRecurrent", cfgd["model"])
    tm.train()
    sd0 = {k: v.clone() for k, v in tm.state_dict().items()}
    opt = torch.optim.Adam(tm.parameters(), lr=3e-4, weight_decay=0)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.5)
    num_keys = 2
    losses = []
    for step, b in enumerate(batches):
        opt.zero_grad()
        prev_supers = None
        prev_lstm = {f"events{k}": None for k in range(K)}
        prev_lstm["image"] = None
        total = 0.0
        for l in range(L):
            item = {f"events{k}": torch.from_numpy(b["ev"][:, l, k])
                    for k in range(K)}
            item["image"] = torch.from_numpy(b["im"][:, l])
            preds, supers, prev_lstm = tm(item, prev_supers, prev_lstm)
            prev_supers = supers["image"]
            for key, tgt in (("image", b["tim"][:, l]),
                             (f"events{K-1}", b["tev"][:, l, K - 1])):
                total = total + ref_si(preds[key], torch.from_numpy(tgt),
                                       weight=1.0, n_lambda=1.0)
        loss = total / L
        if legacy:
            # the reference's loss-dict aliasing makes its effective total
            # num_keys x (sum over keys) (lstm_trainer.py:253,281)
            loss = loss * num_keys
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        # base_trainer.py:119-121: scheduler stepped per epoch
        if (step + 1) % STEPS_PER_EPOCH == 0:
            sched.step()
    final = {n: p.detach().numpy().copy()
             for n, p in tm.state_dict().items()}
    return sd0, losses, final


@pytest.mark.slow
@pytest.mark.parametrize("legacy", [False, True])
def test_training_trajectory_matches_reference(legacy):
    cfgd = cfg_dict(legacy)
    batches = make_batches(N_STEPS)
    sd0, ref_losses, ref_final = torch_trajectory(cfgd, batches, legacy)

    cfg = Config.from_dict(cfgd)
    params = state_dict_to_params(sd0)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    loss_fn = make_sequence_loss(cfg)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, B, H, W)

    import optax

    @jax.jit
    def step_fn(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state0, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    epoch = 0
    for step, b in enumerate(batches):
        batch = {
            "events": jnp.asarray(np.transpose(b["ev"], (0, 1, 2, 4, 5, 3))),
            "image": jnp.asarray(np.transpose(b["im"], (0, 1, 3, 4, 2))),
            "depth_events": jnp.asarray(
                np.transpose(b["tev"], (0, 1, 2, 4, 5, 3))),
            "depth_image": jnp.asarray(np.transpose(b["tim"], (0, 1, 3, 4, 2))),
        }
        params, opt_state, loss = step_fn(params, opt_state, batch)
        our_losses.append(float(loss))
        if (step + 1) % STEPS_PER_EPOCH == 0:
            epoch += 1
            set_learning_rate(opt_state, lr_at_epoch(cfg, epoch))

    # per-step losses track (the loss at step t reflects ALL accumulated
    # divergence from steps < t: optimizer moments + LR schedule + updates)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4,
                               err_msg=f"legacy={legacy}\nours={our_losses}"
                                       f"\nref={ref_losses}")
    # the LR schedule really moved: 5 epoch boundaries crossed in 10 steps
    assert abs(float(opt_state.hyperparams["learning_rate"])
               - 3e-4 * 0.5 ** 5) < 1e-12

    # final parameters stay close after 10 updates
    ours_sd = params_to_state_dict(params)
    for name, p_ref in ref_final.items():
        if "running_" in name or "num_batches" in name:
            continue
        p_ours = np.asarray(ours_sd[name])
        scale = max(np.abs(p_ref).max(), 1e-8)
        np.testing.assert_allclose(p_ours / scale, p_ref / scale,
                                   atol=5e-4, err_msg=name)
