"""GRADIENT parity vs the reference: one TBPTT window (L=2 packages,
carried state) through BOTH implementations with the same SI loss; every
parameter gradient must agree.  This is the training-side analog of the
forward parity tests — it pins backward correctness of the scan, the
ConvGRU/conv transposes, and the loss scaling in one shot.

Reference loss semantics mirrored: per supervised key, sum of per-step
scale_invariant_loss over the window / L (trainer/lstm_trainer.py:152-226
without the aliasing bug; legacy scaling off, no grad loss)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.train.sequence_loss import make_sequence_loss
from rpg_ramnet_tpu.compat.torch_import import state_dict_to_params
from reference_loader import make_reference_model

B, L, K, H, W = 2, 2, 2, 16, 16


def cfg_dict():
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
                                  "clip_distance": 80.0, "reg_factor": 3.70378},
                        "batch_size": B},
        "optimizer_type": "Adam", "optimizer": {"lr": 3e-4, "weight_decay": 0},
        "loss": {"type": "scale_invariant_loss",
                 "config": {"weight": 1.0, "n_lambda": 1.0}},
        "trainer": {"epochs": 1, "sequence_length": L,
                    "loss_composition": ["image", f"events{K-1}"],
                    "loss_weights": [1, 1]},
        "model": model,
    }


def test_full_window_gradient_parity():
    import torch
    import sys
    sys.path.insert(0, "tests")
    import ref_shims
    ref_shims.install_all()  # kornia shim so model.loss imports
    from model.loss import scale_invariant_loss as ref_si

    cfgd = cfg_dict()
    tm = make_reference_model("ERGB2DepthRecurrent", cfgd["model"])
    tm.train()  # grads; norm='none' so semantics equal eval
    params = state_dict_to_params(tm.state_dict())
    cfg = Config.from_dict(cfgd)

    rng = np.random.RandomState(0)
    seq_ev = rng.randn(B, L, K, 5, H, W).astype(np.float32)
    seq_im = rng.rand(B, L, 1, H, W).astype(np.float32)
    tgt_ev = rng.rand(B, L, K, 1, H, W).astype(np.float32)
    tgt_im = rng.rand(B, L, 1, H, W).astype(np.float32)

    # ---- torch: python loop over packages, one backward -------------------
    tm.zero_grad()
    prev_supers, prev_lstm = None, {f"events{k}": None for k in range(K)}
    prev_lstm["image"] = None
    total = 0.0
    for l in range(L):
        item = {f"events{k}": torch.from_numpy(seq_ev[:, l, k]) for k in range(K)}
        item["image"] = torch.from_numpy(seq_im[:, l])
        preds, supers, prev_lstm = tm(item, prev_supers, prev_lstm)
        prev_supers = supers["image"]
        for key, tgt in (("image", tgt_im[:, l]),
                         (f"events{K-1}", tgt_ev[:, l, K - 1])):
            total = total + ref_si(preds[key], torch.from_numpy(tgt),
                                   weight=1.0, n_lambda=1.0)
    (total / L).backward()
    ref_grads = {n: p.grad.detach().numpy() for n, p in tm.named_parameters()
                 if p.grad is not None}

    # ---- ours: scan + jax.grad --------------------------------------------
    batch = {
        "events": jnp.asarray(np.transpose(seq_ev, (0, 1, 2, 4, 5, 3))),
        "image": jnp.asarray(np.transpose(seq_im, (0, 1, 3, 4, 2))),
        "depth_events": jnp.asarray(np.transpose(tgt_ev, (0, 1, 2, 4, 5, 3))),
        "depth_image": jnp.asarray(np.transpose(tgt_im, (0, 1, 3, 4, 2))),
    }
    loss_fn = make_sequence_loss(cfg)
    state0 = ERGB2DepthRecurrent.init_state(cfg.model, B, H, W)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, state0, batch)
    np.testing.assert_allclose(float(loss), float(total.detach()) / L,
                               rtol=1e-5)

    # ---- compare every parameter gradient ---------------------------------
    from rpg_ramnet_tpu.compat.torch_import import params_to_state_dict
    ours_sd = params_to_state_dict(grads)
    assert len(ref_grads) >= 20
    for name, g_ref in ref_grads.items():
        g_ours = np.asarray(ours_sd[name])
        scale = max(np.abs(g_ref).max(), 1e-8)
        # pred.conv2d.bias is a single scalar whose gradient is a
        # near-cancelling sum (the SI loss is nearly shift-invariant), so
        # its relative error is catastrophic-cancellation-dominated
        # (measured: 7e-3 there, <=4e-5 for every other parameter)
        tol = 2e-2 if name.endswith("pred.conv2d.bias") else 2e-4
        np.testing.assert_allclose(g_ours / scale, g_ref / scale,
                                   atol=tol, err_msg=name)
