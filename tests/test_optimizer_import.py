"""Cross-framework optimizer-state import: resume a torch-Adam training run
inside this framework and take a bit-matching next step.

Protocol: train the REFERENCE torch model 2 steps with torch Adam, export a
reference-style checkpoint ({state_dict, optimizer}); import params +
optimizer moments here; compute the step-3 gradient in torch, convert it,
apply the optax update — the resulting parameters must match torch's step-3
parameters (same Adam math, bias correction continued at the right count).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config
from rpg_ramnet_tpu.compat import state_dict_to_params
from rpg_ramnet_tpu.compat.torch_import import (import_torch_optimizer_state,
                                                ordered_param_names)
from rpg_ramnet_tpu.train.optim import make_optimizer, set_learning_rate

from reference_loader import make_reference_model

LR = 1e-3


def _torch_grads(tm, item, prev_lstm):
    tm.zero_grad()
    preds, supers, lstm = tm(item, None, prev_lstm)
    loss = sum(p.pow(2).mean() for p in preds.values())
    loss.backward()
    return {n: p.grad.detach().clone() for n, p in tm.named_parameters()}


def test_torch_adam_state_import_continues_bitwise():
    cfg_d = dict(num_bins_rgb=1, num_bins_events=5, skip_type="sum",
                 state_combination="convgru", num_encoders=2, base_num_channels=4,
                 num_residual_blocks=1, recurrent_block_type="conv", norm="none",
                 use_upsample_conv=True, every_x_rgb_frame=2, baseline=False,
                 loss_composition=["image", "events1"], gpu=0,
                 spatial_resolution=[16, 16], use_phased_arch=False)
    tm = make_reference_model("ERGB2DepthRecurrent", cfg_d)
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=0)

    rng = np.random.RandomState(0)
    item = {f"events{k}": torch.from_numpy(rng.randn(1, 5, 16, 16).astype(np.float32))
            for k in range(2)}
    item["image"] = torch.from_numpy(rng.rand(1, 1, 16, 16).astype(np.float32))
    prev_lstm = {f"events{k}": None for k in range(2)}
    prev_lstm["image"] = None

    # two torch training steps
    for _ in range(2):
        grads = _torch_grads(tm, item, prev_lstm)
        opt.step()
    import copy
    # deep-copy: torch state_dict()s alias live tensors (a real torch.load
    # of a reference checkpoint yields fresh tensors, no aliasing)
    ckpt = {"state_dict": {k: v.detach().clone() for k, v in tm.state_dict().items()},
            "optimizer": copy.deepcopy(opt.state_dict())}

    # torch step 3
    grads3 = _torch_grads(tm, item, prev_lstm)
    opt.step()
    torch_params_after = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # --- import into our framework at the post-step-2 point
    cfg = Config.from_dict({
        "arch": "ERGB2DepthRecurrent", "use_phased_arch": False,
        "optimizer_type": "Adam", "optimizer": {"lr": LR, "weight_decay": 0},
        "data_loader": {"train": {"every_x_rgb_frame": 2, "baseline": False}},
        "trainer": {"loss_composition": ["image", "events1"]},
        "model": cfg_d})
    params = state_dict_to_params(ckpt["state_dict"])
    params = jax.tree_util.tree_map(jnp.asarray, params)
    optimizer = make_optimizer(cfg)
    opt_state = import_torch_optimizer_state(ckpt, params, optimizer)
    opt_state = set_learning_rate(opt_state, LR)

    # convert torch's step-3 gradient and take the optax step
    our_grads = jax.tree_util.tree_map(
        jnp.asarray, state_dict_to_params(grads3))
    import optax
    updates, _ = optimizer.update(our_grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    from rpg_ramnet_tpu.compat import params_to_state_dict
    ours_after = params_to_state_dict(jax.device_get(new_params))
    for name in ordered_param_names(ckpt["state_dict"]):
        np.testing.assert_allclose(
            ours_after[name], torch_params_after[name],
            atol=1e-6, rtol=1e-5, err_msg=name)
