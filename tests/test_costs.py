"""Analytic FLOP/byte accounting (utils/costs.py): cross-check against
XLA's own cost model for the flagship model, and basic invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import ModelConfig
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.utils import costs as C


def mcfg(**over):
    d = {"num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
         "recurrent_block_type": "conv", "state_combination": "convgru",
         "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
         "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
         "baseline": False}
    d.update(over)
    return ModelConfig.from_dict(d)


def test_device_peaks_known_kinds():
    assert C.device_peaks("TPU v5 lite")[0] == pytest.approx(197e12)
    assert C.device_peaks("TPU v4")[1] == pytest.approx(1228e9)
    # unknown kind falls back to v5e
    assert C.device_peaks("TPU v99")[0] == pytest.approx(197e12)


def test_package_costs_scaling_invariants():
    cfg = mcfg()
    base = C.package_costs(cfg, 128, 128, batch=1)
    assert base.flops > 0 and base.bytes_min > 0
    # FLOPs and activation bytes scale linearly with batch and area
    b2 = C.package_costs(cfg, 128, 128, batch=2)
    assert b2.flops == pytest.approx(2 * base.flops)
    a2 = C.package_costs(cfg, 256, 128, batch=1)
    assert a2.flops == pytest.approx(2 * base.flops, rel=1e-6)
    # bf16 activations halve the byte estimate, not the FLOPs
    h = C.package_costs(cfg, 128, 128, batch=1, act_bytes=2)
    assert h.flops == base.flops
    assert h.bytes_min < base.bytes_min


def test_analytic_matches_xla_cost_model():
    """The whole point of the analytic model: agree with the compiler's
    count for the real program (within a few %)."""
    cfg = mcfg()
    H = W = 64
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg)
    st = ERGB2DepthRecurrent.init_state(cfg, 1, H, W)
    rng = np.random.RandomState(0)
    pkg = {"events": jnp.asarray(rng.randn(1, 5, H, W, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(1, H, W, 1).astype(np.float32))}
    step = jax.jit(lambda p, s, k: ERGB2DepthRecurrent.forward_package(p, cfg, s, k))
    comp = C.compiled_costs(step, params, st, pkg)
    if not comp.get("flops"):
        pytest.skip("backend exposes no cost analysis")
    ana = C.package_costs(cfg, H, W, 1)
    assert ana.flops == pytest.approx(comp["flops"], rel=0.10)


def test_train_window_costs():
    cfg = mcfg()
    one = C.package_costs(cfg, 64, 64, batch=2, decodes=2)
    win = C.train_window_costs(cfg, 64, 64, batch=2, L=4, remat=True)
    # fwd + bwd(2x) + remat fwd = 4x per package, L packages
    assert win.flops == pytest.approx(4 * 4 * one.flops)
    no_remat = C.train_window_costs(cfg, 64, 64, batch=2, L=4, remat=False)
    assert no_remat.flops == pytest.approx(3 * 4 * one.flops)
