"""bfloat16 compute-path tests: numerics close to f32; training step stays
finite with f32 params + bf16 activations (mixed precision)."""
import numpy as np

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import Config, ModelConfig
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.train.optim import make_optimizer
from rpg_ramnet_tpu.train.train_step import make_train_step

from test_train import tiny_config, make_batch


def _cfg_with_dtype(dtype):
    cfg = tiny_config()
    raw = dict(cfg.raw)
    raw["model"] = {**raw["model"], "compute_dtype": dtype}
    return Config.from_dict(raw)


def test_bf16_forward_close_to_f32():
    cfg32 = _cfg_with_dtype("float32")
    cfg16 = _cfg_with_dtype("bfloat16")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg32.model)
    rng = np.random.RandomState(0)
    B, H, W, K = 2, 16, 16, cfg32.model.every_x_rgb_frame
    pkg = {"events": jnp.asarray(rng.randn(B, K, H, W, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32))}

    s32 = ERGB2DepthRecurrent.init_state(cfg32.model, B, H, W)
    s16 = ERGB2DepthRecurrent.init_state(cfg16.model, B, H, W)
    assert s16.super_states[0].dtype == jnp.bfloat16
    _, p32 = ERGB2DepthRecurrent.forward_package(params, cfg32.model, s32, pkg)
    _, p16 = ERGB2DepthRecurrent.forward_package(params, cfg16.model, s16, pkg)
    for k in p32:
        assert p16[k].dtype == jnp.float32  # predictions stay f32
        # sigmoid outputs in [0,1]; bf16 has ~3 decimal digits
        np.testing.assert_allclose(np.asarray(p16[k]), np.asarray(p32[k]),
                                   atol=2e-2)


def test_bf16_train_step_finite():
    cfg = _cfg_with_dtype("bfloat16")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, donate=False)
    batch = make_batch(cfg, seed=3)
    first = None
    for _ in range(8):
        params, opt_state, aux = step(params, opt_state, batch)
        if first is None:
            first = float(aux["loss"])
        assert np.isfinite(float(aux["loss"]))
    # params remain f32 master copies
    assert jax.tree_util.tree_leaves(params)[0].dtype == jnp.float32
    assert float(aux["loss"]) < first
