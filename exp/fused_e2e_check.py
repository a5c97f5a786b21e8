"""Hardware check: forward_sequence_precomputed with the fused Pallas GRU
cell vs fused_gru='off', full chunked program at flagship shapes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.core.config import ModelConfig
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent as M


def main():
    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16"})
    off = dataclasses.replace(mcfg, fused_gru="off")
    L, H, W = 4, 256, 512
    params = M.init_params(jax.random.PRNGKey(0), mcfg)
    st0 = M.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, 5, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32))}
    _, p_fused = jax.jit(lambda: M.forward_sequence_precomputed(
        params, mcfg, st0, seq))()
    _, p_plain = jax.jit(lambda: M.forward_sequence_precomputed(
        params, off, st0, seq))()
    for k in p_plain:
        d = float(jnp.max(jnp.abs(p_fused[k].astype(jnp.float32)
                                  - p_plain[k].astype(jnp.float32))))
        print(k, "max diff", d)
        assert d < 0.05, (k, d)  # bf16-eps scale drift over 6 gated steps
    print("OK")


if __name__ == "__main__":
    main()
