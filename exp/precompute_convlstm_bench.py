"""bf16 chunked streaming for the convlstm state-combination variant:
baseline batched decode vs x-side precompute (validates the bf16
auto-enable extends to this config)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np


def bench_variant(precompute, L=16, H=256, W=512):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from bench import _per_iter_seconds

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16"})
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, K, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32))}

    @jax.jit
    def run_n(params, state, seq, n):
        def body(i, carry):
            st, acc = carry
            eps = (i + 1).astype(jnp.float32) * 1e-9
            seq_i = {k: v + eps for k, v in seq.items()}
            if precompute:
                st, preds = ERGB2DepthRecurrent.forward_sequence_precomputed(
                    params, mcfg, st, seq_i)
            else:
                st, preds = \
                    ERGB2DepthRecurrent.forward_sequence_batched_decode(
                        params, mcfg, st, seq_i)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                         for s in jax.tree_util.tree_leaves(st))

    sec = _per_iter_seconds(run_n, (params, state0, seq, 1),
                            (params, state0, seq, 4), 1, 4)
    return L * (K + 1) / sec


def main():
    out = {}
    for pre in (False, True):
        key = f"convlstm_bf16_{'pre' if pre else 'base'}"
        out[key] = bench_variant(pre)
        print(key, round(out[key], 1), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
