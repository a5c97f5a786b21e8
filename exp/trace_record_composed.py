"""Profiler trace of the round-3 RECORD program: chunked bf16
single-stream with precompute + fused VJP GRU cells + the composed
transposed-conv decoder (937.9 maps/s).  The composed decoder removed
the hi-res upsample intermediates, so the residual 'data formatting'
tax has a new shape — this trace says where the remaining time goes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np

from trace_chunked import summarize


def capture(trace_dir):
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    # exactly bench.bench_chunked_fps(lanes=1, L=16, dtype='bfloat16',
    # precompute=True) — the headline/record configuration (composed
    # decoder auto-enables: TPU + bf16 + decode batch 96)
    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16"})
    L, H, W = 16, 256, 512
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, 5, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32))}
    fwd = jax.jit(lambda p, s, q:
                  ERGB2DepthRecurrent.forward_sequence_precomputed(
                      p, mcfg, s, q))
    st, preds = fwd(params, state0, seq)  # compile outside trace
    jax.block_until_ready(preds)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            st, preds = fwd(params, st, seq)
        jax.block_until_ready(preds)
    return L


def main():
    trace_dir = "/tmp/record_composed_trace"
    L = capture(trace_dir)
    summarize(trace_dir, L)


if __name__ == "__main__":
    main()
