"""Profiler trace of the PHASED (MVSEC / BASELINE config-3) chunked
program — the 551.2 maps/s round-5 measurement (bf16, 256x352, L=8,
deferred decode, fused_gru off = the measured best).  The phased regime
has never been profiled; the flagship's levers (x-side precompute,
composed-decoder batch) partly don't port (state-dependent encoder
chain), so this trace says where ITS time actually goes before guessing
at the next lever."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402

from trace_chunked import summarize  # noqa: E402


def capture(trace_dir):
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    # exactly bench.bench_phased_chunked_fps(dtype='bfloat16') — the
    # measured 551.2 maps/s configuration
    H, W, L, K = 256, 352, 8, 5
    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16",
        "use_phased_arch": True, "spatial_resolution": [H, W]})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    t_all = np.cumsum(rng.uniform(0.001, 0.01, (L, 1, K + 1)),
                      axis=None).reshape(L, 1, K + 1).astype(np.float32)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, K, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32)),
           "times_events_t": jnp.asarray(t_all[:, :, :K]),
           "times_image_t": jnp.asarray(t_all[:, :, K])}
    fwd = jax.jit(lambda p, s, q:
                  ERGB2DepthRecurrent.forward_sequence_batched_decode(
                      p, mcfg, s, q, allow_fused_decoder=True))
    st, preds = fwd(params, state0, seq)  # compile outside trace
    jax.block_until_ready(preds)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            st, preds = fwd(params, st, seq)
        jax.block_until_ready(preds)
    return L


def main():
    trace_dir = "/tmp/phased_chunked_trace"
    L = capture(trace_dir)
    summarize(trace_dir, L)


if __name__ == "__main__":
    main()
