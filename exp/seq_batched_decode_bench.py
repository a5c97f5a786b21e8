"""Deferred-decode (chunked) streaming throughput on the real TPU.

forward_sequence_batched_decode scans only the sequential work (encoders +
per-scale GRU state combination) over L packages, then decodes ALL
L*(K+1)*lanes super-state snapshots in ONE batch.  Outputs bit-identical
to per-package streaming (tests/test_batched_streaming.py); the decoder
(~57% of package time, narrow C_out) gets an L*(K+1)-deep batch instead
of K+1.  This is the offline mode: test.py processes recorded sequences,
so per-package latency is irrelevant.

Usage: python exp/seq_batched_decode_bench.py [dtype lanes L [n_lo n_hi]]
       (no args: run the default sweep)

Timing per PERF.md rules: N chunk-iterations inside one jit, two trip
counts differenced; inputs perturbed per iteration; predictions consumed.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np

import bench
from bench import _per_iter_seconds

H, W = 256, 512


def bench_seq_batched_decode(dtype="float32", lanes=1, L=16, n_lo=1, n_hi=4):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": dtype})
    K = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, lanes, H, W)
    rng = np.random.RandomState(0)
    # channel-first time-leading inputs: minor dims (H, W) — an NHWC
    # [L,B,K,H,W,5] sequence would be lane-padded 25x in HBM (PERF.md)
    seq = {
        "events_tcf": jnp.asarray(
            rng.randn(L, lanes, K, 5, H, W).astype(np.float32)),
        "image_tcf": jnp.asarray(
            rng.rand(L, lanes, 1, H, W).astype(np.float32)),
    }

    @jax.jit
    def run_n(params, state, seq, n):
        def body(i, carry):
            st, acc = carry
            eps = (i + 1).astype(jnp.float32) * 1e-9
            seq_i = {k: v + eps for k, v in seq.items()}
            # forward_sequence_batched_decode takes batch-leading seq keys
            # only for the plain layout; _tcf keys pass through time-leading
            st, preds = ERGB2DepthRecurrent.forward_sequence_batched_decode(
                params, mcfg, st, seq_i)
            acc = acc + sum(jnp.sum(p.astype(jnp.float32))
                            for p in preds.values())
            return (st, acc)
        st, acc = lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                         for s in jax.tree_util.tree_leaves(st))

    sec_per_chunk = _per_iter_seconds(run_n,
                                      (params, state0, seq, n_lo),
                                      (params, state0, seq, n_hi), n_lo, n_hi)
    maps_per_chunk = lanes * L * (K + 1)
    return maps_per_chunk / sec_per_chunk


def main():
    if len(sys.argv) > 1:
        dtype, lanes, L = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
        n_lo = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        n_hi = int(sys.argv[5]) if len(sys.argv) > 5 else 4
        fps = bench_seq_batched_decode(dtype, lanes, L, n_lo, n_hi)
        print(json.dumps({"config": f"{dtype}_lanes{lanes}_L{L}",
                          "maps_per_s": round(fps, 1)}), flush=True)
        return
    results = {}
    for dtype, lanes, L in (("float32", 1, 16), ("bfloat16", 1, 16),
                            ("bfloat16", 8, 8), ("bfloat16", 32, 2)):
        key = f"{dtype}_lanes{lanes}_L{L}"
        try:
            fps = bench_seq_batched_decode(dtype, lanes, L)
            results[key] = round(fps, 1)
            print(key, results[key], flush=True)
        except Exception as e:
            results[key] = f"ERROR {str(e)[:200]}"
            print(key, results[key], flush=True)
    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(__file__),
                           "seq_bd_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
