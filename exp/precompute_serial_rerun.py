"""SERIAL reruns of the precompute winners/losers (the first measurements
overlapped on the chip; timing differencing does not fully cancel
contention).  One process, one benchmark at a time."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}

    def run(key, fn):
        try:
            out[key] = fn()
        except Exception as e:  # noqa: BLE001 - record and continue
            out[key] = f"error: {str(e)[:160]}"
        print(key, out[key], flush=True)

    # inference: the two record contenders + f32 package-scoped variant
    run("stream_bf16_pre_lanes16_L2", lambda: bench.bench_chunked_fps(
        lanes=16, L=2, dtype="bfloat16", precompute=True))
    run("stream_bf16_base_lanes32_L16pkg", lambda: bench.bench_jax_fps(
        lanes=32, dtype="bfloat16", batched_decode=True))
    run("stream_f32_pkgpre_lanes1_L16", lambda: bench.bench_chunked_fps(
        lanes=1, L=16, dtype="float32", precompute="package"))
    run("stream_bf16_pre_lanes1_L16", lambda: bench.bench_chunked_fps(
        lanes=1, L=16, dtype="bfloat16", precompute=True))
    # training: precompute_x vs base, serially
    run("train_bf16_B16_pre", lambda: bench.bench_train_step(
        B=16, dtype="bfloat16", deferred_decode=True, precompute_x=True)
        ["seq_per_sec"])
    run("train_bf16_B16_base", lambda: bench.bench_train_step(
        B=16, dtype="bfloat16", deferred_decode=True)["seq_per_sec"])
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
