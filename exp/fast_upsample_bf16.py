"""Now that 32-lane bf16 streaming is MXU-compute-bound (99.9% of bf16 peak,
exp/lane_sweep_results.json), the subpixel decoder (model.fast_upsample,
36% fewer decoder MACs) should finally pay — it was a wash when the model
was bandwidth-bound at 1 lane (round-1 PERF.md)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    results = {}
    for fast in (False, True):
        for lanes in (8, 32):
            key = f"bf16_lanes{lanes}_fast{int(fast)}"
            fps = bench.bench_jax_fps(lanes=lanes, n_hi=4, dtype="bfloat16",
                                      fast_upsample=fast)
            results[key] = round(fps, 1)
            print(key, results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
