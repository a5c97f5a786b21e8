"""Lanes x chunk (base batched decode, no precompute) — the compute behind
test.py --lanes N --scan_chunk M."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}
    for lanes, L in ((8, 4), (16, 2), (32, 2)):
        key = f"bf16_base_lanes{lanes}_L{L}"
        try:
            out[key] = bench.bench_chunked_fps(lanes=lanes, L=L,
                                               dtype="bfloat16")
        except Exception as e:  # noqa: BLE001 - record and continue
            out[key] = f"error: {str(e)[:160]}"
        print(key, out[key], flush=True)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
