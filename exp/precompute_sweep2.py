"""Second sweep: wide-lane shallow-chunk bf16 precompute points."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}
    for lanes, L in ((16, 2), (16, 4), (32, 1), (32, 2)):
        key = f"bf16_pre_lanes{lanes}_L{L}"
        try:
            fps = bench.bench_chunked_fps(lanes=lanes, L=L, dtype="bfloat16",
                                          precompute=True)
        except Exception as e:  # noqa: BLE001 - record and continue the sweep
            out[key] = f"error: {str(e)[:160]}"
            print(key, "ERROR", str(e)[:160], flush=True)
            continue
        out[key] = fps
        print(key, round(fps, 1), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
