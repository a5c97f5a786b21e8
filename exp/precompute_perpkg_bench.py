"""Per-package (latency mode) x-side precompute: L=1 chunked program
approximates StreamingInference's per-package batched decode."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}
    for dtype in ("bfloat16",):
        for pre in (False, "package"):
            key = f"L1_{dtype}_{'pkgpre' if pre else 'base'}"
            out[key] = bench.bench_chunked_fps(lanes=1, L=1, dtype=dtype,
                                               precompute=pre, n_lo=2,
                                               n_hi=12)
            print(key, round(out[key], 1), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
