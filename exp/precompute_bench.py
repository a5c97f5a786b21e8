"""Measure forward_sequence_precomputed (x-side work hoisted out of the
scan) vs forward_sequence_batched_decode on the real TPU."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}
    for dtype in ("float32", "bfloat16"):
        for pre in (False, True):
            key = f"{dtype}_{'pre' if pre else 'base'}"
            fps = bench.bench_chunked_fps(dtype=dtype, precompute=pre)
            out[key] = fps
            print(key, round(fps, 1), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
