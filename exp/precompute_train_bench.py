"""Training throughput with trainer.precompute_x (package-scoped x-side
batching inside the remat'd deferred-decode scan) vs without."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    out = {}
    for dtype, B, pre in (("bfloat16", 16, True), ("float32", 8, True)):
        key = f"{dtype}_B{B}_{'pre' if pre else 'base'}"
        try:
            r = bench.bench_train_step(B=B, dtype=dtype, deferred_decode=True,
                                       precompute_x=pre)
        except Exception as e:  # noqa: BLE001 - record and continue
            out[key] = f"error: {str(e)[:200]}"
            print(key, "ERROR", str(e)[:200], flush=True)
            continue
        out[key] = r if isinstance(r, (int, float)) else r
        print(key, r, flush=True)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
