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

import bench


def bench_seq_batched_decode(dtype="float32", lanes=1, L=16, n_lo=1, n_hi=4):
    """Thin wrapper over bench.bench_chunked_fps (the single source of
    truth for this benchmark — model config, perturbed fori_loop timing,
    prediction consumption all live there)."""
    return bench.bench_chunked_fps(lanes=lanes, L=L, n_lo=n_lo, n_hi=n_hi,
                                   dtype=dtype)


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
