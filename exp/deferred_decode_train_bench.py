"""Deferred-decode TRAINING throughput on the real TPU.

trainer.deferred_decode moves the supervised decodes outside the remat'd
scan into ONE L*B*|keys| batched decoder pass: better MXU fill on the
narrow-channel decoder convs AND the decoder drops out of the backward
recompute entirely.  Gradients identical
(tests/test_train.py::test_deferred_decode_equivalence).

Usage: python exp/deferred_decode_train_bench.py [dtype B [deferred]]
       (no args: sweep fp32/bf16 x in-scan/deferred at B=8, bf16 B=16)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench


def main():
    if len(sys.argv) > 1:
        dtype, B = sys.argv[1], int(sys.argv[2])
        deferred = len(sys.argv) > 3 and sys.argv[3] == "deferred"
        r = bench.bench_train_step(B=B, dtype=dtype, deferred_decode=deferred)
        print(json.dumps({"config": f"{dtype}_B{B}"
                                    + ("_deferred" if deferred else ""),
                          "seq_per_sec": round(r["seq_per_sec"], 2)}),
              flush=True)
        return
    results = {}
    for dtype, B, deferred in (("float32", 8, True), ("bfloat16", 8, True),
                               ("bfloat16", 16, True)):
        key = f"{dtype}_B{B}" + ("_deferred" if deferred else "")
        try:
            r = bench.bench_train_step(B=B, dtype=dtype,
                                       deferred_decode=deferred)
            results[key] = {"seq_per_sec": round(r["seq_per_sec"], 2),
                            "mfu": round(r.get("mfu_vs_bf16_peak", 0), 3)
                            if "mfu_vs_bf16_peak" in r else None}
            print(key, results[key], flush=True)
        except Exception as e:
            results[key] = f"ERROR {str(e)[:200]}"
            print(key, results[key], flush=True)
    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(__file__),
                           "deferred_decode_train_results.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
