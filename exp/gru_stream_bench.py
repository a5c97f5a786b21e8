"""A/B of the gx-STREAMING h-side cells (ops/gru_stream: scalar-prefetched
gx block indexing, no per-step operand materialization) on the record path:
bench_chunked_fps(lanes=1, L=16, bf16, precompute=True).

Expected mechanism: the per-step fused cells force XLA to materialize
~109 MB/package of gx slices as custom-call operands (3 lane-padded C=64
thirds per scale per step); the streaming cells read one 3C block per step
straight from the full-sequence buffer.  Upside bound ~the slice-write
traffic (~133 us/pkg = +2%) plus the removed operand lane padding and any
scheduling slack; measure, don't guess."""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform   # noqa: E402
ensure_platform()

from bench import bench_chunked_fps                 # noqa: E402

out = {}
for name, kw in (
        ("baseline", {}),
        ("stream", {"fused_stream": "on"}),
        ("stream_pair", {"fused_stream": "on", "fused_pair": "on"}),
):
    try:
        fps = bench_chunked_fps(lanes=1, L=16, dtype="bfloat16",
                                precompute=True, **kw)
        out[name] = round(fps, 1)
    except Exception as e:
        out[name + "_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)

with open(os.path.join(os.path.dirname(__file__), "gru_stream_bench.json"),
          "w") as f:
    json.dump(out, f, indent=1)
