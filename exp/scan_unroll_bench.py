"""lax.scan unroll sweep on the record path (chunked bf16 precompute,
L=16): the round-3 trace charges ~0.56 ms/pkg to while-loop bookkeeping
around 1.07 ms of fused-cell custom-calls; unrolled bodies give the
snapshot dynamic-update-slices static offsets and let XLA fuse the glue."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
from bench import bench_chunked_fps

out = {}
for u in (1, 4, 16):
    try:
        fps = bench_chunked_fps(lanes=1, L=16, dtype="bfloat16",
                                precompute=True, scan_unroll=u)
        out[f"unroll{u}"] = round(fps, 1)
    except Exception as e:  # noqa: BLE001
        out[f"unroll{u}"] = {"error": str(e)[:200]}
    print(json.dumps(out), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "scan_unroll_bench.json"), "w") as f:
    json.dump(out, f, indent=1)
