"""Round-3 verdict item 6: lanes x chunk x precompute(+fused kernels)
sweep at small lane counts — the round-2 record mechanisms (precompute +
fused cells, now + fused decoder) never composed with lanes because wide
configs exceeded the remote compile helper's memory.  Sweep the small
corner; record wins or the envelope."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

points = [(1, 24), (1, 32), (2, 8), (4, 4), (4, 2), (8, 2), (2, 4)]
out = {}
for lanes, L in points:
    key = f"bf16_pre_fused_lanes{lanes}_L{L}"
    try:
        out[key] = round(bench.bench_chunked_fps(
            lanes=lanes, L=L, dtype="bfloat16", precompute=True), 1)
    except Exception as e:
        out[key] = f"ERROR {str(e)[:200]}"
    print(json.dumps({key: out[key]}), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "lanes_fused_sweep.json"), "w") as f:
    json.dump(out, f, indent=1)
