"""A/B of the GRU h-side kernel v1 (neighbor-block re-reads) vs v2 (halo
side-arrays) on the record path: bench_chunked_fps(lanes=1, L=16, bf16,
precompute=True) — the 937.9 maps/s program.  Per-cell numbers are noisy
across processes (exp/hside_v2_probe.json vs exp/fused_cell_roofline.json);
the decision variable is e2e maps/s in ONE process."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

from rpg_ramnet_tpu.ops import gru_hside as G
from bench import bench_chunked_fps

out = {}
for v2 in (False, True):
    G._GRU_V2 = v2
    fps = bench_chunked_fps(lanes=1, L=16, dtype="bfloat16", precompute=True)
    out["v2" if v2 else "v1"] = round(fps, 1)
    print(json.dumps(out), flush=True)
with open(os.path.join(os.path.dirname(__file__), "hside_v2_e2e.json"),
          "w") as f:
    json.dump(out, f, indent=1)
