"""Round-5 follow-up to exp/phased_lanes_bench.py (l1 611.8 / l2 712.9 /
l4_L4 696.6): is 712.9 actually the knee?  Two neighbours of the l2_L8
record never measured:
  l2_L16 — same 2 lanes, deeper chunk (the flagship headline uses L=16;
           deeper chunks amortize while-loop glue; input grows to
           ~864 MB f32, fine)
  l3_L8  — 3 lanes at full chunk depth (l4 needed L=4 to fit; 3 lanes'
           input package is ~432 MB — the OOM tenant at l4_L8 was the
           snapshot/decode batch, so this may fit)
Control l2_L8 re-run in the same process (the <10% single-process rule).
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

from bench import bench_phased_chunked_fps  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
out = {}
legs = (("l2_L8_control", dict(lanes=2, L=8)),
        ("l2_L16", dict(lanes=2, L=16)),
        ("l3_L8", dict(lanes=3, L=8)))
for name, kw in legs:
    try:
        fps = bench_phased_chunked_fps(dtype="bfloat16",
                                       composed_decoder="on", **kw)
        out[name] = round(fps, 1)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:200]
        with open(os.path.join(HERE, "phased_lanes2_errors.txt"), "a") as f:
            f.write(f"===== {name} =====\n{traceback.format_exc()}\n")
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "phased_lanes2_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
