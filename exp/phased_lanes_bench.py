"""Round-5: lane-batched PHASED chunked throughput with the composed
decoder (the +10.4% round-5 leg).  MVSEC evaluation runs a handful of
recorded sequences — lane-batching them through the chunked engine is the
offline aggregate-throughput mode (test.py --lanes N --scan_chunk M works
for the phased arch; tests/test_batched_streaming.py covers parity).
Never measured on silicon.  Input HBM bounds the lane count at L=8
(events_tcf is [L,lanes,5,5,256,352] f32), so higher-lane legs shorten L.

Legs (bf16, 256x352, composed on):
  l1_L8  — control (the 609.8 point)
  l2_L8  — 2 lanes
  l4_L4  — 4 lanes, halved chunk (same packages/launch)
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
legs = (("l1_L8", dict(lanes=1, L=8)),
        ("l2_L8", dict(lanes=2, L=8)),
        ("l4_L4", dict(lanes=4, L=4)))
for name, kw in legs:
    try:
        fps = bench_phased_chunked_fps(dtype="bfloat16",
                                       composed_decoder="on", **kw)
        out[name] = round(fps, 1)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:200]
        with open(os.path.join(HERE, "phased_lanes_errors.txt"), "a") as f:
            f.write(f"===== {name} =====\n{traceback.format_exc()}\n")
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "phased_lanes_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
