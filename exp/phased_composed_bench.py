"""Round-5: composed-decoder opt-in for the PHASED chunked path.

The phased trace (exp/trace_phased_chunked.py) shows the 551.2 maps/s
program decodes its 48-snapshot batch through the two-stage decoder —
exactly the batch shape where the composed transposed-conv formulation
won +16% on the flagship — and pays 2.8 ms/pkg (26%) of data formatting
vs the flagship's 10.5%.  The phased chunked bench never opted in because
forward_sequence_batched_decode is a bit-identical-contract engine;
composed is an explicit opt-in there (like the lane engines).

A/B in one process (bf16, 256x352, L=8 — the measured-best config):
  off — control (should reproduce ~551)
  on  — composed decoder via composed_decoder='on'
Flip rule: in-process legs resolve ~0.4%; adopt 'on' as the recorded
BASELINE-config-3 throughput point if it wins >2%.
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
for mode in ("off", "on"):
    try:
        fps = bench_phased_chunked_fps(dtype="bfloat16",
                                       composed_decoder=("auto" if mode ==
                                                         "off" else "on"))
        out[f"composed_{mode}"] = round(fps, 1)
    except Exception as e:
        out[f"composed_{mode}"] = "FAIL: " + str(e)[:200]
        with open(os.path.join(HERE, "phased_composed_errors.txt"), "a") as f:
            f.write(f"===== {mode} =====\n{traceback.format_exc()}\n")
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "phased_composed_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
