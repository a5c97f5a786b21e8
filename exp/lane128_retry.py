"""Round-5 retry of the >64-lane throughput legs with the scoped-VMEM cap
raised on the fused h-side cells.

Round-3 (exp/lanes_composed_sweep.json): 64-lane composed = 802.2 maps/s
(the lane record); 128-lane composed and every two-stage config >32 lanes
died with the helper's generic HTTP 500 ("compile-helper OOM").  Round-5
showed that error often wraps genuine scoped-VMEM overflows that
`vmem_limit_bytes` fixes (PERF.md round-5 items 5-6).  Retry:

  l64_composed   — control (old record; new cap, should reproduce ~802)
  l128_composed  — the blocked candidate: if it compiles and beats 802,
                   new lane record
  l64_twostage   — the blocked two-stage point (completes the grid)

Full errors to lane128_errors.txt.
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

from rpg_ramnet_tpu.ops import gru_hside as G  # noqa: E402

G._VMEM_LIMIT = 32 * 1024 * 1024

from bench import bench_jax_fps               # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
out = {"vmem_limit_mib": 32}
errf = open(os.path.join(HERE, "lane128_errors.txt"), "w")

legs = (
    ("l64_composed", dict(lanes=64, n_hi=4, dtype="bfloat16",
                          batched_decode=True, composed_decoder="on")),
    ("l128_composed", dict(lanes=128, n_lo=1, n_hi=3, dtype="bfloat16",
                           batched_decode=True, composed_decoder="on")),
    ("l64_twostage", dict(lanes=64, n_hi=4, dtype="bfloat16",
                          batched_decode=True)),
)
for name, kw in legs:
    try:
        out[name] = round(bench_jax_fps(**kw), 1)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:200]
        errf.write(f"===== {name} =====\n{traceback.format_exc()}\n")
        errf.flush()
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "lane128_retry.json"), "w") as f:
        json.dump(out, f, indent=1)
errf.close()
