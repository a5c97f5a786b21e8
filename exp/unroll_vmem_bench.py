"""Round-5 retry of the record-path scan unroll sweep with the scoped-VMEM
cap raised on the fused h-side cells.

The round-3 sweep (exp/scan_unroll_bench.json) measured unroll=1 at the
record 937.6 maps/s and saw unroll 4/16 die with the helper's generic
HTTP 500.  Round-5 isolation (exp/pair_e2e_errors.txt) showed that error
wraps genuine scoped-VMEM overflows: XLA's VMEM-placement pass puts
custom-call OUTPUTS in VMEM when a program keeps h resident across
launches, and an unrolled scan body multiplies the live fused-cell
outputs.  With gru_hside._VMEM_LIMIT raised to 32 MiB the unrolled
variants may now compile; unroll >1 attacks the 0.56 ms/pkg while-loop
bookkeeping in the 1.63 ms sequential floor.

Legs (one process, record config lanes=1 L=16 bf16 precompute):
  u1_cap   — unroll=1 WITH the raised cap (control: does the cap alone
             change XLA's placement/perf?)
  u2_cap, u4_cap — the unrolled variants.
Full errors go to unroll_vmem_errors.txt.  Decision rule: flip the bench
headline's unroll only on a >=10%-confirmed... no — in-process legs
resolve ~0.4%, so flip on a consistent >2% win, else record and close.
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

from rpg_ramnet_tpu.ops import gru_hside as G   # noqa: E402

G._VMEM_LIMIT = 32 * 1024 * 1024

from bench import bench_chunked_fps            # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
out = {"vmem_limit_mib": 32}
errf = open(os.path.join(HERE, "unroll_vmem_errors.txt"), "w")

for unroll in (1, 2, 4):
    name = f"u{unroll}_cap"
    try:
        fps = bench_chunked_fps(lanes=1, L=16, dtype="bfloat16",
                                precompute=True, scan_unroll=unroll)
        out[name] = round(fps, 1)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:200]
        errf.write(f"===== {name} =====\n{traceback.format_exc()}\n")
        errf.flush()
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "unroll_vmem_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
errf.close()
