"""Measure the Pallas BACKWARD h-side kernel on the flagship training
recipe (verdict item 4: bwd is ~2x fwd work at 0.52 MFU; TODO bounds the
upside ~10-15%).  A/B in ONE process:
  base     — deferred decode only (the shipped 15.6 seq/s recipe)
  pre_x    — + precompute_x + fused fwd cells (round-3: measured 12.1,
             a NEGATIVE without the bwd kernel)
  pre_x_bwd— + the Pallas backward kernel (gru_hside._BWD_KERNEL)
If pre_x_bwd beats base, flip the training default; else record the
measured negative (round-3 dead-end standard)."""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform   # noqa: E402
ensure_platform()

from rpg_ramnet_tpu.ops import gru_hside as G      # noqa: E402
from bench import bench_train_step                 # noqa: E402

out = {}
points = (
    ("base", False, False),
    ("pre_x", True, False),
    ("pre_x_bwd", True, True),
)
for name, pre_x, bwd in points:
    G._BWD_KERNEL = bwd
    try:
        r = bench_train_step(B=16, dtype="bfloat16", deferred_decode=True,
                             precompute_x=pre_x)
        out[name] = {"seq_per_sec": round(r["seq_per_sec"], 2),
                     "mfu": round(r.get("mfu_vs_bf16_peak", 0.0), 4)}
    except Exception as e:
        out[name + "_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)
G._BWD_KERNEL = False

with open(os.path.join(os.path.dirname(__file__), "bwd_kernel_bench.json"),
          "w") as f:
    json.dump(out, f, indent=1)
