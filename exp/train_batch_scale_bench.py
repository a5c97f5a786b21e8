#!/usr/bin/env python
"""Round-5 MFU lever: batch scaling of the flagship training recipe.

The gx-save remat A/B closed NEGATIVE (exp/gx_policy_bench.json: saving
the per-step x-side gate tensors loses ~11% at B=8 and does not even
compile at B=16 — the ~8 GB stacked saves overflow the 15.75 GiB chip).
The remaining single-chip MFU lever is batch: MFU rises 0.449 -> 0.518
from B=8 -> B=16 (better MXU utilization of the same per-step convs), and
the B=16 program peaks ~12.2 GiB — there is headroom to probe B=20/24
before HBM runs out.  Multi-chip scaling (DP over a mesh) is the real
production axis; this bounds what ONE chip can do.

Each leg records seq/s + MFU + measured peak HBM; an OOM/compile failure
is recorded as the leg's terminal result (that IS the close-out datum).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

from bench import bench_train_step  # noqa: E402

out = {}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "train_batch_scale.json")
for B in (16, 20, 24):
    try:
        r = bench_train_step(B=B, dtype="bfloat16", deferred_decode=True)
        out[f"B{B}"] = {"seq_per_sec": round(r["seq_per_sec"], 2),
                        "mfu": round(r.get("mfu_vs_bf16_peak", 0.0), 4),
                        "peak_hbm_gib": round(r.get("peak_hbm_gib", 0.0), 2)}
        print(f"B{B}: {out[f'B{B}']}", file=sys.stderr)
    except Exception as e:
        out[f"B{B}_error"] = str(e)[:400]
        print(f"B{B}: FAILED {str(e)[:160]}", file=sys.stderr)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
