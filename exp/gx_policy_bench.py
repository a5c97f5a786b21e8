#!/usr/bin/env python
"""Round-5 training-MFU A/B: remat_policy='gru_gx' on the precompute_x path.

The round-3 finding: flagship training (bf16, B=16, deferred decode) is the
lowest-MFU axis (15.6 seq/s / 0.519) and its named dominant term is the
per-package gx re-materialization inside every remat'd TBPTT step — the
backward recomputes head+encoders+x-side gate convs (~60% of the step's
recomputed MACs).  'gru_gx' (statenet.gru_x_gates checkpoint_name tags)
saves exactly those tensors instead.

The memory arithmetic that makes this an open question (PERF.md round 5):
saved gx per modality sweep at the flagship shapes is ~135 MB bf16 at B=16
(scales: [16,112,112,192] + [16,56,56,384] + [16,28,28,768]); x 6 sweeps
x L=10 steps = ~8 GB stacked across the window, on a 15.75 GiB chip
already running a ~10 GiB program.  Expected outcomes: OOM/compile failure
at B=16 (quantified close-out), or a measured win/loss.

Methodology (round-5 bench policy): legs are INTERLEAVED (A B C A B C ...)
within one process and the per-leg median + spread is reported; any
single-process delta under ~10% is inconclusive on this rig (PERF.md:
±6% for identical programs minutes apart).  The persistent compile cache
makes the repeat legs cheap.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402

from bench import bench_train_step  # noqa: E402

ROUNDS = int(os.environ.get("GX_ROUNDS", "2"))
INCONCLUSIVE_PCT = 10.0

LEGS = [
    ("base_B16", dict(B=16, dtype="bfloat16", deferred_decode=True)),
    ("prex_B16", dict(B=16, dtype="bfloat16", deferred_decode=True,
                      precompute_x=True)),
    ("prex_gx_B16", dict(B=16, dtype="bfloat16", deferred_decode=True,
                         precompute_x=True, remat_policy="gru_gx")),
    ("base_B8", dict(B=8, dtype="bfloat16", deferred_decode=True)),
    ("prex_gx_B8", dict(B=8, dtype="bfloat16", deferred_decode=True,
                        precompute_x=True, remat_policy="gru_gx")),
]

out = {"rounds": ROUNDS, "legs": {}, "errors": {}}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "gx_policy_bench.json")


def save():
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


for r in range(ROUNDS):
    for name, kw in LEGS:
        if name in out["errors"]:
            continue  # a leg that OOM'd/failed once stays failed
        t0 = time.time()
        try:
            res = bench_train_step(**kw)
            out["legs"].setdefault(name, []).append(
                {"seq_per_sec": res["seq_per_sec"],
                 "mfu": res.get("mfu_vs_bf16_peak"),
                 "wall_s": round(time.time() - t0, 1)})
            print(f"[round {r}] {name}: {res['seq_per_sec']:.2f} seq/s "
                  f"(mfu {res.get('mfu_vs_bf16_peak', 0):.3f})",
                  file=sys.stderr)
        except Exception as e:
            out["errors"][name] = str(e)[:600]
            print(f"[round {r}] {name}: FAILED {str(e)[:200]}",
                  file=sys.stderr)
        save()

# verdicts: median per leg + the inconclusive rule applied in-code
med = {k: float(np.median([x["seq_per_sec"] for x in v]))
       for k, v in out["legs"].items()}
out["median_seq_per_sec"] = med
for name in ("prex_gx_B16", "prex_gx_B8"):
    base = "base_B16" if name.endswith("B16") else "base_B8"
    if name in med and base in med:
        delta_pct = 100.0 * (med[name] - med[base]) / med[base]
        verdict = ("INCONCLUSIVE (<10% single-process rule)"
                   if abs(delta_pct) < INCONCLUSIVE_PCT
                   else ("WIN" if delta_pct > 0 else "LOSS"))
        out[f"verdict_{name}"] = {"delta_pct": round(delta_pct, 1),
                                  "vs": base, "verdict": verdict}
save()
print(json.dumps(out, indent=2))
