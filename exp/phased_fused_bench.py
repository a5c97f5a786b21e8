"""A/B of the round-4 phased-regime (MVSEC / BASELINE config 3) fused path.

Legs, all on bench.bench_phased_fps's single-stream 256x352 streaming
program (one package per step, irregular per-iteration times):
  f32            — the round-3 baseline point (pre-NHWC-gate it also paid
                   4 full-map NCHW transposes + 2 back per scale per step;
                   that layout fix is now default-on for ALL legs)
  bf16           — compute dtype only
  bf16_fused     — + the single-launch phased cell in the encoders (4-gate
                   h-side + time-gate blend in VMEM, ops/phased_cell.py —
                   c_t never round-trips HBM) AND the x/h-split LSTM h-side
                   cell in the convlstm state combination
                   (cfg.fused_gru='on'; statenet._use_fused_cell gates per
                   scale: 128x176x64 / 64x88x128 fused, 32x44x256 falls
                   back on W%8).
Decision variable: maps/s.  If bf16_fused wins bf16 by >5%, flip the
phased bench detail ordering / consider 'auto' for the phased arch.
Reference semantics: RAM_Net/model/submodules.py:218-411 (PhasedConvLSTM).
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform   # noqa: E402
ensure_platform()

from bench import (bench_phased_fps, bench_phased_chunked_fps,  # noqa: E402
                   check_phased_fused_parity)

out = {}
try:
    out["parity_maxdiff"] = float(check_phased_fused_parity())
except Exception as e:    # a Mosaic failure must not kill the XLA legs
    out["parity_error"] = str(e)[:300]
print(json.dumps(out), flush=True)
for name, kw in (
        ("f32", dict(dtype="float32")),
        ("bf16", dict(dtype="bfloat16")),
        ("bf16_fused", dict(dtype="bfloat16", fused_gru="on"))):
    try:
        out[f"phased_fps_{name}"] = round(bench_phased_fps(**kw), 2)
    except Exception as e:
        out[f"phased_fps_{name}_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)
# offline chunked (deferred batched decode) — the recorded-MVSEC mode
for name, kw in (
        ("bf16", dict(dtype="bfloat16")),
        ("bf16_fused", dict(dtype="bfloat16", fused_gru="on"))):
    try:
        out[f"phased_chunked_{name}"] = round(
            bench_phased_chunked_fps(**kw), 2)
    except Exception as e:
        out[f"phased_chunked_{name}_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)

# phased TRAINING (MVSEC fine-tune recipe shapes): the phased cell's
# custom VJP lets fused_gru='on' run it on the TBPTT critical path —
# grads identical (tests/test_train.py::test_phased_fused_training_
# grads_match); decision variable seq/s
from bench import bench_train_step                   # noqa: E402
for name, kw in (
        ("bf16", dict()),
        ("bf16_fused", dict(fused_gru="on"))):
    try:
        r = bench_train_step(dtype="bfloat16", deferred_decode=True,
                             phased=True, **kw)
        out[f"phased_train_{name}_seq_per_sec"] = round(r["seq_per_sec"], 2)
    except Exception as e:       # record instead of losing earlier legs
        out[f"phased_train_{name}_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)

with open(os.path.join(os.path.dirname(__file__), "phased_fused_bench.json"),
          "w") as f:
    json.dump(out, f, indent=1)
