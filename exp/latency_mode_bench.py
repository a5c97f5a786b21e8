"""Per-package (latency-mode) streaming with the fused decoder gate:
bf16 1-lane batched-decode (B=6 decode batch; round-2: 494 maps/s) and
plain per-step decode (B=1)."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}
def rec(k, fn):
    try:
        out[k] = round(fn(), 1)
    except Exception as e:
        out[k] = f"ERROR {str(e)[:200]}"
    print(json.dumps({k: out[k]}), flush=True)

rec("perpkg_bf16_1lane_batched_decode_fusedDec",
    lambda: bench.bench_jax_fps(lanes=1, dtype="bfloat16", n_hi=24,
                                batched_decode=True))
rec("perpkg_bf16_1lane_plain_fusedDec",
    lambda: bench.bench_jax_fps(lanes=1, dtype="bfloat16", n_hi=24))
with open(os.path.join(os.path.dirname(__file__),
                       "latency_mode_bench.json"), "w") as f:
    json.dump(out, f, indent=1)
