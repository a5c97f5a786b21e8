"""Round-3 e2e hardware measurements: the record chunked bf16 path with
fused cells + fused decoder, the parity guard, and fused training."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}
def rec(k, fn):
    try:
        out[k] = fn()
    except Exception as e:
        out[k] = f"ERROR {str(e)[:300]}"
    print(json.dumps({k: out[k]}), flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "infer"):
    rec("parity_guard_max_diff", lambda: bench.check_fused_parity())
    rec("chunked_bf16_precompute_fused", lambda: bench.bench_chunked_fps(
        lanes=1, L=16, dtype="bfloat16", precompute=True))
    rec("chunked_bf16_nofused_decoder", lambda: None)  # placeholder
if which in ("all", "train"):
    rec("train_bf16_B16_deferred_precompute_fused", lambda: bench.bench_train_step(
        B=16, dtype="bfloat16", deferred_decode=True, precompute_x=True))
with open(os.path.join(os.path.dirname(__file__), f"round3_e2e_{which}.json"), "w") as f:
    json.dump(out, f, indent=1, default=str)
