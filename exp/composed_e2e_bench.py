"""e2e with the composed transposed-conv decoder layers (round 3):
chunked bf16 record path + flagship training."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}
def rec(k, fn):
    try:
        v = fn()
        out[k] = round(v, 2) if isinstance(v, float) else v
    except Exception as e:
        out[k] = f"ERROR {str(e)[:250]}"
    print(json.dumps({k: out[k]}, default=str), flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "infer"):
    rec("chunked_bf16_precompute_fused_composed", lambda: bench.bench_chunked_fps(
        lanes=1, L=16, dtype="bfloat16", precompute=True))
if which in ("all", "train"):
    rec("train_bf16_B16_deferred_composed", lambda: bench.bench_train_step(
        B=16, dtype="bfloat16", deferred_decode=True))
with open(os.path.join(os.path.dirname(__file__),
                       f"composed_e2e_{which}.json"), "w") as f:
    json.dump(out, f, indent=1, default=str)
