"""remat_policy experiment: the flagship training recipe recomputes the
whole scan step in the backward (jax.checkpoint saves nothing).
trainer.remat_policy='enc_out' saves the tagged per-scale encoder conv
outputs instead (~2.7 GiB extra activations at the flagship shapes),
so the backward skips the head+encoder recompute.  Measure the flagship
(bf16, B=16, deferred decode + composed decoder) and the reference f32
recipe with both policies."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}


def rec(k, **kw):
    try:
        v = bench.bench_train_step(**kw)
        out[k] = {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                  for kk, vv in v.items()}
    except Exception as e:
        out[k] = f"ERROR {str(e)[:250]}"
    print(json.dumps({k: out[k]}, default=str), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "remat_policy_bench.json"), "w") as f:
        json.dump(out, f, indent=1, default=str)


rec("flagship_bf16_B16_deferred_policy_none",
    B=16, dtype="bfloat16", deferred_decode=True)
rec("flagship_bf16_B16_deferred_policy_enc_out",
    B=16, dtype="bfloat16", deferred_decode=True, remat_policy="enc_out")
rec("ref_recipe_f32_B8_deferred_policy_enc_out",
    B=8, dtype="float32", deferred_decode=True, remat_policy="enc_out")
print(json.dumps(out, default=str))
