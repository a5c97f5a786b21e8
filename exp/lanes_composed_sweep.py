"""Lanes x composed-decoder sweep: the 32-lane batched-decode record
(782 maps/s bf16) predates the composed transposed-conv decoder, whose
win region (decode batch >= 24) is exactly the lane-batched decode
(batch = lanes*(K+1)).  Measure lane-batched streaming with
composed_decoder='on' (the explicit engine opt-in) vs the default,
plus one retry of lanes x precompute (composed removed the hi-res
intermediates that may have been the compile-memory culprit)."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}


def run(key, fn, **kw):
    try:
        out[key] = round(fn(**kw), 1)
    except Exception as e:
        out[key] = f"ERROR {str(e)[:200]}"
    print(json.dumps({key: out[key]}), flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "lanes_composed_sweep.json"), "w") as f:
        json.dump(out, f, indent=1)


# the prior record config, re-measured for a same-day baseline
run("bf16_lanes32_bd", bench.bench_jax_fps, lanes=32, dtype="bfloat16",
    batched_decode=True)
run("bf16_lanes32_bd_composed", bench.bench_jax_fps, lanes=32,
    dtype="bfloat16", batched_decode=True, composed_decoder="on")
run("bf16_lanes8_bd_composed", bench.bench_jax_fps, lanes=8,
    dtype="bfloat16", batched_decode=True, composed_decoder="on")
run("bf16_lanes64_bd_composed", bench.bench_jax_fps, lanes=64,
    dtype="bfloat16", batched_decode=True, composed_decoder="on")
# chunked lanes (no precompute/fused - those OOM'd the compile helper):
# composed rides the allow_composed opt-in through bench_chunked_fps
run("bf16_lanes4_L8_chunk_composed", bench.bench_chunked_fps, lanes=4,
    L=8, dtype="bfloat16", composed_decoder="on", fused_gru="off")
# one retry of the round-3 envelope point with composed on
run("bf16_pre_fused_lanes2_L8_composed", bench.bench_chunked_fps,
    lanes=2, L=8, dtype="bfloat16", precompute=True, composed_decoder="on")
print(json.dumps(out))
