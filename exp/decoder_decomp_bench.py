"""Decompose the fused-decoder e2e regression: chunked bf16 precompute with
(a) decoder kernel OFF (round-2 record config), (b) all layers fused (=716
measured), and per-package latency mode with fused decoder."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import bench

out = {}
def rec(k, fn):
    try:
        out[k] = round(fn(), 1) if not isinstance(fn(), dict) else fn()
    except Exception as e:
        out[k] = f"ERROR {str(e)[:250]}"
    print(json.dumps({k: out[k]}), flush=True)

rec("chunked_bf16_pre_decoderOFF", lambda: bench.bench_chunked_fps(
    lanes=1, L=16, dtype="bfloat16", precompute=True, fused_decoder="off"))
with open(os.path.join(os.path.dirname(__file__),
                       "decoder_decomp.json"), "w") as f:
    json.dump(out, f, indent=1)
