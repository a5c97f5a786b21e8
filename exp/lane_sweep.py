"""Lane-batched streaming throughput sweep on the real TPU (VERDICT r2 #3).

Sweeps lanes x compute dtype at 256x512 and reports, for each point, the
measured maps/s plus the analytic bandwidth roofline (utils/costs.py): if
throughput tracks the bytes/s bound, the 1.31x-at-8-lanes 'ceiling' from
round 1 is just the HBM roofline and bf16 activations are the lever.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import bench
from rpg_ramnet_tpu.core.config import ModelConfig
from rpg_ramnet_tpu.utils import costs as C

H, W = 256, 512


def main():
    import jax
    kind = jax.devices()[0].device_kind
    peak_flops, peak_bw, _ = C.device_peaks(kind)
    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False})
    print(f"device: {kind}, peak {peak_flops/1e12:.0f} TF bf16, "
          f"{peak_bw/1e9:.0f} GB/s")
    results = {"device": kind}
    for dtype in ("float32", "bfloat16"):
        act = 2 if dtype == "bfloat16" else 4
        for lanes in (1, 2, 4, 8, 16, 32):
            key = f"{dtype}_lanes{lanes}"
            try:
                n_hi = max(4, 12 // max(lanes // 4, 1))
                fps = bench.bench_jax_fps(H=H, W=W, lanes=lanes, n_hi=n_hi,
                                          dtype=dtype)
                ana = C.package_costs(mcfg, H, W, batch=lanes, act_bytes=act)
                sec_per_pkg = lanes * 6 / fps
                gbps = ana.bytes_min / sec_per_pkg / 1e9
                tflops = ana.flops / sec_per_pkg / 1e12
                results[key] = {
                    "maps_per_s": round(fps, 1),
                    "achieved_min_gbps": round(gbps, 1),
                    "hbm_util_min": round(gbps * 1e9 / peak_bw, 3),
                    "achieved_tflops": round(tflops, 2),
                    "mfu_bf16peak": round(tflops * 1e12 / peak_flops, 3),
                }
                print(key, results[key], flush=True)
            except Exception as e:
                results[key] = {"error": str(e)[:200]}
                print(key, "ERROR", str(e)[:200], flush=True)
    print(json.dumps(results))
    with open("exp/lane_sweep_results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
