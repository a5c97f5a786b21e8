"""A/B of the cross-scale merged GRU h-side launch (ops/gru_pair: scales
0+1 in one pallas_call) on the record path: bench_chunked_fps(lanes=1,
L=16, bf16, precompute=True) — the 937.9 maps/s program.  The merge removes
one custom-call boundary (~31 us of XLA while bookkeeping by the round-3
trace arithmetic) per modality step (6/package).  Also an isolated per-step
microbench of the scan body: 3 per-scale launches vs pair+1.
Decision variable: e2e maps/s in ONE process."""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform   # noqa: E402
ensure_platform()

import numpy as np                                  # noqa: E402
import jax                                          # noqa: E402
import jax.numpy as jnp                             # noqa: E402
from jax import lax                                 # noqa: E402

from bench import bench_chunked_fps                 # noqa: E402

out = {}


def _per_iter(run_n, args, n_lo, n_hi, repeats=2):
    def timed(*a):
        t0 = time.perf_counter()
        float(np.asarray(run_n(*a)).ravel()[0])
        return time.perf_counter() - t0
    timed(*args, n_lo)
    lo = min(timed(*args, n_lo) for _ in range(repeats))
    hi = min(timed(*args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def microbench():
    """Per-step h-side completion (all 3 flagship scales), scanned
    sequentially S times: per-scale fused cells vs pair+single."""
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops import gru_pair
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_hside_fused

    rng = np.random.RandomState(0)
    scales = [(128, 256, 64), (64, 128, 128), (32, 64, 256)]
    ps, hs, gxs = [], [], []
    for si, (H, W, C) in enumerate(scales):
        p = L.conv_gru_init(jax.random.PRNGKey(si), C, C, 3, jnp.float32)
        ps.append(jax.tree_util.tree_map(lambda x: x, p))
        hs.append(jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
                  .astype(jnp.bfloat16))
        gxs.append(jnp.asarray(rng.randn(1, H, W, 3 * C).astype(np.float32))
                   .astype(jnp.bfloat16))

    res = {}
    for mode in ("separate", "pair"):
        @jax.jit
        def run_n(hs0, hs1, hs2, n, _mode=mode):
            def body(_, carry):
                h0, h1, h2 = carry
                if _mode == "pair":
                    h0, h1 = gru_pair.conv_gru_hside_pair(
                        ps[0], ps[1], gxs[0], gxs[1], h0, h1)
                else:
                    h0 = conv_gru_hside_fused(ps[0], gxs[0], h0)
                    h1 = conv_gru_hside_fused(ps[1], gxs[1], h1)
                h2 = conv_gru_hside_fused(ps[2], gxs[2], h2)
                return (h0, h1, h2)
            # n is traced (dynamic trip count — the two-trip-count timing
            # recipe, PERF.md); scan(length=) needs a static int, so
            # fori_loop.
            h0, h1, h2 = lax.fori_loop(0, n, body, (hs0, hs1, hs2))
            return (jnp.sum(jnp.abs(h0).astype(jnp.float32))
                    + jnp.sum(jnp.abs(h1).astype(jnp.float32))
                    + jnp.sum(jnp.abs(h2).astype(jnp.float32)))
        sec = _per_iter(run_n, (hs[0], hs[1], hs[2]), 8, 96)
        res[f"us_per_step_{_mode if False else mode}"] = round(sec * 1e6, 1)
        print(mode, res, flush=True)
    return res


try:
    out["microbench"] = microbench()
except Exception as e:    # a pair-kernel Mosaic failure must not kill e2e
    out["microbench_error"] = str(e)[:300]
print(json.dumps(out), flush=True)
for pair in ("auto", "on"):
    try:
        fps = bench_chunked_fps(lanes=1, L=16, dtype="bfloat16",
                                precompute=True, fused_pair=pair)
        out[f"e2e_fused_pair_{pair}"] = round(fps, 1)
    except Exception as e:
        out[f"e2e_fused_pair_{pair}_error"] = str(e)[:300]
    print(json.dumps(out), flush=True)

with open(os.path.join(os.path.dirname(__file__), "gru_pair_bench.json"),
          "w") as f:
    json.dump(out, f, indent=1)
