"""Iteration probe for the chunk kernel (after the stacked-weight
BlockSpec select): per-step time at chosen scales/tiles."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from rpg_ramnet_tpu.models import layers as L
from rpg_ramnet_tpu.ops import gru_chunk as GC
from bench import _per_iter_seconds

K, LP = 5, 16
S = LP * (K + 1)
cases = [(64, 128, 128, 16), (32, 64, 256, 16), (128, 256, 64, 4),
         (128, 256, 64, 8), (64, 128, 128, 32), (32, 64, 256, 32),
         (128, 256, 64, 16)]
if len(sys.argv) > 1:
    sel = set(int(a) for a in sys.argv[1:])
    cases = [c for j, c in enumerate(cases) if j in sel]
out = {}
for (H, W, C, t) in cases:
    p_ev = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    p_im = L.conv_gru_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(1, H, W, C) * 0.5, jnp.bfloat16)
    gx = jnp.asarray(rng.randn(S, H, W, 3 * C) * 0.5, jnp.bfloat16)
    k = f"{H}x{W}x{C}_t{t}"
    try:
        got = GC.conv_gru_hside_chunk(p_ev, p_im, gx, h0, K, tile_h=t)
        got.block_until_ready()
    except Exception as e:  # noqa: BLE001
        out[k] = {"error": str(e)[:200]}
        print(json.dumps({k: out[k]}), flush=True)
        continue

    @jax.jit
    def run_n(h0, gx, n):
        def body(i, acc):
            snaps = GC.conv_gru_hside_chunk(
                p_ev, p_im, gx + (i + 1).astype(gx.dtype) * jnp.bfloat16(1e-8),
                h0, K, tile_h=t)
            return acc + jnp.sum(snaps[-1].astype(jnp.float32))
        return lax.fori_loop(0, n, body, jnp.float32(0))

    sec = _per_iter_seconds(run_n, (h0, gx, 2), (h0, gx, 10), 2, 10)
    out[k] = {"per_step_us": round(sec / S * 1e6, 1),
              "v1_clean_us": {64: 106.1, 128: 51.7, 256: 32.1}[C]}
    print(json.dumps({k: out[k]}), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "gru_chunk_probe2.json"), "w") as f:
    json.dump(out, f, indent=1)
