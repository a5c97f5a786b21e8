"""Hardware probe of the whole-chunk resident-state GRU h-side kernel
(ops/gru_chunk.py) at the 3 flagship scales: correctness vs the unfused
XLA h-side scan (f32) and per-STEP device time vs the per-step fused v1
cell (exp/fused_cell_roofline.json: ~106/52/32 us 'clean')."""
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
out = {}
for (H, W, C) in ((128, 256, 64), (64, 128, 128), (32, 64, 256)):
    p_ev = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    p_im = L.conv_gru_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(1, H, W, C) * 0.5, jnp.bfloat16)
    gx = jnp.asarray(rng.randn(S, H, W, 3 * C) * 0.5, jnp.bfloat16)
    t = GC._pick_tile(H, W, C)
    k = f"{H}x{W}x{C}"
    out[k] = {"tile": t, "supported": bool(GC.supports(h0))}
    if not t:
        print(json.dumps({k: out[k]}), flush=True)
        continue

    # correctness: unfused XLA scan in f32 on the chip
    @jax.jit
    def ref_scan(h0, gx):
        def body(h, g):
            ge, gi = g
            he = L.conv_gru_apply_hside(p_ev, ge, h)
            # emulate the interleave: we instead compare per-step below
            return he, he
        return None
    hf = h0.astype(jnp.float32)
    refs = []
    h = hf
    step_ev = jax.jit(lambda g, h: L.conv_gru_apply_hside(p_ev, g, h))
    step_im = jax.jit(lambda g, h: L.conv_gru_apply_hside(p_im, g, h))
    gf = gx.astype(jnp.float32)
    for s in range(S):
        h = (step_im if s % (K + 1) == K else step_ev)(gf[s:s + 1], h)
        refs.append(h[0])
    ref = jnp.stack(refs)

    try:
        got = GC.conv_gru_hside_chunk(p_ev, p_im, gx, h0, K)
    except Exception as e:  # noqa: BLE001
        out[k]["error"] = str(e)[:300]
        print(json.dumps({k: out[k]}), flush=True)
        continue
    d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    out[k]["max_diff_vs_xla_f32"] = d

    @jax.jit
    def run_n(h0, gx, n):
        def body(i, acc):
            snaps = GC.conv_gru_hside_chunk(
                p_ev, p_im, gx + (i + 1).astype(gx.dtype) * jnp.bfloat16(1e-8),
                h0, K)
            return acc + jnp.sum(snaps[-1].astype(jnp.float32))
        return lax.fori_loop(0, n, body, jnp.float32(0))

    sec = _per_iter_seconds(run_n, (h0, gx, 2), (h0, gx, 10), 2, 10)
    per_step = sec / S
    planes = H * W * C * 2
    out[k].update({
        "chunk_ms": round(sec * 1e3, 3),
        "per_step_us": round(per_step * 1e6, 1),
        "v1_clean_us": {64: 106.1, 128: 51.7, 256: 32.1}[C],
        "eff_gbps_4planes": round(4 * planes / per_step / 1e9, 1),
    })
    print(json.dumps({k: out[k]}), flush=True)

with open(os.path.join(os.path.dirname(__file__), "gru_chunk_probe.json"),
          "w") as f:
    json.dump(out, f, indent=1)
