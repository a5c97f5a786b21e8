"""Round-5: can the raised scoped-VMEM cap unlock the FUSED cell for f32?

supports() rejects f32 because the kernel's in-kernel temps measured
20.9M at scale-0 tile_h=8 — over the 16M default cap that round-2 assumed
was physical.  It is not (v5e VMEM is 128 MiB); with
`vmem_limit_bytes` raised the f32 kernel may compile.  The f32 paths
(reference-semantics bench items: single-stream 456, chunked 540.1
maps/s) still run XLA cells, which measured 6-9x off the HBM roofline.

Per-step microbench at the flagship scales, f32, fori_loop-scanned:
  xla    — layers.conv_gru_apply_hside (the shipped f32 path)
  fused  — conv_gru_hside_fused, tile_h picked for esize=4, cap 64 MiB
If fused wins clearly, wire supports() to admit f32 under the cap and
A/B the e2e f32 legs.
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from rpg_ramnet_tpu.ops import gru_hside as G  # noqa: E402
from rpg_ramnet_tpu.models import layers as L  # noqa: E402

G._VMEM_LIMIT = 64 * 1024 * 1024

HERE = os.path.dirname(os.path.abspath(__file__))
out = {"vmem_limit_mib": 64}


def save():
    with open(os.path.join(HERE, "f32_cell_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


def _per_iter(run_n, args, n_lo, n_hi, repeats=2):
    def timed(*a):
        t0 = time.perf_counter()
        float(np.asarray(run_n(*a)).ravel()[0])
        return time.perf_counter() - t0
    timed(*args, n_lo)
    lo = min(timed(*args, n_lo) for _ in range(repeats))
    hi = min(timed(*args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


SCALES = ((128, 256, 64), (64, 128, 128), (32, 64, 256))
for si, (H, W, C) in enumerate(SCALES):
    rng = np.random.RandomState(si)
    p = L.conv_gru_init(jax.random.PRNGKey(si), C, C, 3, jnp.float32)
    h0 = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    gx = jnp.asarray(rng.randn(1, H, W, 3 * C).astype(np.float32))
    th = G._pick_tile_h(H, W, C, 4)
    out[f"tile_h_s{si}"] = th

    for mode in ("xla", "fused"):
        @jax.jit
        def run_n(h, g, n, _mode=mode, _th=th):
            def body(i, hh):
                gi = g + (i + 1).astype(jnp.float32) * 1e-9
                if _mode == "fused":
                    return G.conv_gru_hside_fused(p, gi, hh, tile_h=_th)
                return L.conv_gru_apply_hside(p, gi, hh)
            hn = lax.fori_loop(0, n, body, h)
            return jnp.sum(jnp.abs(hn))
        name = f"us_per_step_s{si}_{mode}"
        try:
            sec = _per_iter(run_n, (h0, gx), 8, 72)
            out[name] = round(sec * 1e6, 1)
        except Exception as e:
            out[name] = "FAIL: " + str(e)[:200]
            with open(os.path.join(HERE, "f32_cell_errors.txt"), "a") as f:
                f.write(f"===== {name} =====\n{traceback.format_exc()}\n")
        print(json.dumps(out), flush=True)
        save()
