#!/usr/bin/env python
"""Round-5 follow-up to exp/aot_bisect.py: every MINIMAL structural probe
of the pair/stream program features compiles on this rig (aot_bisect.json:
clamp, pl.when, multi-output hetero blocks, scalar prefetch, aliasing all
'ok') — so the round-4 'the helper rejects the program SHAPE' theory is
WRONG.  The helper's HTTP 500 wraps ANY subprocess failure, including
genuine Mosaic compile errors (e.g. VMEM overflow), as seen when the
pure-XLA save-gx B=16 training program also 500'd (gx_policy_bench).

This probe runs the REAL kernels (ops/gru_pair.conv_gru_hside_pair and
ops/gru_stream._run_stream) on a size ladder up to the flagship record
shapes (256x512 input -> scale0 128x256xC64, scale1 64x128xC128) to find
the threshold where compilation starts failing.  If small shapes pass and
flagship shapes fail, the kernels' VMEM appetite is the cause and the
fix is a smaller tile_h / restructure — not a helper workaround.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rpg_ramnet_tpu.ops import gru_pair, gru_stream  # noqa: E402

out = {"device": str(jax.devices()[0])}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "aot_scale_probe.json")


def save():
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


def run(name, fn):
    try:
        r = fn()
        ok = all(bool(np.all(np.isfinite(np.asarray(x, dtype=np.float32))))
                 for x in (r if isinstance(r, tuple) else (r,)))
        out[name] = "ok" if ok else "nonfinite"
        print(f"{name}: {out[name]}", file=sys.stderr)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:300]
        print(f"{name}: FAIL {str(e)[:160]}", file=sys.stderr)
    save()


def gru_params(C, seed):
    r = np.random.RandomState(seed)
    mk = lambda: {"weight": jnp.asarray(           # noqa: E731
        r.randn(3, 3, 2 * C, C).astype(np.float32) * 0.05)}
    return {"update_gate": mk(), "reset_gate": mk(), "out_gate": mk()}


def pair_at(H0, W0):
    C0, C1 = 64, 128
    H1, W1 = H0 // 2, W0 // 2
    r = np.random.RandomState(0)
    h0 = jnp.asarray(r.randn(1, H0, W0, C0), jnp.bfloat16)
    h1 = jnp.asarray(r.randn(1, H1, W1, C1), jnp.bfloat16)
    gx0 = jnp.asarray(r.randn(1, H0, W0, 3 * C0), jnp.bfloat16)
    gx1 = jnp.asarray(r.randn(1, H1, W1, 3 * C1), jnp.bfloat16)
    p0, p1 = gru_params(C0, 1), gru_params(C1, 2)
    return lambda: jax.block_until_ready(
        gru_pair.conv_gru_hside_pair(p0, p1, gx0, gx1, h0, h1))


def stream_at(H, W, C=64, S=4):
    from rpg_ramnet_tpu.ops.gru_hside import _fold3, _pick_tile_h
    t = _pick_tile_h(H, W, C, 2)
    if not t:
        return None
    r = np.random.RandomState(0)
    h = jnp.asarray(r.randn(H, W, C), jnp.bfloat16)
    gx_seq = jnp.asarray(r.randn(S, H, W, 3 * C), jnp.bfloat16)
    gxt, gxb = gru_stream.seq_halos(gx_seq, t, C)
    w_ur = _fold3(jnp.asarray(
        r.randn(3, 3, C, 2 * C).astype(np.float32) * 0.05)).astype(jnp.bfloat16)
    w_o = _fold3(jnp.asarray(
        r.randn(3, 3, C, C).astype(np.float32) * 0.05)).astype(jnp.bfloat16)
    sel = jnp.asarray([1], jnp.int32)
    return lambda: jax.block_until_ready(gru_stream._run_stream(
        sel, h, gx_seq, gxt, gxb, w_ur, w_o, t,
        interpret=jax.default_backend() == "cpu"))


for H0, W0 in ((32, 64), (64, 128), (128, 256)):
    run(f"pair_{H0}x{W0}", pair_at(H0, W0))

for H, W in ((32, 64), (64, 128), (128, 256)):
    fn = stream_at(H, W)
    if fn is None:
        out[f"stream_{H}x{W}"] = "no tile"
        save()
        continue
    run(f"stream_{H}x{W}", fn)

print(json.dumps(out, indent=2))
