#!/usr/bin/env python
"""Round-5 isolation of the fused_pair='on' e2e HTTP 500.

Established (aot_scale_probe.json + gru_pair_bench.json microbench): the
pair kernel compiles and RUNS on this rig at the exact flagship shapes,
standalone and inside a fori_loop — yet the full record program
(bench_chunked_fps(lanes=1, L=16, bf16, precompute=True, fused_pair='on'))
dies in the chipless AOT helper with its generic HTTP 500.  The helper
wraps ANY subprocess failure (including genuine XLA compile deaths, cf.
the save-gx B=16 program), so this probe (a) captures the FULL error text
untruncated, and (b) bisects the e2e program along structure:

  scan_hside  — lax.scan of the REAL _hside_package (6 combine steps,
                events+image weights, snapshot stacking) with pair on;
                no encoders, no decoder.  The microbench minus nothing
                but the x-side/decode program.
  e2e_small   — full bench_chunked_fps at 64x128 input, L=2.
  e2e_L2      — full program at record resolution, L=2.
  e2e_full    — the record config (known-failing; run last, it's only
                here so the FULL error text gets captured).

Every stage writes incrementally to pair_e2e_bisect.json; full tracebacks
go to pair_e2e_errors.txt.
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
out = {"device": str(jax.devices()[0])}
errf = open(os.path.join(HERE, "pair_e2e_errors.txt"), "w")


def save():
    with open(os.path.join(HERE, "pair_e2e_bisect.json"), "w") as f:
        json.dump(out, f, indent=1)


def run(name, fn):
    print(f"--- {name}", file=sys.stderr, flush=True)
    try:
        out[name] = fn()
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:200]
        errf.write(f"===== {name} =====\n{traceback.format_exc()}\n")
        errf.flush()
        print(f"{name}: FAIL {str(e)[:160]}", file=sys.stderr, flush=True)
    save()


def scan_hside():
    """lax.scan of the real _hside_package with fused_pair='on' at the
    record shapes — the e2e sequential core without x-side/decoder."""
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from rpg_ramnet_tpu.models.model import _hside_package

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32,
        "num_residual_blocks": 2, "use_upsample_conv": True, "norm": "none",
        "every_x_rgb_frame": 5, "baseline": False,
        "compute_dtype": "bfloat16", "fused_pair": "on"})
    loop = mcfg.every_x_rgb_frame
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state = ERGB2DepthRecurrent.init_state(mcfg, 1, 256, 512)
    supers0 = tuple(state.super_states)
    L = 4
    rng = np.random.RandomState(0)
    gx_ev = tuple(
        jnp.asarray(rng.randn(L, 1, loop, s.shape[1], s.shape[2],
                              3 * s.shape[3]).astype(np.float32),
                    jnp.bfloat16) for s in supers0)
    gx_im = tuple(
        jnp.asarray(rng.randn(L, 1, s.shape[1], s.shape[2],
                              3 * s.shape[3]).astype(np.float32),
                    jnp.bfloat16) for s in supers0)
    sel = [f"events{k}" for k in range(loop)] + ["image"]

    @jax.jit
    def run_n(supers, gev, gim, n):
        # gx as ARGUMENTS, not closures — closed-over arrays embed as HLO
        # constants and the ~0.5 GB upload chokes the remote compile helper
        def body(i, carry):
            sup, acc = carry
            def step(sup2, gx):
                return _hside_package(params, mcfg, sup2, gx[0], gx[1],
                                      sel, loop, allow_fused=True)
            sup, snaps = lax.scan(step, sup, (gev, gim))
            acc = acc + sum(jnp.sum(jnp.abs(s).astype(jnp.float32))
                            for s in jax.tree_util.tree_leaves(snaps))
            return (sup, acc)
        sup, acc = lax.fori_loop(0, n, body, (supers, jnp.float32(0)))
        return acc
    v = float(np.asarray(jax.block_until_ready(
        run_n(supers0, gx_ev, gx_im, 2))))
    return "ok" if np.isfinite(v) else "nonfinite"


def e2e(H, W, L):
    from bench import bench_chunked_fps
    fps = bench_chunked_fps(H=H, W=W, lanes=1, L=L, dtype="bfloat16",
                            precompute=True, fused_pair="on")
    return round(fps, 1)


run("scan_hside", scan_hside)
run("e2e_small_64x128_L2", lambda: e2e(64, 128, 2))
run("e2e_L2_256x512", lambda: e2e(256, 512, 2))
run("e2e_full_256x512_L16", lambda: e2e(256, 512, 16))
errf.close()
print(json.dumps(out, indent=1))
