"""Capture + summarize a profiler trace of the chunked deferred-decode
streaming program (the bench headline): where do the 10.9 ms/package go?

Prints total device time by HLO category and the largest individual ops.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np


def capture(trace_dir):
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False})
    L, H, W = 16, 256, 512
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, H, W)
    rng = np.random.RandomState(0)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, 1, 5, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, 1, 1, H, W).astype(np.float32))}
    fwd = jax.jit(lambda p, s, q:
                  ERGB2DepthRecurrent.forward_sequence_batched_decode(
                      p, mcfg, s, q))
    st, preds = fwd(params, state0, seq)  # compile outside trace
    jax.block_until_ready(preds)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            st, preds = fwd(params, st, seq)
        jax.block_until_ready(preds)
    return L


def summarize(trace_dir, L):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    d = json.load(gzip.open(paths[-1]))
    evs = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {pid for pid, n in pids.items() if "TPU" in n}
    by_cat = collections.Counter()
    by_op = collections.Counter()
    longn = {}
    top = None
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        a = e.get("args") or {}
        if e["name"].startswith("jit_"):
            top = (top or 0) + e.get("dur", 0)
            continue
        cat = a.get("hlo_category", re.sub(r"[.\d]+$", "", e["name"]))
        by_cat[cat] += e.get("dur", 0)
        by_op[e["name"]] += e.get("dur", 0)
        if "long_name" in a:
            longn[e["name"]] = a["long_name"][:200]
    n_iters = 2
    print(f"wrapper total: {top/1e3/n_iters/L:.3f} ms/package")
    print("-- by category (ms/package) --")
    for c, us in by_cat.most_common(12):
        print(f"{us/1e3/n_iters/L:8.3f}  {c}")
    print("-- top ops (ms/package) --")
    for nm, us in by_op.most_common(12):
        print(f"{us/1e3/n_iters/L:8.4f}  {nm}")
        print("      ", longn.get(nm, "")[:160])


def main():
    trace_dir = "/tmp/chunked_trace"
    L = capture(trace_dir)
    summarize(trace_dir, L)


if __name__ == "__main__":
    main()
