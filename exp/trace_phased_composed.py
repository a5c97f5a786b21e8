"""Round-5: profiler trace of the phased chunked program at the CURRENT
record configuration (composed decoder ON, lanes=2 — the 712.9 maps/s
point from exp/phased_lanes_bench.json).  The earlier trace
(exp/trace_phased_chunked.py, 551.2 maps/s config) showed data
formatting at 2.805 ms/package (26% — vs the flagship's 10.5%); the
composed-decoder leg attacked the decode slice.  This trace says what
the breakdown looks like AFTER that win, with op long-names saved to
JSON so the formatting ops can actually be identified instead of
guessed at.
"""
import glob
import gzip
import json
import os
import re
import sys
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def capture(trace_dir, lanes=2):
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    # exactly bench.bench_phased_chunked_fps(dtype='bfloat16', lanes=2,
    # composed_decoder='on') — the measured 712.9 maps/s configuration
    H, W, L, K = 256, 352, 8, 5
    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16",
        "use_phased_arch": True, "spatial_resolution": [H, W],
        "composed_decoder": "on"})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, lanes, H, W)
    rng = np.random.RandomState(0)
    t_all = np.cumsum(rng.uniform(0.001, 0.01, (L, 1, K + 1)),
                      axis=None).reshape(L, 1, K + 1).astype(np.float32)
    t_all = np.repeat(t_all, lanes, axis=1)
    seq = {"events_tcf": jnp.asarray(
               rng.randn(L, lanes, K, 5, H, W).astype(np.float32)),
           "image_tcf": jnp.asarray(
               rng.rand(L, lanes, 1, H, W).astype(np.float32)),
           "times_events_t": jnp.asarray(t_all[:, :, :K]),
           "times_image_t": jnp.asarray(t_all[:, :, K])}
    fwd = jax.jit(lambda p, s, q:
                  ERGB2DepthRecurrent.forward_sequence_batched_decode(
                      p, mcfg, s, q, allow_fused_decoder=True,
                      allow_composed=True))
    st, preds = fwd(params, state0, seq)  # compile outside trace
    jax.block_until_ready(preds)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            st, preds = fwd(params, st, seq)
        jax.block_until_ready(preds)
    return L, lanes


def summarize(trace_dir, L, lanes, n_iters=2):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    d = json.load(gzip.open(paths[-1]))
    evs = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {pid for pid, n in pids.items() if "TPU" in n}
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_cat = {}
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
        op_cat[e["name"]] = cat
        if "long_name" in a:
            longn[e["name"]] = a["long_name"][:300]
    per_pkg = 1e3 * n_iters * L  # us -> ms/package
    out = {
        "config": f"phased chunked bf16 composed lanes={lanes} L={L}",
        "wrapper_ms_per_package": round(top / per_pkg, 3) if top else None,
        "by_category_ms_per_package": {
            c: round(us / per_pkg, 3) for c, us in by_cat.most_common(14)},
        "top_ops": [
            {"name": nm, "cat": op_cat.get(nm, ""),
             "ms_per_package": round(us / per_pkg, 4),
             "long_name": longn.get(nm, "")}
            for nm, us in by_op.most_common(24)],
    }
    print(json.dumps(out["by_category_ms_per_package"], indent=1))
    for o in out["top_ops"][:16]:
        print(f"{o['ms_per_package']:8.4f}  [{o['cat']}] {o['name']}")
        print("      ", o["long_name"][:180])
    with open(os.path.join(HERE, "trace_phased_composed.json"), "w") as f:
        json.dump(out, f, indent=1)


def main():
    trace_dir = "/tmp/phased_composed_trace"
    L, lanes = capture(trace_dir)
    summarize(trace_dir, L, lanes)


if __name__ == "__main__":
    main()
