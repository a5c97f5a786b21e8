"""Microbenchmark the sequential ConvGRU h-side cell under XLA: µs per cell
per scale at flagship shapes, vs the HBM roofline, to size the opportunity
for a fused Pallas kernel."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np


def bench_scale(H, W, C, dtype="bfloat16", n_lo=32, n_hi=160):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.models import layers as L
    from bench import _per_iter_seconds

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    key = jax.random.PRNGKey(0)
    p = L.conv_gru_init(key, C, C, 3, jnp.float32)
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(1, H, W, C), dt)
    gx = jnp.asarray(rng.randn(1, H, W, 3 * C), dt)

    @jax.jit
    def run_n(p, h, gx, n):
        def body(i, h):
            # sequential dependency: h feeds the next cell; gx perturbed so
            # nothing hoists
            return L.conv_gru_apply_hside(
                p, gx + (i + 1).astype(dt) * jnp.asarray(1e-9, dt), h)
        h = lax.fori_loop(0, n, body, h)
        return jnp.sum(jnp.abs(h.astype(jnp.float32)))

    sec = _per_iter_seconds(run_n, (p, h0, gx, n_lo), (p, h0, gx, n_hi),
                            n_lo, n_hi)
    bytes_min = (H * W * C * 2 +        # h read (reused by both convs)
                 H * W * 3 * C * 2 +    # gx read
                 H * W * C * 2)         # h' write
    if dtype == "float32":
        bytes_min = bytes_min * 2
    return {"us_per_cell": sec * 1e6,
            "roofline_us": bytes_min / 819e9 * 1e6,
            "min_mb": bytes_min / 1e6}


def main():
    out = {}
    for (H, W, C) in ((128, 256, 64), (64, 128, 128), (32, 64, 256)):
        r = bench_scale(H, W, C)
        out[f"scale_{H}x{W}x{C}"] = r
        print(f"{H}x{W}x{C}", {k: round(v, 2) for k, v in r.items()},
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
