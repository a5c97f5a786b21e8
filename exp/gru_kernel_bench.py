"""Fused Pallas h-side GRU kernel vs the XLA path, per-cell at flagship
scales (sequential fori_loop, same harness as hside_microbench)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np


def bench_scale(H, W, C, fused, dtype="bfloat16", n_lo=32, n_hi=160):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_hside_fused
    from bench import _per_iter_seconds

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(1, H, W, C), dt)
    gx = jnp.asarray(rng.randn(1, H, W, 3 * C), dt)

    @jax.jit
    def run_n(p, h, gx, n):
        def body(i, h):
            g = gx + (i + 1).astype(dt) * jnp.asarray(1e-9, dt)
            if fused:
                return conv_gru_hside_fused(p, g, h)
            return L.conv_gru_apply_hside(p, g, h)
        h = lax.fori_loop(0, n, body, h)
        return jnp.sum(jnp.abs(h.astype(jnp.float32)))

    sec = _per_iter_seconds(run_n, (p, h0, gx, n_lo), (p, h0, gx, n_hi),
                            n_lo, n_hi)
    return sec * 1e6


def main():
    # correctness on hardware first (bf16 tolerance)
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_hside_fused
    rng = np.random.RandomState(1)
    C = 64
    p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    h = jnp.asarray(rng.randn(1, 128, 256, C), jnp.bfloat16)
    x = jnp.asarray(rng.randn(1, 128, 256, C), jnp.bfloat16)
    gx = L.conv_gru_x_gates(p, x)
    ref = np.asarray(L.conv_gru_apply_hside(p, gx, h), np.float32)
    got = np.asarray(conv_gru_hside_fused(p, gx, h), np.float32)
    err = float(np.max(np.abs(ref - got)))
    print("hw bf16 max diff", err, flush=True)

    out = {"hw_bf16_max_diff": err}
    for (H, W, C) in ((128, 256, 64), (64, 128, 128), (32, 64, 256)):
        for fused in (True, False):
            key = f"{H}x{W}x{C}_{'pallas' if fused else 'xla'}"
            out[key] = bench_scale(H, W, C, fused)
            print(key, round(out[key], 1), "us/cell", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
