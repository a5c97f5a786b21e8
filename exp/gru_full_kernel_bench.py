"""Full fused ConvGRU cell (x+h in-kernel, K=6C) vs XLA conv_gru_apply,
per cell at flagship scales — the per-package latency path's cell."""
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
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_full_fused
    from bench import _per_iter_seconds

    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    rng = np.random.RandomState(0)
    h0 = jnp.asarray(rng.randn(1, H, W, C), dt)
    x = jnp.asarray(rng.randn(1, H, W, C), dt)

    @jax.jit
    def run_n(p, h, x, n):
        def body(i, h):
            xi = x + (i + 1).astype(dt) * jnp.asarray(1e-9, dt)
            if fused:
                return conv_gru_full_fused(p, xi, h)
            return L.conv_gru_apply(p, xi, h)
        h = lax.fori_loop(0, n, body, h)
        return jnp.sum(jnp.abs(h.astype(jnp.float32)))

    sec = _per_iter_seconds(run_n, (p, h0, x, n_lo), (p, h0, x, n_hi),
                            n_lo, n_hi)
    return sec * 1e6


def main():
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_full_fused
    # hardware correctness first
    rng = np.random.RandomState(1)
    C = 64
    p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    h = jnp.asarray(rng.randn(1, 128, 256, C), jnp.bfloat16)
    x = jnp.asarray(rng.randn(1, 128, 256, C), jnp.bfloat16)
    ref = np.asarray(L.conv_gru_apply(p, x, h), np.float32)
    got = np.asarray(conv_gru_full_fused(p, x, h), np.float32)
    err = float(np.max(np.abs(ref - got)))
    print("hw bf16 max diff", err, flush=True)

    out = {"hw_bf16_max_diff": err}
    for (H, W, C) in ((128, 256, 64), (64, 128, 128), (32, 64, 256)):
        for fused in (True, False):
            key = f"{H}x{W}x{C}_{'pallas' if fused else 'xla'}"
            try:
                out[key] = bench_scale(H, W, C, fused)
            except Exception as e:  # noqa: BLE001
                out[key] = f"error: {str(e)[:120]}"
            print(key, out[key], flush=True)
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
