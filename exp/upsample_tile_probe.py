"""tile_h sweep of the fused decoder kernel at B=96 layer-3 (the budget
model assumed 5 live rolled cat5 copies; if Mosaic reuses buffers, larger
tiles cut the 3x halo re-fetch traffic)."""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from rpg_ramnet_tpu.models import layers as L
from rpg_ramnet_tpu.ops import upsample_conv as U

def timed(fn, *a):
    t0 = time.perf_counter()
    float(np.asarray(fn(*a)).ravel()[0])
    return time.perf_counter() - t0

def per_iter(run_n, args, n_lo, n_hi, repeats=2):
    timed(run_n, *args, n_lo)
    lo = min(timed(run_n, *args, n_lo) for _ in range(repeats))
    hi = min(timed(run_n, *args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)

B, H, W, C, Cout = 96, 128, 256, 64, 32
rng = np.random.RandomState(0)
p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), C, Cout, 5, None,
                               jnp.float32)
x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
sk = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
out = {}
for th in (4, 8, 16):
    try:
        fn = lambda x, sk, _t=th: U.upsample_conv_fused(p, x, skip=sk,
                                                        tile_h=_t)
        # correctness spot check
        r = np.asarray(jax.jit(fn)(x, sk)[0, :4, :4, 0]).astype(np.float32)
        @jax.jit
        def run_n(x, sk, n, _f=fn):
            def body(i, acc):
                y = _f(x + (acc * 1e-20).astype(x.dtype), sk)
                return acc + jnp.sum(y.astype(jnp.float32))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        sec = per_iter(run_n, (x, sk), 2, 8)
        out[f"tile{th}"] = round(sec * 1e6, 1)
    except Exception as e:
        out[f"tile{th}"] = f"ERROR {str(e)[:160]}"
    print(json.dumps({f"tile{th}": out[f"tile{th}"]}), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "upsample_tile_probe.json"), "w") as f:
    json.dump(out, f, indent=1)
