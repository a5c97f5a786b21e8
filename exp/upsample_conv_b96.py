"""Per-layer fused-decoder microbench at the CHUNKED decode batch depth
(B=96) + isolated _col_upsample cost: find where the e2e regression
(810 -> 716 maps/s) comes from."""
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


def bench_fn(fn, args, n_lo=2, n_hi=8):
    @jax.jit
    def run_n(*a):
        *xs, n = a
        def body(i, acc):
            y = fn(*[x + (acc * 1e-20).astype(x.dtype) if j == 0 else x
                     for j, x in enumerate(xs)])
            return acc + jnp.sum(y.astype(jnp.float32))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    return per_iter(run_n, args, n_lo, n_hi)


shapes = [(96, 32, 64, 256, 128), (96, 64, 128, 128, 64),
          (96, 128, 256, 64, 32)]
out = {}
rng = np.random.RandomState(0)
for (B, H, W, C, Cout) in shapes:
    key = f"{B}x{H}x{W}x{C}->{Cout}"
    p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), C, Cout, 5,
                                   None, jnp.float32)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    sk = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    out[key] = {}
    out[key]["xla_us"] = bench_fn(
        lambda x, sk, p=p: L.upsample_conv_layer_apply(p, x + sk, 2, "relu", None),
        (x, sk)) * 1e6
    out[key]["fused_us"] = bench_fn(
        lambda x, sk, p=p: U.upsample_conv_fused(p, x, skip=sk), (x, sk)) * 1e6
    out[key]["colup_us"] = bench_fn(
        lambda x, sk: U._col_upsample(x + sk), (x, sk)) * 1e6
    print(key, json.dumps(out[key]), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "upsample_conv_b96.json"), "w") as f:
    json.dump(out, f, indent=1)
