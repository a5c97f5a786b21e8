"""Hardware check + microbench of the fused Pallas upsample-conv decoder
kernel at the flagship decoder shapes (bf16), vs the XLA layer.

Parity: max |fused - xla| per shape.  Timing per PERF.md rules: N
iterations inside one jit with carry-dependent perturbation, two trip
counts differenced."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import json
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rpg_ramnet_tpu.models import layers as L
from rpg_ramnet_tpu.ops.upsample_conv import upsample_conv_fused, supports


def timed(fn, *a):
    t0 = time.perf_counter()
    v = float(np.asarray(fn(*a)).ravel()[0])
    return time.perf_counter() - t0


def per_iter(run_n, args, n_lo, n_hi, repeats=3):
    timed(run_n, *args, n_lo)
    lo = min(timed(run_n, *args, n_lo) for _ in range(repeats))
    hi = min(timed(run_n, *args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def main():
    # decoder shapes of the flagship streaming model at 256x512 (B = the
    # 96-deep chunked decode batch uses B=96; microbench at B=6 (per-pkg
    # batched decode) and B=96)
    shapes = [  # (B, H, W, C, Cout)
        (6, 32, 64, 256, 128),
        (6, 64, 128, 128, 64),
        (6, 128, 256, 64, 32),
    ]
    out = {}
    rng = np.random.RandomState(0)
    for (B, H, W, C, Cout) in shapes:
        key = f"{B}x{H}x{W}x{C}->{Cout}"
        p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), C, Cout, 5,
                                       None, jnp.float32)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
        sk = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
        assert supports(x, Cout), key

        ref = jax.jit(lambda p, x, sk: L.upsample_conv_layer_apply(
            p, x + sk, 2, "relu", None))
        fus = jax.jit(lambda p, x, sk: upsample_conv_fused(p, x, skip=sk))
        r = np.asarray(ref(p, x, sk)).astype(np.float32)
        f = np.asarray(fus(p, x, sk)).astype(np.float32)
        err = float(np.max(np.abs(r - f)))
        scale = float(np.max(np.abs(r)))
        out[key] = {"max_abs_err": err, "ref_max": scale}
        print(key, "err", err, "/", scale, flush=True)

        for name, fn in (("xla", ref), ("fused", fus)):
            @jax.jit
            def run_n(p, x, sk, n, _fn=fn):
                def body(i, acc):
                    xx = x + (acc * 1e-20).astype(x.dtype)
                    y = _fn(p, xx, sk)
                    return acc + jnp.sum(y.astype(jnp.float32))
                return lax.fori_loop(0, n, body, jnp.float32(0.0))
            sec = per_iter(run_n, (p, x, sk), 2, 32)
            out[key][name + "_us"] = sec * 1e6
            print(" ", name, round(sec * 1e6, 1), "us", flush=True)

    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "upsample_conv_hw.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
