"""Ablate the sortseg kernel to find where its ~10 ms goes (TPU).

Variants (all INTENTIONALLY incorrect except 'full'): sort-only, kernel with
no while loop (single window pass), while loop with static store, full.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

N = 1_000_000
NB, H, W = 5, 260, 346
HWC = H * W
CELLS = NB * HWC
LANE = 128
SUB = 8


def timed_scalar(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return time.perf_counter() - t0


def per_iter(fn, args_lo, args_hi, n_lo, n_hi, repeats=3):
    timed_scalar(fn, *args_lo)
    lo = min(timed_scalar(fn, *args_lo) for _ in range(repeats))
    hi = min(timed_scalar(fn, *args_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def make_kernel(variant):
    def kernel(idx_ref, vl_ref, vr_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        sentinel = jnp.int32(2 ** 30)
        cell_iota = lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)

        for off, val_ref in ((0, vl_ref), (HWC, vr_ref)):
            idxs = [idx_ref[j, :] + off for j in range(SUB)]
            vals = [val_ref[j, :] for j in range(SUB)]
            lo0 = (jnp.min(idx_ref[...] + off) // LANE) * LANE

            def window(lo):
                vec = jnp.zeros((1, LANE), jnp.float32)
                nxt = sentinel
                for j in range(SUB):
                    rel = idxs[j][:, None] - lo
                    oh = rel == cell_iota
                    vec += jnp.sum(jnp.where(oh, vals[j][:, None], 0.0),
                                   axis=0, keepdims=True)
                    nxt = jnp.minimum(nxt, jnp.min(
                        jnp.where(rel >= LANE, idxs[j][:, None], sentinel)))
                return vec, nxt

            if variant == "nowhile":
                vec, nxt = window(lo0)
                out_ref[pl.dslice(lo0 // LANE, 1), :] += vec
            elif variant == "staticstore":
                def body(lo):
                    vec, nxt = window(lo)
                    out_ref[0:1, :] += vec
                    return jnp.where(nxt >= sentinel, sentinel,
                                     (nxt // LANE) * LANE)
                lax.while_loop(lambda lo: lo < sentinel, body, lo0)
            elif variant == "nostore":
                def body(carry):
                    lo, acc = carry
                    vec, nxt = window(lo)
                    return (jnp.where(nxt >= sentinel, sentinel,
                                      (nxt // LANE) * LANE), acc + vec)
                _, acc = lax.while_loop(lambda c: c[0] < sentinel, body,
                                        (lo0, jnp.zeros((1, LANE), jnp.float32)))
                out_ref[0:1, :] += acc
            else:  # full
                def body(lo):
                    vec, nxt = window(lo)
                    out_ref[pl.dslice(lo // LANE, 1), :] += vec
                    return jnp.where(nxt >= sentinel, sentinel,
                                     (nxt // LANE) * LANE)
                lax.while_loop(lambda lo: lo < sentinel, body, lo0)
    return kernel


def run_variant(variant, idx_s, vl_s, vr_s):
    rows_pad = ((CELLS + HWC + LANE - 1) // LANE + 7) // 8 * 8

    grid_spec = pl.GridSpec(
        grid=(idx_s.shape[0] // SUB,),
        in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((rows_pad, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(make_kernel(variant),
                       out_shape=jax.ShapeDtypeStruct((rows_pad, LANE), jnp.float32),
                       grid_spec=grid_spec)

    @jax.jit
    def run_n(idx, vl, vr, n):
        def body(i, carry):
            out = f(idx, vl.at[0, 0].add(carry * 1e-20), vr)
            return jnp.sum(out[0])
        return lax.fori_loop(0, n, body, jnp.float32(0))
    return per_iter(run_n, (idx_s, vl_s, vr_s, 1), (idx_s, vl_s, vr_s, 6), 1, 6)


def main():
    rng = np.random.RandomState(0)
    idx = np.sort(rng.randint(0, CELLS - HWC, N).astype(np.int32))
    vl = rng.randn(N).astype(np.float32)
    vr = rng.randn(N).astype(np.float32)
    pad = (-N) % (SUB * LANE)
    idx_s = jnp.asarray(np.pad(idx, (0, pad)).reshape(-1, LANE))
    vl_s = jnp.asarray(np.pad(vl, (0, pad)).reshape(-1, LANE))
    vr_s = jnp.asarray(np.pad(vr, (0, pad)).reshape(-1, LANE))

    results = {}
    # sort alone (1M, 3 operands)
    @jax.jit
    def sort_n(k, a, b, n):
        def body(i, carry):
            k2, a2, b2 = lax.sort((k, a + carry * 1e-30, b), num_keys=1)
            return a2[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))
    kk = jnp.asarray(idx)
    results["sort_1m_3op_ms"] = per_iter(
        sort_n, (kk, jnp.asarray(vl), jnp.asarray(vr), 1),
        (kk, jnp.asarray(vl), jnp.asarray(vr), 6), 1, 6) * 1e3

    for variant in ("nowhile", "staticstore", "nostore", "full"):
        try:
            results[variant + "_ms"] = run_variant(variant, idx_s, vl_s, vr_s) * 1e3
        except Exception as e:
            results[variant + "_error"] = str(e)[:200]
        print(variant, results.get(variant + "_ms"))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
