#!/usr/bin/env python
"""Bisect WHICH pallas_call feature kills this rig's chipless AOT compile
helper (HTTP 500 / tpu_compile_helper subprocess exit code 1) on the
gru_pair / gru_stream programs, while every other Pallas program in the
suite compiles (PERF.md round 4).

Each probe is a MINIMAL kernel isolating one structural feature of the
failing programs.  Probes compile-and-run a tiny grid; a failure is caught
and recorded.  Writes exp/aot_bisect.json.

Features probed:
  base          single output, plain grid+BlockSpec (control — must pass)
  clamp         jnp.clip in the index map
  when          pl.when grid-position dispatch
  multi_same    TWO outputs, same block shapes
  multi_hetero  TWO outputs, different block shapes (the pair structure)
  hetero_full   multi_hetero + clamp + when (the full pair shape, tiny)
  prefetch      PrefetchScalarGridSpec, single output (the stream shape)
  prefetch_noalias   prefetch but without passing the same array 3x
  alias         plain grid, same input array passed twice
"""
import json
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform  # noqa: E402

ensure_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

T, W, C = 8, 128, 128
N = 4  # tiles


def run(name, fn, out):
    try:
        r = fn()
        ok = bool(np.all(np.isfinite(np.asarray(r[0] if isinstance(r, tuple)
                                                else r))))
        out[name] = "ok" if ok else "nonfinite"
        print(f"{name}: ok", file=sys.stderr)
    except Exception as e:
        out[name] = "FAIL: " + str(e)[:300]
        print(f"{name}: FAIL {str(e)[:160]}", file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "aot_bisect.json"), "w") as f:
        json.dump(out, f, indent=2)


x = jnp.asarray(np.random.RandomState(0).randn(N * T, W, C), jnp.bfloat16)
x2 = jnp.asarray(np.random.RandomState(1).randn(N * T, W, 2 * C),
                 jnp.bfloat16)


def k_copy(a, o):
    o[...] = a[...] * 2.0


def base():
    return pl.pallas_call(
        k_copy, grid=(N,),
        in_specs=[pl.BlockSpec((T, W, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N * T, W, C), x.dtype))(x)


def clamp():
    return pl.pallas_call(
        k_copy, grid=(2 * N,),
        in_specs=[pl.BlockSpec((T, W, C),
                               lambda i: (jnp.clip(i, 0, N - 1), 0, 0))],
        out_specs=pl.BlockSpec((T, W, C),
                               lambda i: (jnp.clip(i, 0, N - 1), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N * T, W, C), x.dtype))(x)


def k_when(a, o):
    i = pl.program_id(0)

    @pl.when(i < N)
    def _lo():
        o[...] = a[...] * 2.0

    @pl.when(i >= N)
    def _hi():
        o[...] = a[...] * 3.0


def when():
    return pl.pallas_call(
        k_when, grid=(2 * N,),
        in_specs=[pl.BlockSpec((T, W, C),
                               lambda i: (jnp.clip(i, 0, N - 1), 0, 0))],
        out_specs=pl.BlockSpec((T, W, C),
                               lambda i: (jnp.clip(i, 0, N - 1), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N * T, W, C), x.dtype))(x)


def k_two(a, b, o1, o2):
    o1[...] = a[...] * 2.0
    o2[...] = b[...] * 3.0


def multi_same():
    return pl.pallas_call(
        k_two, grid=(N,),
        in_specs=[pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((T, W, C), lambda i: (i, 0, 0))],
        out_specs=(pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                   pl.BlockSpec((T, W, C), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N * T, W, C), x.dtype),
                   jax.ShapeDtypeStruct((N * T, W, C), x.dtype)))(x, x)


def multi_hetero():
    return pl.pallas_call(
        k_two, grid=(N,),
        in_specs=[pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((T, W, 2 * C), lambda i: (i, 0, 0))],
        out_specs=(pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                   pl.BlockSpec((T, W, 2 * C), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N * T, W, C), x.dtype),
                   jax.ShapeDtypeStruct((N * T, W, 2 * C), x2.dtype)))(x, x2)


def k_two_when(a, b, o1, o2):
    i = pl.program_id(0)

    @pl.when(i < N)
    def _lo():
        o1[...] = a[...] * 2.0

    @pl.when(i >= N)
    def _hi():
        o2[...] = b[...] * 3.0


def hetero_full():
    m0 = lambda i: (jnp.clip(i, 0, N - 1), 0, 0)           # noqa: E731
    m1 = lambda i: (jnp.clip(i - N, 0, N - 1), 0, 0)       # noqa: E731
    return pl.pallas_call(
        k_two_when, grid=(2 * N,),
        in_specs=[pl.BlockSpec((T, W, C), m0),
                  pl.BlockSpec((T, W, 2 * C), m1)],
        out_specs=(pl.BlockSpec((T, W, C), m0),
                   pl.BlockSpec((T, W, 2 * C), m1)),
        out_shape=(jax.ShapeDtypeStruct((N * T, W, C), x.dtype),
                   jax.ShapeDtypeStruct((N * T, W, 2 * C), x2.dtype)))(x, x2)


S = 3
xs = jnp.asarray(np.random.RandomState(2).randn(S, N * T, W, C),
                 jnp.bfloat16)


def k_pref(s_ref, a, b, o):
    o[...] = a[...] + b[...]


def prefetch():
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N,),
        in_specs=[pl.BlockSpec((T, W, C), lambda i, s: (i, 0, 0)),
                  pl.BlockSpec((1, T, W, C), lambda i, s: (s[0], i, 0, 0))],
        out_specs=pl.BlockSpec((T, W, C), lambda i, s: (i, 0, 0)))
    sel = jnp.asarray([1], jnp.int32)

    def k(s_ref, a, b, o):
        o[...] = a[...] + b[0]

    return pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((N * T, W, C), x.dtype))(sel, x, xs)


def alias():
    return pl.pallas_call(
        k_two, grid=(N,),
        in_specs=[pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((T, W, C),
                               lambda i: (jnp.clip(i + 1, 0, N - 1), 0, 0))],
        out_specs=(pl.BlockSpec((T, W, C), lambda i: (i, 0, 0)),
                   pl.BlockSpec((T, W, C), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((N * T, W, C), x.dtype),
                   jax.ShapeDtypeStruct((N * T, W, C), x.dtype)))(x, x)


def main():
    out = {"device": str(jax.devices()[0])}
    run("base", base, out)
    run("clamp", clamp, out)
    run("when", when, out)
    run("multi_same", multi_same, out)
    run("multi_hetero", multi_hetero, out)
    run("hetero_full", hetero_full, out)
    run("prefetch", prefetch, out)
    run("alias", alias, out)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
