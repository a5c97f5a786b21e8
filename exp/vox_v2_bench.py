"""Benchmark voxelizer v2 (sortseg) vs v1 (one-hot MXU) vs XLA scatter on the
real TPU at the BASELINE operating point (1M events, 5x260x346), plus a
correctness check against the numpy oracle.  Loop-in-jit timing (PERF.md)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
from rpg_ramnet_tpu.ops import voxel as V

N = 1_000_000
NB, H, W = 5, 260, 346


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


def main():
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0, 0.05, N))
    ev = np.stack([t, rng.randint(0, W, N).astype(np.float64),
                   rng.randint(0, H, N).astype(np.float64),
                   rng.randint(0, 2, N).astype(np.float64)], axis=1)
    ev32 = jnp.asarray(ev.astype(np.float32))
    nv = jnp.int32(N)

    oracle = V.events_to_voxel_grid_np(ev.copy(), NB, H, W)
    got = np.asarray(V.events_to_voxel_grid_sortseg(
        ev32, nv, num_bins=NB, height=H, width=W))
    err = np.abs(got - oracle).max()
    print("sortseg max err vs oracle on TPU:", err)
    assert err < 2e-2, err  # f32 accumulation order differences only

    results = {}
    for name, kern in (("sortseg", V.events_to_voxel_grid_sortseg),
                       ("pallas_v1", V.events_to_voxel_grid_pallas),
                       ("scatter", V.events_to_voxel_grid_scatter)):
        @jax.jit
        def run_n(events, n_valid, n, _kern=kern):
            def body(i, carry):
                e = events.at[0, 0].add(carry * 1e-20)
                g = _kern(e, n_valid, num_bins=NB, height=H, width=W)
                return jnp.sum(jnp.abs(g))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        sec = per_iter(run_n, (ev32, nv, 1), (ev32, nv, 6), 1, 6)
        results[name + "_mevs"] = N / sec / 1e6
        print(f"{name}: {N / sec / 1e6:.1f} Mev/s ({sec*1e3:.2f} ms)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
