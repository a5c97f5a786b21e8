"""TPU primitive measurements for voxelizer v2 design (VERDICT round-2 #4).

Question: can sort-by-cell + segment-sum beat the XLA scatter (72 Mev/s) and
the one-hot-matmul Pallas kernel (78 Mev/s) at 1M events (2M bilinear
contributions, 5x260x346 grid)?  This measures the candidate building blocks
in isolation on the real chip, with the loop-in-jit two-trip-count timing from
bench.py (PERF.md methodology — block_until_ready does not sync through the
tunnel).

Run: python exp/vox_primitives.py   (real TPU)
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 2_000_000            # contributions (2 per event at 1M events)
CELLS = 5 * 260 * 346    # 449_800 grid cells


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
    keys = jnp.asarray(rng.randint(0, CELLS, N).astype(np.int32))
    vals = jnp.asarray(rng.randn(N).astype(np.float32))
    sorted_keys = jnp.sort(keys)
    uniq_idx = jnp.asarray(
        rng.permutation(CELLS)[: min(CELLS, N)].astype(np.int32))
    uvals = jnp.asarray(rng.randn(uniq_idx.shape[0]).astype(np.float32))

    results = {}

    @jax.jit
    def sort_pairs_n(keys, vals, n):
        def body(i, carry):
            k2, v2 = lax.sort((keys, vals + carry * 1e-30), num_keys=1)
            return v2[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["sort_pairs_2m_ms"] = per_iter(
        sort_pairs_n, (keys, vals, 1), (keys, vals, 6), 1, 6) * 1e3

    @jax.jit
    def cumsum_n(vals, n):
        def body(i, carry):
            return jnp.cumsum(vals + carry * 1e-30)[-1]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["cumsum_2m_ms"] = per_iter(
        cumsum_n, (vals, 1), (vals, 10), 1, 10) * 1e3

    @jax.jit
    def searchsorted_n(sk, n):
        qs = jnp.arange(CELLS, dtype=jnp.int32)
        def body(i, carry):
            lo = jnp.searchsorted(sk, qs + (carry % 1), side="left")
            return lo[0] + carry * 0
        return lax.fori_loop(0, n, body, jnp.int32(0))

    results["searchsorted_450k_in_2m_ms"] = per_iter(
        searchsorted_n, (sorted_keys, 1), (sorted_keys, 4), 1, 4) * 1e3

    @jax.jit
    def scatter_unique_n(idx, uv, n):
        def body(i, carry):
            g = jnp.zeros((CELLS,), jnp.float32)
            g = g.at[idx].add(uv + carry * 1e-30, unique_indices=True,
                              indices_are_sorted=False)
            return g[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["scatter_unique_450k_ms"] = per_iter(
        scatter_unique_n, (uniq_idx, uvals, 1), (uniq_idx, uvals, 4), 1, 4) * 1e3

    @jax.jit
    def scatter_full_n(idx, v, n):
        def body(i, carry):
            g = jnp.zeros((CELLS,), jnp.float32)
            g = g.at[idx].add(v + carry * 1e-30)
            return g[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["scatter_colliding_2m_ms"] = per_iter(
        scatter_full_n, (keys, vals, 1), (keys, vals, 4), 1, 4) * 1e3

    # sorted-scatter: does indices_are_sorted help the colliding case?
    @jax.jit
    def scatter_sorted_n(idx, v, n):
        def body(i, carry):
            g = jnp.zeros((CELLS,), jnp.float32)
            g = g.at[idx].add(v + carry * 1e-30, indices_are_sorted=True)
            return g[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["scatter_colliding_sorted_2m_ms"] = per_iter(
        scatter_sorted_n, (sorted_keys, vals, 1), (sorted_keys, vals, 4),
        1, 4) * 1e3

    # segment boundary diff via gather (sorted keys): out[j] = csum[hi_j]-csum[lo_j]
    @jax.jit
    def sorted_diff_pipeline_n(keys, vals, n):
        """The full v2 candidate: sort + cumsum + searchsorted-diff."""
        qs = jnp.arange(CELLS, dtype=jnp.int32)
        def body(i, carry):
            k2, v2 = lax.sort((keys, vals + carry * 1e-30), num_keys=1)
            c = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(v2)])
            lo = jnp.searchsorted(k2, qs, side="left")
            hi = jnp.searchsorted(k2, qs, side="right")
            g = c[hi] - c[lo]
            return g[0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    results["v2_sort_cumsum_diff_total_ms"] = per_iter(
        sorted_diff_pipeline_n, (keys, vals, 1), (keys, vals, 4), 1, 4) * 1e3

    for k, v in results.items():
        print(f"{k}: {v:.3f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
