"""Voxelizer v3 probe (round-3 verdict item 5): replace the window pass's
VPU select+reduce with an MXU dot against the one-hot (f32: exact), and
skip exhausted static passes.  Compares correctness + speed vs shipped
sortseg at the standard 1M-event benchmark point."""
import os, sys, json, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpg_ramnet_tpu.ops import voxel as V

_LANE = 128
_SEG_SUB = 8
_SEG_WIN = 128
_PASSES = 4


def _make_v3_kernel(hw: int, skip_exhausted: bool):
    def kern(idx_ref, vl_ref, vr_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        sentinel = jnp.int32(2 ** 30)
        overflow = jnp.int32((out_ref.shape[0] - 1) * _LANE)
        cell_iota = jax.lax.broadcasted_iota(
            jnp.int32, (_LANE, _SEG_WIN), 1)

        for off, val_ref in ((0, vl_ref), (hw, vr_ref)):
            idxs = [idx_ref[j, :] + off for j in range(_SEG_SUB)]
            # loop-invariant [1, 1024] row of values (lane concat)
            vals_row = jnp.concatenate(
                [val_ref[j, :][None, :] for j in range(_SEG_SUB)], axis=1)
            lo0 = (jnp.min(idx_ref[...] + off) // _SEG_WIN) * _SEG_WIN

            def window_pass(lo):
                ohs = []
                nxt = sentinel
                for j in range(_SEG_SUB):
                    rel = idxs[j][:, None] - lo             # [128, 1]
                    ohs.append((rel == cell_iota).astype(jnp.float32))
                    nxt = jnp.minimum(nxt, jnp.min(
                        jnp.where(rel >= _SEG_WIN, idxs[j][:, None],
                                  sentinel)))
                oh = jnp.concatenate(ohs, axis=0)           # [1024, WIN]
                vec = jnp.dot(vals_row, oh,
                              preferred_element_type=jnp.float32)  # [1, WIN]
                out_ref[pl.dslice(lo // _LANE, _SEG_WIN // _LANE), :] += \
                    vec.reshape(_SEG_WIN // _LANE, _LANE)
                return jnp.where(nxt >= sentinel, overflow,
                                 (nxt // _SEG_WIN) * _SEG_WIN)

            lo = lo0
            for k in range(_PASSES):
                if skip_exhausted and k > 0:
                    lo = jax.lax.cond(lo < overflow, window_pass,
                                      lambda l: l, lo)
                else:
                    lo = window_pass(lo)

            @pl.when(lo < overflow)
            def _():
                jax.lax.while_loop(lambda l: l < overflow, window_pass, lo)
    return kern


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width",
                                             "skip_exhausted"))
def vox_v3(events, n_valid, *, num_bins, height, width,
           skip_exhausted=False):
    n = events.shape[0]
    t = events[:, 0]
    first = t[0]
    last = lax.dynamic_index_in_dim(t, jnp.maximum(n_valid - 1, 0),
                                    keepdims=False)
    dt = jnp.where(last == first, 1.0, last - first)
    ts = (num_bins - 1) * (t - first) / dt
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pol = jnp.where(events[:, 3] == 0, -1.0, events[:, 3]).astype(jnp.float32)
    tis = ts.astype(jnp.int32)
    dts = ts - tis
    in_range = jnp.arange(n, dtype=jnp.int32) < n_valid
    hw = height * width
    cells = num_bins * hw
    left_idx = tis * hw + ys * width + xs
    left_ok = in_range & (tis < num_bins)
    left_idx = jnp.where(left_ok, left_idx, 0)
    val_l = jnp.where(left_ok, pol * (1.0 - dts), 0.0)
    right_ok = in_range & ((tis + 1) < num_bins)
    val_r = jnp.where(right_ok, pol * dts, 0.0)
    idx_s, vl_s, vr_s = lax.sort((left_idx, val_l, val_r), num_keys=1)
    chunk = _SEG_SUB * _LANE
    m_pad = -(-n // chunk) * chunk
    idx_s = jnp.pad(idx_s, (0, m_pad - n)).reshape(-1, _LANE)
    vl_s = jnp.pad(vl_s, (0, m_pad - n)).reshape(-1, _LANE)
    vr_s = jnp.pad(vr_s, (0, m_pad - n)).reshape(-1, _LANE)
    rows_out = -(-cells // _LANE) + 1
    rows_pad = -(-rows_out // 8) * 8
    out = pl.pallas_call(
        _make_v3_kernel(hw, skip_exhausted),
        out_shape=jax.ShapeDtypeStruct((rows_pad, _LANE), jnp.float32),
        grid=(m_pad // chunk,),
        in_specs=[pl.BlockSpec((_SEG_SUB, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((rows_pad, _LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(idx_s, vl_s, vr_s)
    return out.reshape(-1)[:cells].reshape(num_bins, height, width)


def timed(fn, *a):
    t0 = time.perf_counter()
    float(np.asarray(fn(*a)).ravel()[0])
    return time.perf_counter() - t0


def per_iter(run_n, args, n_lo, n_hi, repeats=2):
    timed(run_n, *args, n_lo)
    lo = min(timed(run_n, *args, n_lo) for _ in range(repeats))
    hi = min(timed(run_n, *args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def main():
    n_events, NB, H, W = 1_000_000, 5, 260, 346
    rng = np.random.RandomState(0)
    t = np.sort(rng.uniform(0, 0.05, n_events))
    ev = np.stack([t, rng.randint(0, W, n_events).astype(np.float64),
                   rng.randint(0, H, n_events).astype(np.float64),
                   rng.randint(0, 2, n_events).astype(np.float64)], axis=1)
    ev32 = jnp.asarray(ev.astype(np.float32))
    nv = jnp.int32(n_events)

    # correctness vs shipped sortseg
    a = V.events_to_voxel_grid_sortseg(ev32, nv, num_bins=NB, height=H, width=W)
    b = vox_v3(ev32, nv, num_bins=NB, height=H, width=W)
    err = float(jnp.max(jnp.abs(a - b)))
    print("v3 vs sortseg max err:", err, flush=True)
    assert err < 0.05  # bf16-pass MXU dot: hi/lo split would recover f32 if v3 wins

    out = {}
    variants = {
        "sortseg_shipped": lambda e, n: V.events_to_voxel_grid_sortseg(
            e, n, num_bins=NB, height=H, width=W),
        "v3_mxu": lambda e, n: vox_v3(e, n, num_bins=NB, height=H, width=W),
        "v3_mxu_skip": lambda e, n: vox_v3(e, n, num_bins=NB, height=H,
                                           width=W, skip_exhausted=True),
    }
    for name, kern in variants.items():
        @jax.jit
        def run_n(events, n_valid, n, _k=kern):
            def body(i, carry):
                e = events.at[0, 0].add(carry * 1e-20)
                g = _k(e, n_valid)
                return jnp.sum(jnp.abs(g))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        sec = per_iter(run_n, (ev32, nv), 1, 6)
        out[name] = round(n_events / sec / 1e6, 1)
        print(name, out[name], "Mev/s", flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "vox_v3_results.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
