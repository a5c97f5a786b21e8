"""Event-stream -> voxel-grid binning (the framework's hot data kernel).

Semantics reference: RAM_Net/data_loader/dataset_asynchronous.py:253-298 and
RAM_Net/utils/event_tensor_utils.py:71-117 (numpy scatter-add with bilinear
interpolation in the time domain), plus the nonzero mean/std normalization of
RAM_Net/data_loader/event_dataset.py:144-151.

TPU-first design: scatter-add with colliding indices is the classic TPU pain
point, so the fast path reformulates voxelization as a *dense MXU problem*:
each chunk of E events becomes two one-hot factors (rows = bin*H + y, cols =
x, scaled by the bilinear value) whose product accumulates into the
[num_bins*H, W] grid — i.e. a [BH, E] x [E, W] matmul per chunk, which is
exactly what the 128x128 systolic array is for.  A Pallas kernel keeps the
accumulator resident in VMEM across the whole event stream (no HBM
round-trips per chunk).  An XLA scatter path (`.at[].add`) is kept as the
reference device implementation, and a vectorized numpy path for the host.

All device paths take fixed-shape, zero-padded event arrays plus an explicit
valid-count, so they are jit/scan/vmap friendly (static shapes).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# host (numpy) path — vectorized oracle, used by CPU data loading
# ---------------------------------------------------------------------------


def events_to_voxel_grid_np(events: np.ndarray, num_bins: int, height: int,
                            width: int) -> np.ndarray:
    """Vectorized numpy voxelizer; identical output to the reference's
    np.add.at implementation (dataset_asynchronous.py:253-298).

    events: [N, 4] rows (timestamp, x, y, polarity).  Does not mutate input.
    """
    assert events.ndim == 2 and events.shape[1] == 4
    grid = np.zeros(num_bins * height * width, np.float32)
    if events.shape[0] == 0:
        return grid.reshape(num_bins, height, width)

    t = events[:, 0].astype(np.float64)
    dt = t[-1] - t[0]
    if dt == 0:
        dt = 1.0
    ts = ((num_bins - 1) * (t - t[0]) / dt).astype(np.float32)
    xs = events[:, 1].astype(np.int64)
    ys = events[:, 2].astype(np.int64)
    pol = np.where(events[:, 3] == 0, -1.0, events[:, 3]).astype(np.float32)

    tis = ts.astype(np.int64)
    dts = ts - tis
    base = xs + ys * width
    # left + right bilinear contributions, one fused scatter
    idx = np.concatenate([base + tis * width * height,
                          base + (tis + 1) * width * height])
    val = np.concatenate([pol * (1.0 - dts), pol * dts])
    ok = np.concatenate([tis < num_bins, (tis + 1) < num_bins])
    np.add.at(grid, idx[ok], val[ok])
    return grid.reshape(num_bins, height, width)


def events_to_voxel_grid_host(events: np.ndarray, num_bins: int, height: int,
                              width: int, normalize: bool = False) -> np.ndarray:
    """Host voxelizer dispatcher: native C++ kernel when available
    (rpg_ramnet_tpu/native), numpy fallback.  Identical semantics."""
    try:
        from ..native import voxelize_native
        out = voxelize_native(events, num_bins, height, width, normalize)
        if out is not None:
            return out
    except Exception:
        pass
    grid = events_to_voxel_grid_np(events, num_bins, height, width)
    if normalize:
        grid = normalize_voxel_grid_np(grid)
    return grid


def normalize_voxel_grid_np(grid: np.ndarray) -> np.ndarray:
    """Nonzero mean/std normalization (event_dataset.py:144-151)."""
    mask = grid != 0
    n = mask.sum()
    if n > 0:
        vals = grid[mask]
        mean, std = vals.mean(), vals.std()
        if std > 0:
            out = grid.copy()
            out[mask] = (vals - mean) / std
            return out
    return grid


# ---------------------------------------------------------------------------
# shared device-side preprocessing
# ---------------------------------------------------------------------------


def _event_contributions(events, n_valid, num_bins: int, height: int, width: int):
    """events: [N, 4] (zero-padded), n_valid: scalar int.

    Returns (rows [2N] int32 in [0, num_bins*height), cols [2N] int32,
    vals [2N] f32) with invalid contributions mapped to (0, 0, 0.0).
    """
    n = events.shape[0]
    t = events[:, 0]
    first = t[0]
    last = lax.dynamic_index_in_dim(t, jnp.maximum(n_valid - 1, 0), keepdims=False)
    dt = last - first
    dt = jnp.where(dt == 0, 1.0, dt)
    ts = (num_bins - 1) * (t - first) / dt
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pol = jnp.where(events[:, 3] == 0, -1.0, events[:, 3]).astype(jnp.float32)

    tis = ts.astype(jnp.int32)  # trunc toward zero (ts >= 0)
    dts = ts - tis
    in_range = jnp.arange(n, dtype=jnp.int32) < n_valid

    row_base = ys  # row within a bin image
    left_rows = tis * height + row_base
    right_rows = (tis + 1) * height + row_base
    left_ok = in_range & (tis < num_bins)
    right_ok = in_range & ((tis + 1) < num_bins)

    rows = jnp.concatenate([jnp.where(left_ok, left_rows, 0),
                            jnp.where(right_ok, right_rows, 0)])
    cols = jnp.concatenate([jnp.where(left_ok, xs, 0),
                            jnp.where(right_ok, xs, 0)])
    vals = jnp.concatenate([jnp.where(left_ok, pol * (1.0 - dts), 0.0),
                            jnp.where(right_ok, pol * dts, 0.0)])
    return rows, cols, vals


# ---------------------------------------------------------------------------
# XLA scatter path (reference device implementation)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width"))
def events_to_voxel_grid_scatter(events, n_valid, *, num_bins: int,
                                 height: int, width: int):
    """jnp .at[].add scatter voxelizer — correct everywhere, slower on TPU."""
    rows, cols, vals = _event_contributions(events, n_valid, num_bins, height, width)
    flat_idx = rows * width + cols
    grid = jnp.zeros((num_bins * height * width,), jnp.float32)
    grid = grid.at[flat_idx].add(vals)
    return grid.reshape(num_bins, height, width)


# ---------------------------------------------------------------------------
# MXU one-hot matmul path (plain XLA formulation; also the Pallas kernel body)
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width", "chunk"))
def events_to_voxel_grid_matmul(events, n_valid, *, num_bins: int, height: int,
                                width: int, chunk: int = 512):
    """Dense MXU voxelizer in plain XLA: lax.scan over event chunks, each
    chunk contributing one_hot(rows)^T @ (vals * one_hot(cols))."""
    rows, cols, vals = _event_contributions(events, n_valid, num_bins, height, width)
    m = rows.shape[0]
    m_pad = _round_up(m, chunk)
    rows = jnp.pad(rows, (0, m_pad - m)).reshape(-1, chunk)
    cols = jnp.pad(cols, (0, m_pad - m)).reshape(-1, chunk)
    vals = jnp.pad(vals, (0, m_pad - m)).reshape(-1, chunk)
    bh = num_bins * height

    def step(acc, args):
        r, c, v = args
        oh_rows = (r[:, None] == jnp.arange(bh)[None, :]).astype(jnp.float32)
        p = v[:, None] * (c[:, None] == jnp.arange(width)[None, :]).astype(jnp.float32)
        acc = acc + lax.dot_general(oh_rows, p, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((bh, width), jnp.float32)
    acc, _ = lax.scan(step, acc0, (rows, cols, vals))
    return acc.reshape(num_bins, height, width)


# ---------------------------------------------------------------------------
# Pallas kernel: VMEM-resident accumulator, one-hot factors built in-kernel
# ---------------------------------------------------------------------------


_LANE = 128
_SUBCHUNKS = 8  # sub-rows per grid step; E = _SUBCHUNKS * _LANE events/step


def _make_voxel_kernel(factor_dtype):
    def _voxel_kernel(rows_ref, cols_ref, vals_ref, out_ref):
        """Grid step: 8 sub-batches of 128 events each; every sub-batch
        becomes two one-hot factors contracted on the MXU into the
        VMEM-resident [BH_pad, W_pad] accumulator.  Refs rows/cols/vals are
        [8, 128] blocks (TPU-tileable: sublane 8, lane 128).

        factor_dtype=bfloat16 doubles MXU rate; the one-hot factors are
        exact in bf16 (0/1) so only `vals` rounds (<=0.4% per contribution,
        mean-zero — the grid is nonzero-normalized downstream anyway)."""
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        bh_pad = out_ref.shape[0]
        w_pad = out_ref.shape[1]
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bh_pad), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANE, w_pad), 1)
        acc = jnp.zeros((bh_pad, w_pad), jnp.float32)
        for j in range(_SUBCHUNKS):
            rows = rows_ref[j, :]
            cols = cols_ref[j, :]
            vals = vals_ref[j, :]
            # build the 2D factors in f32, then cast: Mosaic only supports
            # minor-dim insertion (the [:, None] broadcasts) for 32-bit types
            oh_rows = (rows[:, None] == row_iota).astype(jnp.float32)
            p = vals[:, None] * (cols[:, None] == col_iota).astype(jnp.float32)
            acc += lax.dot_general(oh_rows.astype(factor_dtype),
                                   p.astype(factor_dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        out_ref[:] += acc
    return _voxel_kernel


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width",
                                             "factor_dtype"))
def events_to_voxel_grid_pallas(events, n_valid, *, num_bins: int, height: int,
                                width: int, factor_dtype=jnp.float32):
    """Pallas TPU voxelizer.  The [num_bins*H, W] accumulator stays resident
    in VMEM across the whole event stream; each grid step turns a chunk of
    events into two one-hot factors and feeds the MXU."""
    rows, cols, vals = _event_contributions(events, n_valid, num_bins, height, width)
    chunk = _SUBCHUNKS * _LANE
    m = rows.shape[0]
    m_pad = _round_up(m, chunk)
    n_chunks = m_pad // chunk
    rows = jnp.pad(rows, (0, m_pad - m)).reshape(-1, _LANE)
    cols = jnp.pad(cols, (0, m_pad - m)).reshape(-1, _LANE)
    vals = jnp.pad(vals, (0, m_pad - m)).reshape(-1, _LANE)

    bh = num_bins * height
    bh_pad = _round_up(bh, _LANE)
    w_pad = _round_up(width, _LANE)

    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_SUBCHUNKS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBCHUNKS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBCHUNKS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh_pad, w_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_voxel_kernel(factor_dtype),
        out_shape=jax.ShapeDtypeStruct((bh_pad, w_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * (bh_pad + w_pad) * _LANE,
            bytes_accessed=m_pad * 12 + bh_pad * w_pad * 4,
            transcendentals=0,
        ),
    )(rows, cols, vals)
    return out[:bh, :width].reshape(num_bins, height, width)


# ---------------------------------------------------------------------------
# sort + windowed segment-accumulate kernel ("sortseg", voxelizer v2)
# ---------------------------------------------------------------------------
#
# Why: the one-hot matmul kernel above is bound by one-hot FACTOR traffic,
# not the MXU — each 128-event sub-batch materializes [128, BH_pad] +
# [128, W_pad] f32 factors (~1.8 MB) => ~29 GB of VMEM traffic per 1M events
# (measured 13 ms, flat under every MXU-side sweep; exp/vox_primitives.py).
# Sorting the 2N bilinear contributions by flat cell index costs only ~3.7 ms
# on v5e (lax.sort, measured), after which each 128-contribution sub-batch
# touches a ~29-cell span on average, so a 128-cell one-hot window suffices:
# factor traffic drops ~11x and the accumulate becomes a [1, 128] row update
# at a dynamic offset.  Sparse/adversarial inputs (sub-batch spanning many
# windows) are handled by a data-dependent while loop that hops to the next
# populated 128-aligned window, so the kernel is correct for any input and
# fast exactly when the data is dense.


_SEG_SUB = 8   # sub-batches of 128 events per grid step
_SEG_WIN = 128  # window width in cells (one output row)


_SEG_STATIC_PASSES = 4  # unrolled window passes; covers >=4 populated windows


def _make_sortseg_kernel(hw: int, with_stats: bool = False):
    """hw = height*width: the right-bilinear contribution of a sorted event
    lands exactly one bin image later (flat idx + hw), so ONE sort of the
    events yields both sorted streams.

    Control-flow design (measured on v5e, exp/vox_kernel_probe.py): a
    data-dependent lax.while_loop in-kernel costs ~7.5 ms per 1M events ON
    ITS OWN, while the actual compare+accumulate work is ~2.3 ms.  So the
    common case (a sorted 1024-event chunk touches <= 4 populated 128-cell
    windows) runs as STATIC unrolled passes, and the while loop survives
    only as a pl.when-guarded tail that real event data never enters
    (it guarantees correctness for adversarially sparse inputs)."""
    def _sortseg_kernel(idx_ref, vl_ref, vr_ref, out_ref, *stats_refs):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        sentinel = jnp.int32(2 ** 30)
        # dedicated overflow window: an all-zero padding row past the last
        # real cell.  An exhausted pass "parks" there — real indices never
        # match it, so vec stays 0 and the store is harmless: no masks or
        # branches needed for the common static unroll.
        overflow = jnp.int32((out_ref.shape[0] - 1) * _LANE)
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _SEG_WIN), 1)

        for off, val_ref in ((0, vl_ref), (hw, vr_ref)):
            idxs = [idx_ref[j, :] + off for j in range(_SEG_SUB)]
            # v3 (round 3, +58% measured): the window reduce rides the MXU —
            # vec = vals_row @ onehot — instead of the VPU select+sum.  The
            # one-hot is EXACT in the MXU's bf16 operand passes; the values
            # are hi/lo-split into two bf16-exact dots so the accumulation
            # stays f32-accurate (~2^-17 rel, vs 1.2e-2 for a single
            # default-precision f32 dot — measured, exp/vox_v3_probe.py).
            vrow = jnp.concatenate(
                [val_ref[j, :][None, :] for j in range(_SEG_SUB)], axis=1)
            vhi = vrow.astype(jnp.bfloat16).astype(jnp.float32)
            vlo = vrow - vhi
            lo0 = (jnp.min(idx_ref[...] + off) // _SEG_WIN) * _SEG_WIN

            def window_pass(lo):
                """Accumulate every contribution inside [lo, lo+WIN) and
                return the aligned start of the next populated window
                (the overflow row when exhausted)."""
                ohs = []
                nxt = sentinel
                for j in range(_SEG_SUB):
                    rel = idxs[j][:, None] - lo              # [128, 1]
                    ohs.append((rel == cell_iota).astype(jnp.float32))
                    nxt = jnp.minimum(nxt, jnp.min(
                        jnp.where(rel >= _SEG_WIN, idxs[j][:, None], sentinel)))
                oh = jnp.concatenate(ohs, axis=0)            # [1024, WIN]
                vec = jnp.dot(vhi, oh, preferred_element_type=jnp.float32) \
                    + jnp.dot(vlo, oh, preferred_element_type=jnp.float32)
                out_ref[pl.dslice(lo // _LANE, _SEG_WIN // _LANE), :] += \
                    vec.reshape(_SEG_WIN // _LANE, _LANE)
                return jnp.where(nxt >= sentinel, overflow,
                                 (nxt // _SEG_WIN) * _SEG_WIN)

            # first pass always populated; later static passes SKIP their
            # work once the chunk is exhausted (lax.cond — measured +21%
            # over unconditional unroll: real chunks span ~2-3 windows)
            lo = window_pass(lo0)
            for _ in range(_SEG_STATIC_PASSES - 1):
                lo = jax.lax.cond(lo < overflow, window_pass,
                                  lambda l: l, lo)

            @pl.when(lo < overflow)
            def _():  # sparse-input correctness tail (never hit by real data)
                jax.lax.while_loop(lambda l: l < overflow, window_pass, lo)

        if with_stats:
            # fused nonzero-normalization STATS (event_dataset.py:144-151
            # semantics): at the last chunk the full grid sits in VMEM, so
            # the masked count/sum/sumsq reduction is free of the extra HBM
            # grid read a separate XLA pass would pay.  Padding cells are
            # zero -> excluded by the mask automatically.
            @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
            def _():
                g = out_ref[:]
                mask = g != 0.0
                n = jnp.sum(mask.astype(jnp.float32))
                sm = jnp.sum(jnp.where(mask, g, 0.0))
                s2 = jnp.sum(jnp.where(mask, g * g, 0.0))
                stats_refs[0][:] = jnp.stack(
                    [jnp.full((_LANE,), n, jnp.float32),
                     jnp.full((_LANE,), sm, jnp.float32),
                     jnp.full((_LANE,), s2, jnp.float32),
                     jnp.zeros((_LANE,), jnp.float32),
                     jnp.zeros((_LANE,), jnp.float32),
                     jnp.zeros((_LANE,), jnp.float32),
                     jnp.zeros((_LANE,), jnp.float32),
                     jnp.zeros((_LANE,), jnp.float32)])
    return _sortseg_kernel


def sortseg_prep(events, n_valid, *, num_bins: int, height: int, width: int):
    """Everything the sortseg voxelizer does BEFORE its Pallas sweep: the
    bilinear time split into left/right contribution streams, the ONE global
    lax.sort by flat left-cell index, and the chunk padding/reshape.  Exposed
    separately so the benchmark can report the sort+prep vs kernel-sweep
    split (the global sort is the design's roofline term — PERF.md)."""
    n = events.shape[0]
    t = events[:, 0]
    first = t[0]
    last = lax.dynamic_index_in_dim(t, jnp.maximum(n_valid - 1, 0), keepdims=False)
    dt = jnp.where(last == first, 1.0, last - first)
    ts = (num_bins - 1) * (t - first) / dt
    xs = events[:, 1].astype(jnp.int32)
    ys = events[:, 2].astype(jnp.int32)
    pol = jnp.where(events[:, 3] == 0, -1.0, events[:, 3]).astype(jnp.float32)
    tis = ts.astype(jnp.int32)
    dts = ts - tis
    in_range = jnp.arange(n, dtype=jnp.int32) < n_valid

    hw = height * width
    left_idx = tis * hw + ys * width + xs
    left_ok = in_range & (tis < num_bins)
    # invalid left: park at cell 0 with 0.0; the right stream (idx+hw) then
    # hits cell hw, also with 0.0 — harmless either way
    left_idx = jnp.where(left_ok, left_idx, 0)
    val_l = jnp.where(left_ok, pol * (1.0 - dts), 0.0)
    right_ok = in_range & ((tis + 1) < num_bins)
    val_r = jnp.where(right_ok, pol * dts, 0.0)

    idx_s, vl_s, vr_s = lax.sort((left_idx, val_l, val_r), num_keys=1)

    chunk = _SEG_SUB * _LANE
    m_pad = _round_up(n, chunk)
    idx_s = jnp.pad(idx_s, (0, m_pad - n)).reshape(-1, _LANE)
    vl_s = jnp.pad(vl_s, (0, m_pad - n)).reshape(-1, _LANE)
    vr_s = jnp.pad(vr_s, (0, m_pad - n)).reshape(-1, _LANE)
    return idx_s, vl_s, vr_s


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width",
                                             "with_stats"))
def events_to_voxel_grid_sortseg(events, n_valid, *, num_bins: int,
                                 height: int, width: int,
                                 with_stats: bool = False):
    """Voxelizer v2: ONE sort of the events by left-contribution cell (the
    right-bilinear stream is the same order at +height*width), then a Pallas
    kernel sweeps narrow cell windows over each sorted chunk — a
    data-dependent while loop hops across empty windows, so sparse inputs
    stay correct and dense inputs take ~2-3 window passes per 1024 events."""
    n = events.shape[0]
    hw = height * width
    cells = num_bins * hw
    idx_s, vl_s, vr_s = sortseg_prep(events, n_valid, num_bins=num_bins,
                                     height=height, width=width)
    chunk = _SEG_SUB * _LANE
    m_pad = _round_up(n, chunk)
    n_chunks = m_pad // chunk

    # one extra padding row past the last real cell serves as the kernel's
    # overflow window (parked zero-value contributions also land in padding)
    rows_out = _round_up(cells, _LANE) // _LANE + 1
    rows_pad = _round_up(rows_out, 8)

    grid_out_spec = pl.BlockSpec((rows_pad, _LANE), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows_pad, _LANE), jnp.float32)
    out_specs = grid_out_spec
    if with_stats:
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, _LANE), jnp.float32))
        out_specs = (grid_out_spec,
                     pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((_SEG_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SEG_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SEG_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        _make_sortseg_kernel(hw, with_stats=with_stats),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * _SEG_WIN,
            bytes_accessed=m_pad * 12 + rows_pad * _LANE * 4,
            transcendentals=0,
        ),
    )(idx_s, vl_s, vr_s)
    if with_stats:
        out, stats = out
        grid = out.reshape(-1)[:cells].reshape(num_bins, height, width)
        return grid, (stats[0, 0], stats[1, 0], stats[2, 0])
    return out.reshape(-1)[:cells].reshape(num_bins, height, width)


# ---------------------------------------------------------------------------
# normalization (device) and the fused default entry point
# ---------------------------------------------------------------------------


@jax.jit
def normalize_voxel_grid(grid, stats=None):
    """Nonzero mean/std normalization as a jitted masked reduction
    (TPU has no boolean indexing; event_dataset.py:144-151 semantics).
    stats: optional (count, sum, sumsq) precomputed by the sortseg
    kernel's fused epilogue (with_stats=True) — skips the reduction's
    extra grid read."""
    if stats is not None:
        n, s, s2 = stats
    else:
        mask0 = grid != 0
        n = jnp.sum(mask0)
        s = jnp.sum(jnp.where(mask0, grid, 0.0), dtype=jnp.float32)
        s2 = jnp.sum(jnp.where(mask0, grid * grid, 0.0), dtype=jnp.float32)
    mask = grid != 0
    mean = s / jnp.maximum(n, 1)
    var = s2 / jnp.maximum(n, 1) - mean * mean
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    ok = (n > 0) & (std > 0)
    normed = jnp.where(mask, (grid - mean) / jnp.where(ok, std, 1.0), grid)
    return jnp.where(ok, normed, grid)


def events_to_voxel_grid(events, n_valid=None, *, num_bins: int, height: int,
                         width: int, backend: str = "auto"):
    """Canonical voxelizer entry point.

    backend: 'auto' (sortseg on TPU, scatter elsewhere) | 'sortseg' |
             'pallas' | 'matmul' | 'scatter'.

    Measured at 1M events, 5x260x346 grid on v5e (exp/vox_v2_bench.py):
    sortseg 164 Mev/s, pallas one-hot 77, XLA scatter 73 — the sort +
    windowed segment-accumulate kernel is 2.2x the scatter baseline.
    """
    events = jnp.asarray(events)
    if n_valid is None:
        n_valid = events.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)
    if backend == "auto":
        backend = "sortseg" if jax.default_backend() not in ("cpu",) else "scatter"
    fn = {
        "sortseg": events_to_voxel_grid_sortseg,
        "pallas": events_to_voxel_grid_pallas,
        "matmul": events_to_voxel_grid_matmul,
        "scatter": events_to_voxel_grid_scatter,
    }[backend]
    return fn(events, n_valid, num_bins=num_bins, height=height, width=width)
