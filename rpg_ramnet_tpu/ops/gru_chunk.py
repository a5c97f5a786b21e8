"""Whole-chunk resident-state ConvGRU h-side Pallas kernel.

The chunked/precomputed streaming record path (model.forward_sequence_
precomputed) scans S = L*(K+1) sequential per-scale h-side GRU completions
per chunk.  The per-step fused cell (ops/gru_hside.py) still pays, per
step: ~11 HBM plane reads (h and gx re-read with neighbor-block halos),
one plane write, a custom-call entry, and its share of the XLA while-loop
overhead (~0.56 ms/pkg of the record trace is while-loop bookkeeping
around 1.07 ms of cell custom-calls, PERF.md round-3 re-profile).

This kernel runs ALL S steps of one scale in ONE pallas_call: the hidden
state h lives in a VMEM scratch buffer across the whole grid (TPU grids
execute sequentially; scratch persists), so per step the kernel only
streams the 3 x-side gate planes IN and the snapshot plane OUT — h itself
never touches HBM until it exits as the last snapshot:

    grid = (S+1, n_tiles)          # step-major; s==0 is the h0 load pass
    scratch hpad [H+4, W, C]       # h with 2 permanent zero border rows
    scratch stash [2, W, C]        # pre-overwrite boundary rows for the
                                   # next tile's top halo (single h buffer
                                   # instead of ping-pong: tile i
                                   # overwrites 2 rows tile i+1 needs old)

Per (step, tile): read h with a 2-row halo from scratch (+stash), do the
v1 cell math (ops/gru_hside._gru_cell_math), write h_new back to scratch
AND to the snapshot output.  The interleaved event/image schedule is
handled in-kernel: step m = s % (K+1) selects the events or image h-side
weights (disjoint params, statenet.py:141-198) — so the entire sequential
critical path of a chunk is 3 pallas_calls (one per scale), no lax.scan.

Inference-only (no VJP), bf16, batch==1 (the VMEM-resident h is per-lane;
the record path is single-stream).  Capability reference: the scan this
replaces is RAM_Net/model/model.py:176-217 stepped over test.py:207-384's
streaming loop; math per cell is RAM_Net/model/submodules.py:414-454.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru_hside import _conv9, _fold3

# Test hook (as ops/gru_hside._INTERPRET): run in interpret mode.
_INTERPRET = False


def _kernel(h0, gxz, gxr, gxr_top, gxr_bot, gxo, w_ur_ref, w_o_ref,
            snap_ref, hpad, stash, *, tile_h: int, H: int, W: int,
            C: int, K: int):
    s = pl.program_id(0)
    i = pl.program_id(1)
    t = tile_h

    @pl.when(s == 0)
    def _load():
        # h0 load pass: tile i of h0 -> scratch interior rows; tile 0 also
        # writes the permanent zero borders (top 2 / bottom 2 rows)
        hpad[pl.ds(2 + i * t, t)] = h0[0]
        # the load pass's out block is (0, i) — the same block s==1 visits
        # and overwrites with the real step-0 result.  Write a defined value
        # anyway: leaving it unwritten would flush uninitialized VMEM to HBM
        # and rely on the s==1 revisit's flush ORDER for correctness
        # (works on current Mosaic, but is unspecified semantics).
        snap_ref[0] = h0[0]

        @pl.when(i == 0)
        def _zero_borders():
            z = jnp.zeros((2, W, C), hpad.dtype)
            hpad[pl.ds(0, 2)] = z
            hpad[pl.ds(H + 2, 2)] = z

    @pl.when(s > 0)
    def _step():
        # events/image weights arrive pre-selected by the stacked weight
        # BlockSpecs' index maps (DMA refetch only when the modality
        # changes, 2x per package) — an in-kernel jnp.where select
        # measured ~10 us/grid-step of VPU traffic
        w_ur = w_ur_ref[0]
        w_o = w_o_ref[0]
        dt = hpad.dtype

        # h rows [i*t-2, i*t+t+2) in padded coords [i*t, i*t+t+4); the top
        # 2 rows were overwritten by tile i-1 this step — its pre-overwrite
        # values sit in stash (tile 0's top rows are the zero border, still
        # intact in hpad)
        hb_raw = hpad[pl.ds(i * t, t + 4)]
        top2 = jnp.where(i == 0, hb_raw[0:2], stash[...])
        hb = jnp.concatenate([top2, hb_raw[2:]], axis=0)

        ur = _conv9(hb, w_ur, t + 2, C).reshape(t + 2, W, 2 * C)
        gxr_full = jnp.concatenate([gxr_top[0, 0], gxr[0], gxr_bot[0, 0]],
                                   axis=0)
        r = jax.nn.sigmoid(ur[..., C:] + gxr_full.astype(jnp.float32))
        z = jax.nn.sigmoid(ur[1:t + 1, :, :C] + gxz[0].astype(jnp.float32))

        # border a rows are exact zeros (zero border rows of hpad), the
        # padding the reference conv sees; garbage r on the gxr halo at
        # image borders is killed by h == 0 there
        a = (r * hb[1:t + 3].astype(jnp.float32)).astype(dt)
        out_g = jnp.tanh(_conv9(a, w_o, t, C).reshape(t, W, C)
                         + gxo[0].astype(jnp.float32))
        h_int = hb[2:t + 2].astype(jnp.float32)
        h_new = (h_int * (1.0 - z) + out_g * z).astype(dt)

        # save the 2 rows tile i+1 still needs old BEFORE overwriting them
        stash[...] = hb[t:t + 2]
        hpad[pl.ds(2 + i * t, t)] = h_new
        snap_ref[0] = h_new


def _pick_tile(H: int, W: int, C: int) -> int:
    """Largest tile whose scratch + ~10 double-buffered streamed blocks +
    temps fit VMEM.  Lane padding: bf16 arrays with C < 128 on the minor
    dim occupy ceil(C/128)*128 lanes in VMEM."""
    cp = max(C, 128)
    scratch = (H + 4) * W * cp * 2
    for t in (16, 8, 4):
        if H % t:
            continue
        streams = 10 * t * W * cp * 2            # 5 blocks, double-buffered
        # ~2 lane-padded f32 cat-sized temps (anchored on the v1 kernel's
        # measured 2.9M of non-block VMEM at tile 16, flagship scale-0)
        temps = (t + 4) * W * cp * 8
        if scratch + streams + temps <= 14 * 1024 * 1024:
            return t
    return 0


def supports(h0) -> bool:
    """bf16, batch 1, aligned W/C, and a tile that fits VMEM."""
    if h0.ndim != 4 or h0.shape[0] != 1 or h0.dtype != jnp.bfloat16:
        return False
    _, H, W, C = h0.shape
    return W % 8 == 0 and C % 8 == 0 and _pick_tile(H, W, C) > 0


def _halo_rows(x, tile_h: int):
    """Zero-padded 1-row halo side-arrays for [S, H, W, C]: top[s, i] =
    x[s, i*t - 1] (zeros at i == 0), bot[s, i] = x[s, (i+1)*t] (zeros at
    the last tile)."""
    S, H, W, C = x.shape
    n = H // tile_h
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    top = xp[:, 0:H:tile_h][:, :, None]                  # rows i*t-1
    bot = xp[:, tile_h + 1::tile_h][:, :, None]          # rows (i+1)*t
    return top.reshape(S, n, 1, W, C), bot.reshape(S, n, 1, W, C)


@functools.partial(jax.jit, static_argnames=("K", "tile_h", "interpret"))
def _run_chunk(h0, gxz, gxr, gxo, w_ur_all, w_o_all, K, tile_h,
               interpret=False):
    S, H, W, C = gxz.shape
    n = H // tile_h
    t = tile_h
    gxr_top, gxr_bot = _halo_rows(gxr, t)
    sc = lambda s, i: (jnp.maximum(s - 1, 0), i, 0, 0)        # noqa: E731

    def wsel(s, i):
        # modality of compute step s-1: block 1 (image) on the last step of
        # each K+1 package, else block 0 (events)
        m = lax.rem(jnp.maximum(s - 1, 0), K + 1)
        return ((m == K).astype(jnp.int32), 0, 0, 0)

    blk = pl.BlockSpec((1, t, W, C), sc)
    halo = pl.BlockSpec((1, 1, 1, W, C),
                        lambda s, i: (jnp.maximum(s - 1, 0), i, 0, 0, 0))
    h0spec = pl.BlockSpec((1, t, W, C),
                          lambda s, i: (0, jnp.where(s == 0, i, 0), 0, 0))
    wspec_ur = pl.BlockSpec((1, 3, 3 * C, 2 * C), wsel)
    wspec_o = pl.BlockSpec((1, 3, 3 * C, C), wsel)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=t, H=H, W=W, C=C, K=K),
        out_shape=jax.ShapeDtypeStruct((S, H, W, C), h0.dtype),
        grid=(S + 1, n),
        in_specs=[h0spec, blk, blk, halo, halo, blk,
                  wspec_ur, wspec_o],
        out_specs=blk,
        scratch_shapes=[pltpu.VMEM((H + 4, W, C), h0.dtype),
                        pltpu.VMEM((2, W, C), h0.dtype)],
        interpret=interpret,
    )(h0, gxz, gxr, gxr_top, gxr_bot, gxo, w_ur_all, w_o_all)


def _hside_weights(p, C, dt):
    w_ur = _fold3(jnp.concatenate(
        [p["update_gate"]["weight"][:, :, -C:],
         p["reset_gate"]["weight"][:, :, -C:]], axis=-1)).astype(dt)
    w_o = _fold3(p["out_gate"]["weight"][:, :, -C:]).astype(dt)
    return w_ur, w_o


def conv_gru_hside_chunk(p_ev, p_im, gx_steps, h0, K: int,
                         tile_h: int = 0, interpret: bool = False):
    """All S sequential h-side ConvGRU completions of one scale in one
    pallas_call.

    p_ev / p_im: the scale's events / images ConvGRU param dicts;
    gx_steps: [S, H, W, 3C] precomputed x-side gates in step order —
    K event steps then the image step per package, biases folded in
    (layers.conv_gru_x_gates); h0: [1, H, W, C] initial super state.
    Returns the h trajectory [S, H, W, C] (the per-step decoder snapshots;
    row S-1 is the final super state).  Matches scanning
    layers.conv_gru_apply_hside to float tolerance (f32-accumulated)."""
    interpret = interpret or _INTERPRET
    C = h0.shape[-1]
    dt = h0.dtype
    t = tile_h or _pick_tile(h0.shape[1], h0.shape[2], C)
    w_ur_ev, w_o_ev = _hside_weights(p_ev, C, dt)
    w_ur_im, w_o_im = _hside_weights(p_im, C, dt)
    w_ur_all = jnp.stack([w_ur_ev, w_ur_im])
    w_o_all = jnp.stack([w_o_ev, w_o_im])
    return _run_chunk(h0, gx_steps[..., :C], gx_steps[..., C:2 * C],
                      gx_steps[..., 2 * C:], w_ur_all, w_o_all, K, t,
                      interpret)
