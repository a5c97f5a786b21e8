"""Fused bilinear-2x-upsample + 5x5 conv (+skip +bias +ReLU) Pallas kernel.

STATUS (round 3): OPT-IN ONLY (`model.fused_decoder='on'`) — a measured
in-context dead-end on v5e.  The kernel is exact (bf16-eps on hardware)
and wins isolated per-layer microbenches at small batch (up to 1.94x at
B=6, exp/upsample_conv_hw.json), but loses end-to-end everywhere it was
tried: chunked record 810 -> 716 maps/s, latency mode 494 -> 271 — XLA's
conv amortizes with batch while the VMEM-budgeted tiles cannot grow, the
column-upsample interleave pass is expensive, and custom-call operand
boundaries force relayouts (PERF.md §"the fused decoder kernel dead-end").
The bench parity guard still executes it every run.

The motivation: the decoder is ~57% of streaming package time and its top
trace category is XLA layout copies around the 5x5 narrow-channel convs
(PERF.md): the UpsampleConvLayer (reference submodules.py:69-97 —
F.interpolate(x2, bilinear, align_corners=False) then Conv2d(k=5, pad=2))
materializes the 2x tensor in HBM and pays operand relayouts on both
sides.  This kernel computes the whole layer in ONE pass over H-tiles:

* the 2x ROW upsample is composed into the conv weights: output hi-res row
  2i+p is a 4-tap conv over LOW-res rows with the phase kernel
  kr_p = S_p @ w (S matrices from layers._phase_kernels — the same
  subpixel math, row dimension only).  Both row phases ride ONE MXU dot
  (outputs stacked on the channel dim, M = 2*Cout), and land in a
  phase-planar output [B, H, 2, 2W, Cout] whose reshape to
  [B, 2H, 2W, Cout] is a free leading-dim merge — no strided scatter
  (the HBM-level phase stitch is what made the round-1 subpixel decoder
  LOSE, PERF.md).
* the 2x COLUMN upsample runs OUTSIDE the kernel as one cheap XLA
  bandwidth pass producing v [B, H, 2W, C] (lo rows x hi cols; Mosaic has
  no sublane interleave, so in-kernel doubling is not lowerable) — still
  half the HBM traffic of materializing the full 2x tensor, and the skip
  sum + resize edge clamp fuse into it.
* 4 row taps fold into the contraction dim (K=5C with one zero slot per
  phase — 83% MXU contraction fill at C=64 vs 50% for per-tap dots), 5
  column taps are masked sublane rolls, reproducing the conv's zero
  padding exactly.
* the conv's zero padding at the top/bottom HI-res rows differs from the
  row-phase kernels' edge-clamp halo; exact rank-1-in-rows corrections are
  applied to the first/last output rows in-kernel.
* the skip-connection sum (skip_type='sum'), bias and ReLU fuse in.

Accumulates in f32.  bf16 operands on hardware (VMEM budget);
interpret-mode tests validate the math in f32.

Capability reference: RAM_Net/model/submodules.py:69-97 (UpsampleConvLayer)
as used by the decoder statenet.py:290-315.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Row-composition matrices: hi-res row 2i+p = sum_a S_p[., a] x[i + a - 2]
# over the conv's 5 rows — see layers._S0/_S1 (dm in {-2..1} / {-1..2}).
_S0 = np.array([[0.25, 0.00, 0.00, 0.00, 0.00],
                [0.75, 0.75, 0.25, 0.00, 0.00],
                [0.00, 0.25, 0.75, 0.75, 0.25],
                [0.00, 0.00, 0.00, 0.25, 0.75]], np.float32)
_S1 = np.array([[0.75, 0.25, 0.00, 0.00, 0.00],
                [0.25, 0.75, 0.75, 0.25, 0.00],
                [0.00, 0.00, 0.25, 0.75, 0.75],
                [0.00, 0.00, 0.00, 0.00, 0.25]], np.float32)

_INTERPRET = False  # test hook, see gru_hside._INTERPRET


def prep_weights(w, dtype):
    """w: HWIO [5, 5, C, Cout] -> (wstack [5, 5C, 2Cout],
    c_first [5, C, 2Cout], c_last [5, C, 2Cout]).

    wstack[dc][a*C:(a+1)*C, :Cout] is row-phase-0's composed kernel at row
    offset a-2 and column tap dc-2 (slot 4 zero); [..., Cout:] is phase 1
    shifted one row slot down (slot 0 zero).  c_first/c_last are the
    top/bottom border corrections: the kernels above see an edge-clamped
    row halo, but the conv's zero padding zeroes hi-res rows outside
    [0, 2H) — both clamped halo rows equal the col-upsampled edge row, so
    the correction is (sum of the out-of-range w rows) applied to it."""
    C, Cout = w.shape[2], w.shape[3]
    wf = w.astype(np.float32) if isinstance(w, np.ndarray) else w.astype(jnp.float32)
    kr0 = jnp.einsum("au,uvio->avio", jnp.asarray(_S0), wf)  # [4,5,C,Cout]
    kr1 = jnp.einsum("au,uvio->avio", jnp.asarray(_S1), wf)
    z = jnp.zeros((1, 5, C, Cout), jnp.float32)
    p0 = jnp.concatenate([kr0, z], axis=0)       # slots 0..3 used
    p1 = jnp.concatenate([z, kr1], axis=0)       # slots 1..4 used
    # [5 slots, 5 dc, C, 2Cout] -> [5 dc, 5C, 2Cout]
    wstack = jnp.concatenate([p0, p1], axis=-1)
    wstack = wstack.transpose(1, 0, 2, 3).reshape(5, 5 * C, 2 * Cout)
    # border corrections: rows of w (w[r] is the 5-tap column kernel at row
    # offset r-2).  Top: y[0] over-counts u[-2]+u[-1] -> w[0]+w[1];
    # y[1] over-counts u[-1] -> w[0].  Bottom mirrored.
    c_first = jnp.concatenate([wf[0] + wf[1], wf[0]], axis=-1)  # [5, C, 2Cout]
    c_last = jnp.concatenate([wf[4], wf[3] + wf[4]], axis=-1)
    return (wstack.astype(dtype), c_first.astype(dtype),
            c_last.astype(dtype))


def _mask_roll(x, dc, n_cols):
    """x[..., m + dc, :] with zeros outside [0, n_cols): the conv's column
    zero padding.  Static roll on the sublane dim + iota mask (Mosaic
    rejects pad + unaligned slices)."""
    if dc == 0:
        return x
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols, 1), 1)
    rolled = jnp.roll(x, -dc, axis=1)
    keep = (col + dc >= 0) & (col + dc < n_cols)
    return jnp.where(keep, rolled, jnp.zeros_like(rolled))


def _kernel(v_prev, v_cur, v_next, wstack, c_first, c_last, bias2,
            out_ref, *, tile_h: int, H: int, W: int, C: int,
            Cout: int, relu: bool):
    i = pl.program_id(1)
    dt = v_cur.dtype
    f32 = jnp.float32

    # v tile with a row-clamped 2-row halo (resize replicate semantics):
    # rows outside [0, H) read the nearest real row of THIS tile's view
    v = jnp.concatenate([v_prev[0, -2:], v_cur[0], v_next[0, :2]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, 1, 1), 0) \
        + i * tile_h - 2
    top = jnp.broadcast_to(v_cur[0, :1], v.shape)
    bot = jnp.broadcast_to(v_cur[0, tile_h - 1:tile_h], v.shape)
    v = jnp.where(row < 0, top, v)
    v = jnp.where(row >= H, bot, v)

    # 5-row channel fold: [tile_h, 2W, 5C]
    cat5 = jnp.concatenate([v[a:a + tile_h] for a in range(5)], axis=-1)

    acc = jnp.zeros((tile_h * 2 * W, 2 * Cout), f32)
    for dc in range(-2, 3):
        t = _mask_roll(cat5, dc, 2 * W)
        acc = acc + jnp.dot(t.reshape(-1, 5 * C), wstack[dc + 2],
                            preferred_element_type=f32)
    acc = acc.reshape(tile_h, 2 * W, 2 * Cout)

    # top/bottom border corrections (conv zero padding at hi-res rows):
    # subtract the clamped-halo contribution of the out-of-range u rows
    n = pl.num_programs(1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1, 1), 0)
    v_top = v[2:3]                     # global row 0 of this tile
    v_bot = v[tile_h + 1:tile_h + 2]   # global last row of this tile
    corr_top = jnp.zeros((1, 2 * W, 2 * Cout), f32)
    corr_bot = jnp.zeros((1, 2 * W, 2 * Cout), f32)
    for dc in range(-2, 3):
        corr_top = corr_top + jnp.dot(
            _mask_roll(v_top, dc, 2 * W).reshape(-1, C), c_first[dc + 2],
            preferred_element_type=f32).reshape(1, 2 * W, 2 * Cout)
        corr_bot = corr_bot + jnp.dot(
            _mask_roll(v_bot, dc, 2 * W).reshape(-1, C), c_last[dc + 2],
            preferred_element_type=f32).reshape(1, 2 * W, 2 * Cout)
    acc = acc - jnp.where((i == 0) & (rowi == 0), corr_top, 0.0)
    acc = acc - jnp.where((i == n - 1) & (rowi == tile_h - 1), corr_bot, 0.0)

    acc = acc + bias2[0].astype(f32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, :, 0] = acc[..., :Cout].astype(dt)
    out_ref[0, :, 1] = acc[..., Cout:].astype(dt)


def _col_upsample(x):
    """2x column upsample, torch align_corners=False semantics with edge
    clamp, as ONE XLA pass: v[..., 2j+q, :] for q=0: 0.25x[j-1]+0.75x[j],
    q=1: 0.75x[j]+0.25x[j+1] (clamped).  [B, H, W, C] -> [B, H, 2W, C]."""
    xl = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    xr = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    v0 = 0.25 * xl + 0.75 * x
    v1 = 0.75 * x + 0.25 * xr
    B, H, W, C = x.shape
    return jnp.stack([v0, v1], axis=3).reshape(B, H, 2 * W, C)


def _pick_tile_h(H: int, W: int, C: int, Cout: int, esize: int) -> int:
    """Largest H-tile whose big temps fit VMEM: the dominant buffers are
    cat5 [t, 2W, 5C] and its 4 rolled copies plus the f32 acc
    [t, 2W, 2Cout] — budget them to ~10 MB."""
    for t in (32, 16, 8, 4):
        if H % t != 0 or H < t:
            continue
        cat5 = t * 2 * W * 5 * C * esize
        acc = t * 2 * W * 2 * Cout * 4
        v = (t + 4) * 2 * W * C * esize
        if 5 * cat5 + acc + v <= 10 * 1024 * 1024:
            return t
    return 0


def supports(x, Cout: int) -> bool:
    """Shape/dtype gate (bf16-only on hardware, like the GRU cells)."""
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return False
    _, H, W, C = x.shape
    return (_pick_tile_h(H, W, C, Cout, 2) > 0
            and W % 8 == 0 and C % 8 == 0 and Cout % 8 == 0)


@functools.partial(jax.jit, static_argnames=("tile_h", "relu", "interpret"))
def _run(v, wstack, c_first, c_last, bias2, tile_h, relu=True,
         interpret=False):
    B, H, W2, C = v.shape     # v: column-upsampled input [B, H, 2W, C]
    W = W2 // 2
    Cout = bias2.shape[-1] // 2
    n = H // tile_h
    blk = lambda fm: pl.BlockSpec((1, tile_h, W2, C), fm)  # noqa: E731
    cur = blk(lambda b, i: (b, i, 0, 0))
    prv = blk(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    nxt = blk(lambda b, i: (b, jnp.minimum(i + 1, n - 1), 0, 0))
    wspec = pl.BlockSpec((5, 5 * C, 2 * Cout), lambda b, i: (0, 0, 0))
    cspec = pl.BlockSpec((5, C, 2 * Cout), lambda b, i: (0, 0, 0))
    bspec = pl.BlockSpec((1, 2 * Cout), lambda b, i: (0, 0))
    out_spec = pl.BlockSpec((1, tile_h, 2, 2 * W, Cout),
                            lambda b, i: (b, i, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, H=H, W=W, C=C, Cout=Cout,
                          relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, 2 * W, Cout), v.dtype),
        grid=(B, n),
        in_specs=[prv, cur, nxt, wspec, cspec, cspec, bspec],
        out_specs=out_spec,
        interpret=interpret,
    )(v, v, v, wstack, c_first, c_last, bias2)
    # phase-planar [B, H, 2, 2W, Cout] -> [B, 2H, 2W, Cout]: leading-dim
    # merge, layout-free
    return out.reshape(B, 2 * H, 2 * W, Cout)


def upsample_conv_fused(p, x, skip=None, activation: str = "relu",
                        tile_h: int = 0, interpret: bool = False):
    """Drop-in for layers.upsample_conv_layer_apply(p, x(+skip), norm=None):
    relu(conv5x5(upsample2x_bilinear(x + skip), W, b)) as one Pallas pass.
    Outputs match the XLA path to float tolerance (f32-accumulated dots).
    skip: optional same-shape tensor summed in-kernel (skip_type='sum').
    Inference-path only for now (no custom VJP — training's deferred
    decoder runs once outside the scan where XLA's version is acceptable).
    """
    interpret = interpret or _INTERPRET
    w = p["conv2d"]["weight"]
    b = p["conv2d"].get("bias")
    C, Cout = w.shape[2], w.shape[3]
    dt = x.dtype
    th = tile_h or _pick_tile_h(x.shape[1], x.shape[2], C, Cout,
                                2 if dt == jnp.bfloat16 else 4)
    wstack, c_first, c_last = prep_weights(w, dt)
    bias = jnp.zeros((Cout,), dt) if b is None else b.astype(dt)
    bias2 = jnp.concatenate([bias, bias])[None]
    if skip is not None:
        x = x + skip.astype(dt)   # fuses into the _col_upsample pass
    v = _col_upsample(x)
    out = _run(v, wstack, c_first, c_last, bias2, th,
               relu=(activation == "relu"), interpret=interpret)
    if activation not in ("relu", None):
        from ..models.layers import _activation_fn
        out = _activation_fn(activation)(out)
    return out
