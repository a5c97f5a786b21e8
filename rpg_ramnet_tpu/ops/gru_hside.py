"""Fused ConvGRU h-side cell as a Pallas TPU kernel.

The sequential critical path of the precomputed streaming/record program is
the per-scale h-side GRU completion (layers.conv_gru_apply_hside): two 3x3
convs on h / r*h plus gates.  Under XLA each cell runs 6-9x off the HBM
roofline (exp/hside_microbench.py: 212/80/59 us vs 26/13/6 at the flagship
scales) — the while-loop body pays operand relayouts and unfused
intermediate round-trips per step.  This kernel computes the whole cell in
ONE fused pass over H-tiles:

    ur = sigmoid(conv3x3(h, wh_ur) + gx[..., :2C])
    z, r = ur[..., :C], ur[..., C:]
    out = tanh(conv3x3(r * h, wh_o) + gx[..., 2C:])
    h'  = h * (1 - z) + out * z

Convs are 9 shifted [rows*W, C] @ [C, gC] MXU dots accumulated in f32.
Halos: the grid tiles H; each tile reads its neighbor blocks (prev/cur/next
BlockSpecs on the same array — 1 extra h read) because `r` needs a 1-row
halo, hence `h` a 2-row halo.  Rows outside [0, H) are masked to zero,
matching the torch zero-padding semantics exactly; a(-1) = r(-1)*h(-1) = 0
regardless of the garbage r halo at the image border because h is masked.

Capability reference: RAM_Net/model/submodules.py:414-454 (ConvGRU);
the x/h split itself is layers.conv_gru_x_gates / conv_gru_apply_hside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Test hook: when True, the public cells run their kernels in interpret
# mode (plain jax-ops evaluation — composes with remat/grad, unlike
# pltpu.force_tpu_interpret_mode whose ordered-callback effect does not).
_INTERPRET = False

# Optional Mosaic scoped-VMEM cap override (bytes).  None = the 16 MB XLA
# default, which the shipped record program fits.  Probes raise it when a
# SURROUNDING program's VMEM placement pushes kernel outputs into the
# scoped allocation (the round-5 gru_pair finding, PERF.md) — e.g. the
# lax.scan unroll>1 record variants.
_VMEM_LIMIT = None


def _cparams(interpret):
    if interpret or _VMEM_LIMIT is None:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _conv9(src, w3, rows_out, C):
    """3x3 'same' conv as 3 full-width MXU dots.  src [R, W, C] carries a
    1-row halo around the rows_out output rows.  The 3 row-taps fold into
    the contraction dim (channel-concat of row-shifted copies -> K=3C, a
    much better MXU fill than per-tap K=C); the 3 column-taps are static
    jnp.roll on the sublane dim with wrapped edge columns masked to zero —
    Mosaic rejects pad+unaligned-slice ('offset mismatch on non-concat
    dimension'), but aligned full-width rolls lower fine.
    w3: [3, 3C, C_out], w3[dx] = concat over dy of W[dy, dx]."""
    W = src.shape[1]
    cat = jnp.concatenate(
        [src[0:rows_out], src[1:rows_out + 1], src[2:rows_out + 2]],
        axis=-1)                                   # [rows_out, W, 3C]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    acc = jnp.dot(cat.reshape(-1, 3 * C), w3[1],
                  preferred_element_type=jnp.float32)
    # out[x] += in[x-1] W[:,0]: roll right, zero the wrapped col 0
    left = jnp.where(col > 0, jnp.roll(cat, 1, axis=1),
                     jnp.zeros_like(cat))
    acc = acc + jnp.dot(left.reshape(-1, 3 * C), w3[0],
                        preferred_element_type=jnp.float32)
    right = jnp.where(col < W - 1, jnp.roll(cat, -1, axis=1),
                      jnp.zeros_like(cat))
    acc = acc + jnp.dot(right.reshape(-1, 3 * C), w3[2],
                        preferred_element_type=jnp.float32)
    return acc


def _gru_cell_math(h_prev, h_cur, h_next, gxz, gxr_prev, gxr_cur, gxr_next,
                   gxo, w_ur, w_o, *, tile_h: int, H: int, W: int, C: int):
    """Shared body of the plain and residual GRU kernels: returns
    (h_new, z, r_center, out_g), all f32 except h_new (input dtype)."""
    i = pl.program_id(1)
    dt = h_cur.dtype

    # h with a 2-row halo: [tile_h+4, W, C]; mask rows outside [0, H)
    hb = jnp.concatenate([h_prev[0, -2:], h_cur[0], h_next[0, :2]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, 1, 1), 0) \
        + i * tile_h - 2
    hb = jnp.where((row >= 0) & (row < H), hb, jnp.zeros_like(hb))

    # ur conv over the 1-halo region: output rows [i*tile_h-1, ...+tile_h+1)
    ur = _conv9(hb, w_ur, tile_h + 2, C).reshape(tile_h + 2, W, 2 * C)

    gxr = jnp.concatenate([gxr_prev[0, -1:], gxr_cur[0], gxr_next[0, :1]],
                          axis=0)
    r = jax.nn.sigmoid(ur[..., C:] + gxr.astype(jnp.float32))
    z = jax.nn.sigmoid(ur[1:tile_h + 1, :, :C]
                       + gxz[0].astype(jnp.float32))

    # out-gate conv on a = r * h (1-row halo); zero rows of hb make the
    # border a rows exactly the zero padding the reference conv sees
    a = (r * hb[1:tile_h + 3].astype(jnp.float32)).astype(dt)
    acc_o = _conv9(a, w_o, tile_h, C)
    out_g = jnp.tanh(acc_o.reshape(tile_h, W, C)
                     + gxo[0].astype(jnp.float32))

    h_int = hb[2:tile_h + 2].astype(jnp.float32)
    h_new = (h_int * (1.0 - z) + out_g * z).astype(dt)
    return h_new, z, r[1:tile_h + 1], out_g


def _kernel(h_prev, h_cur, h_next, gxz, gxr_prev, gxr_cur, gxr_next, gxo,
            w_ur, w_o, out_ref, *, tile_h: int, H: int, W: int, C: int):
    h_new, _, _, _ = _gru_cell_math(
        h_prev, h_cur, h_next, gxz, gxr_prev, gxr_cur, gxr_next, gxo,
        w_ur, w_o, tile_h=tile_h, H=H, W=W, C=C)
    out_ref[0] = h_new


def _kernel_res(h_prev, h_cur, h_next, gxz, gxr_prev, gxr_cur, gxr_next, gxo,
                w_ur, w_o, out_ref, acts_ref, *, tile_h: int, H: int, W: int,
                C: int):
    """Residual variant for the custom VJP: also writes the gate
    activations acts = concat(z, r, out_g) the backward needs (recomputing
    them in bwd would cost an unfused forward)."""
    h_new, z, r_c, out_g = _gru_cell_math(
        h_prev, h_cur, h_next, gxz, gxr_prev, gxr_cur, gxr_next, gxo,
        w_ur, w_o, tile_h=tile_h, H=H, W=W, C=C)
    out_ref[0] = h_new
    acts_ref[0] = jnp.concatenate([z, r_c, out_g], axis=-1).astype(
        h_new.dtype)


def _halos(x, tile_h: int, rows: int):
    """Skinny halo side-arrays for an H-tiled [B, H, W, C] array:
    top[:, i] = rows [i*tile_h - rows, i*tile_h) and bot[:, i] = rows
    [(i+1)*tile_h, +rows), gathered OUTSIDE the kernel with XLA slices
    (reads only rows*n rows of x) and rolled by one tile.  Edge blocks
    receive rolled-in garbage — kernels mask out-of-range rows to zero."""
    B, H, W, C = x.shape
    n = H // tile_h
    xr = x.reshape(B, n, tile_h, W, C)
    top = jnp.roll(xr[:, :, -rows:], 1, axis=1)
    bot = jnp.roll(xr[:, :, :rows], -1, axis=1)
    return top, bot


def _gru_cell_math_v2(h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot,
                      gxo, w_ur, w_o, *, tile_h: int, H: int, W: int, C: int,
                      i=None):
    """v2 body: identical math to _gru_cell_math, but the 2-row h halo and
    1-row gxr halo arrive as separate skinny side-arrays (_halos) instead of
    prev/next BlockSpecs on the full arrays — each HBM plane is read ONCE
    (~5 planes/cell vs v1's ~11; v1 measured 4x off the HBM roofline at the
    flagship scale-0, exp/fused_cell_roofline.json).

    i: tile index within this scale's H tiling (defaults to grid dim 1 —
    the cross-scale merged kernel passes its own offset index)."""
    if i is None:
        i = pl.program_id(1)
    dt = h_cur.dtype
    hb = jnp.concatenate([h_top[0, 0], h_cur[0], h_bot[0, 0]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, 1, 1), 0) \
        + i * tile_h - 2
    hb = jnp.where((row >= 0) & (row < H), hb, jnp.zeros_like(hb))

    ur = _conv9(hb, w_ur, tile_h + 2, C).reshape(tile_h + 2, W, 2 * C)
    gxr = jnp.concatenate([gxr_top[0, 0], gxr_cur[0], gxr_bot[0, 0]], axis=0)
    r = jax.nn.sigmoid(ur[..., C:] + gxr.astype(jnp.float32))
    z = jax.nn.sigmoid(ur[1:tile_h + 1, :, :C] + gxz[0].astype(jnp.float32))

    # garbage r halo rows at the image border are harmless: a = r*h and the
    # out-of-range h rows are masked zero (the zero padding the reference
    # conv sees)
    a = (r * hb[1:tile_h + 3].astype(jnp.float32)).astype(dt)
    out_g = jnp.tanh(_conv9(a, w_o, tile_h, C).reshape(tile_h, W, C)
                     + gxo[0].astype(jnp.float32))
    h_int = hb[2:tile_h + 2].astype(jnp.float32)
    h_new = (h_int * (1.0 - z) + out_g * z).astype(dt)
    return h_new, z, r[1:tile_h + 1], out_g


def _kernel_v2(h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot, gxo,
               w_ur, w_o, out_ref, *, tile_h: int, H: int, W: int, C: int):
    h_new, _, _, _ = _gru_cell_math_v2(
        h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot, gxo,
        w_ur, w_o, tile_h=tile_h, H=H, W=W, C=C)
    out_ref[0] = h_new


def _kernel_v2_res(h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot, gxo,
                   w_ur, w_o, out_ref, acts_ref, *, tile_h: int, H: int,
                   W: int, C: int):
    h_new, z, r_c, out_g = _gru_cell_math_v2(
        h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot, gxo,
        w_ur, w_o, tile_h=tile_h, H=H, W=W, C=C)
    out_ref[0] = h_new
    acts_ref[0] = jnp.concatenate([z, r_c, out_g], axis=-1).astype(
        h_new.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret",
                                             "residuals"))
def _run_v2(h, gxz, gxr, gxo, w_ur, w_o, tile_h, interpret=False,
            residuals=False):
    B, H, W, C = h.shape
    n = H // tile_h
    h_top, h_bot = _halos(h, tile_h, 2)
    gxr_top, gxr_bot = _halos(gxr, tile_h, 1)
    blk = lambda ch=C: pl.BlockSpec((1, tile_h, W, ch),       # noqa: E731
                                    lambda b, i: (b, i, 0, 0))
    halo = lambda rows: pl.BlockSpec((1, 1, rows, W, C),      # noqa: E731
                                     lambda b, i: (b, i, 0, 0, 0))
    cur = blk()
    wspec_ur = pl.BlockSpec((3, 3 * C, 2 * C), lambda b, i: (0, 0, 0))
    wspec_o = pl.BlockSpec((3, 3 * C, C), lambda b, i: (0, 0, 0))
    if residuals:
        kern = _kernel_v2_res
        out_shape = (jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
                     jax.ShapeDtypeStruct((B, H, W, 3 * C), h.dtype))
        out_specs = (cur, pl.BlockSpec((1, tile_h, W, 3 * C),
                                       lambda b, i: (b, i, 0, 0)))
    else:
        kern = _kernel_v2
        out_shape = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
        out_specs = cur
    return pl.pallas_call(
        functools.partial(kern, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=out_shape,
        grid=(B, n),
        in_specs=[cur, halo(2), halo(2),   # h + 2-row halos
                  cur,                     # gx_z
                  cur, halo(1), halo(1),   # gx_r + 1-row halos
                  cur,                     # gx_o
                  wspec_ur, wspec_o],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(h, h_top, h_bot, gxz, gxr, gxr_top, gxr_bot, gxo, w_ur, w_o)


# Dispatch flag for the GRU h-side implementation: v2 (halo side-arrays,
# single read per plane) vs v1 (neighbor-block re-reads).  Module-level so
# tests can exercise both.
_GRU_V2 = False


def _run_hside(h, gxz, gxr, gxo, w_ur, w_o, tile_h, interpret=False,
               residuals=False):
    run = _run_v2 if _GRU_V2 else _run
    return run(h, gxz, gxr, gxo, w_ur, w_o, tile_h, interpret, residuals)


def _pick_tile_h(H: int, W: int, C: int, esize: int,
                 budget: int = 512 * 1024) -> int:
    """Largest H-tile whose ~9 double-buffered operand blocks + temps fit
    the 16M VMEM (empirical: tile_h*W*C*esize = 512K -> ~12.3M total for
    the GRU cell; f32 tile 16 at the flagship scale-0 measured 24.6M and
    OOMs).  The LSTM cell's 4C gx block + f32 gates need a halved budget
    (bf16 tile 16 at scale-0 measured 22.3M)."""
    for t in (32, 16, 8, 4):
        if H % t == 0 and H >= t and t * W * C * esize <= budget:
            return t
    return 0


def supports(prev_state, lstm: bool = False) -> bool:
    """Shape constraints for the fused kernels (fallback otherwise).

    bf16 only on hardware: the f32 variant's in-kernel temps (cat/shifted
    copies + f32 accumulators) exceed the 16M VMEM even at tile_h=8 at the
    flagship scale-0 (measured 20.9M), and the precomputed path that uses
    these kernels is only ever auto-enabled for bf16 (PERF.md).  Interpret-
    mode tests may pass f32 via tile_h override."""
    if prev_state.ndim != 4 or prev_state.dtype != jnp.bfloat16:
        return False
    _, H, W, C = prev_state.shape
    budget = 256 * 1024 if lstm else 512 * 1024
    return (_pick_tile_h(H, W, C, 2, budget=budget) > 0
            and W % 8 == 0 and C % 8 == 0)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret",
                                             "residuals"))
def _run(h, gxz, gxr, gxo, w_ur, w_o, tile_h, interpret=False,
         residuals=False):
    B, H, W, C = h.shape
    n = H // tile_h
    blk = lambda fm, ch=C: pl.BlockSpec((1, tile_h, W, ch), fm)  # noqa: E731
    cur = blk(lambda b, i: (b, i, 0, 0))
    prv = blk(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    nxt = blk(lambda b, i: (b, jnp.minimum(i + 1, n - 1), 0, 0))
    wspec_ur = pl.BlockSpec((3, 3 * C, 2 * C), lambda b, i: (0, 0, 0))
    wspec_o = pl.BlockSpec((3, 3 * C, C), lambda b, i: (0, 0, 0))
    if residuals:
        kern = _kernel_res
        out_shape = (jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
                     jax.ShapeDtypeStruct((B, H, W, 3 * C), h.dtype))
        out_specs = (cur, blk(lambda b, i: (b, i, 0, 0), 3 * C))
    else:
        kern = _kernel
        out_shape = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
        out_specs = cur
    return pl.pallas_call(
        functools.partial(kern, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=out_shape,
        grid=(B, n),
        in_specs=[prv, cur, nxt,          # h
                  cur,                    # gx_z
                  prv, cur, nxt,          # gx_r
                  cur,                    # gx_o
                  wspec_ur, wspec_o],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(h, h, h, gxz, gxr, gxr, gxr, gxo, w_ur, w_o)


def _lstm_cell_math(h_prev, h_cur, h_next, c_cur, gx_cur, w4, *, tile_h: int,
                    H: int, W: int, C: int):
    """Shared body of the plain and residual LSTM kernels: returns
    (hidden, cell, acts) with acts = concat(in, rem, out, cell_g) f32."""
    i = pl.program_id(1)
    dt = h_cur.dtype

    # 1-row halo only (no reset-gate chain): [tile_h+2, W, C]
    hb = jnp.concatenate([h_prev[0, -1:], h_cur[0], h_next[0, :1]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0) \
        + i * tile_h - 1
    hb = jnp.where((row >= 0) & (row < H), hb, jnp.zeros_like(hb))

    gates = _conv9(hb, w4, tile_h, C).reshape(tile_h, W, 4 * C) \
        + gx_cur[0].astype(jnp.float32)
    in_g = jax.nn.sigmoid(gates[..., :C])
    rem_g = jax.nn.sigmoid(gates[..., C:2 * C])
    out_g = jax.nn.sigmoid(gates[..., 2 * C:3 * C])
    cell_g = jnp.tanh(gates[..., 3 * C:])
    cell = rem_g * c_cur[0].astype(jnp.float32) + in_g * cell_g
    hid = (out_g * jnp.tanh(cell)).astype(dt)
    acts = jnp.concatenate([in_g, rem_g, out_g, cell_g], axis=-1)
    return hid, cell.astype(dt), acts


def _lstm_kernel(h_prev, h_cur, h_next, c_cur, gx_cur, w4, hid_ref, cell_ref,
                 *, tile_h: int, H: int, W: int, C: int):
    hid, cell, _ = _lstm_cell_math(h_prev, h_cur, h_next, c_cur, gx_cur, w4,
                                   tile_h=tile_h, H=H, W=W, C=C)
    hid_ref[0] = hid
    cell_ref[0] = cell


def _lstm_kernel_res(h_prev, h_cur, h_next, c_cur, gx_cur, w4, hid_ref,
                     cell_ref, acts_ref, *, tile_h: int, H: int, W: int,
                     C: int):
    hid, cell, acts = _lstm_cell_math(h_prev, h_cur, h_next, c_cur, gx_cur,
                                      w4, tile_h=tile_h, H=H, W=W, C=C)
    hid_ref[0] = hid
    cell_ref[0] = cell
    acts_ref[0] = acts.astype(hid.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret",
                                             "residuals"))
def _run_lstm(h, c, gx, w4, tile_h, interpret=False, residuals=False):
    B, H, W, C = h.shape
    n = H // tile_h
    blk = lambda fm, ch=C: pl.BlockSpec((1, tile_h, W, ch), fm)  # noqa: E731
    cur = blk(lambda b, i: (b, i, 0, 0))
    prv = blk(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    nxt = blk(lambda b, i: (b, jnp.minimum(i + 1, n - 1), 0, 0))
    gspec = blk(lambda b, i: (b, i, 0, 0), 4 * C)
    wspec = pl.BlockSpec((3, 3 * C, 4 * C), lambda b, i: (0, 0, 0))
    shp = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
    if residuals:
        kern = _lstm_kernel_res
        out_shape = (shp, shp,
                     jax.ShapeDtypeStruct((B, H, W, 4 * C), h.dtype))
        out_specs = (cur, cur, gspec)
    else:
        kern = _lstm_kernel
        out_shape = (shp, shp)
        out_specs = (cur, cur)
    return pl.pallas_call(
        functools.partial(kern, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=out_shape,
        grid=(B, n),
        in_specs=[prv, cur, nxt, cur, gspec, wspec],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(h, h, h, c, gx, w4)


# ---------------------------------------------------------------------------
# custom VJP (round 3): the fused cells are differentiable, so TRAINING —
# the lowest-MFU axis — can run them on its sequential critical path.
# Forward = the Pallas kernel (residual variant saves the gate activations);
# backward = XLA transpose convs + elementwise on tensors that already sit
# at layout boundaries.  Reference semantics being differentiated:
# RAM_Net/model/submodules.py:414-454 (ConvGRU) / :303-358 (ConvLSTM).
# ---------------------------------------------------------------------------


def _dconv_x(ds, w):
    """Cotangent of conv2d(x, w, 3x3 'same' stride-1) wrt x: correlate the
    output cotangent with the spatially-flipped, in/out-swapped kernel.
    f32 accumulation."""
    return jax.lax.conv_general_dilated(
        ds, jnp.flip(w, (0, 1)).swapaxes(2, 3).astype(ds.dtype),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _dconv_w(x, ds):
    """Cotangent wrt the HWIO weights of conv2d(x, w, 3x3 'same'):
    a conv contracting over batch AND spatial dims — lhs batch rides the
    feature ('C') slot, input channels ride the batch ('N') slot, and the
    output cotangent acts as an HxW kernel.  Output [3, 3, Cin, Cout]."""
    return jax.lax.conv_general_dilated(
        x, ds.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32)


def _fold3(w):
    """HWIO [3, 3, Cin, O] -> [3(dx), 3*Cin(dy-concat), O] for _conv9."""
    return jnp.stack([jnp.concatenate([w[dy, dx] for dy in range(3)],
                                      axis=0) for dx in range(3)])


def _zero_like_tree(p):
    return jax.tree_util.tree_map(jnp.zeros_like, p)


def _scatter_hside_wgrad(w_full, dw_h, C):
    """Place the h-slice weight grad into a full-[.., Cx+C, O] zero grad
    (the x-slice + bias grads flow through conv_*_x_gates instead)."""
    cx = w_full.shape[2] - C
    zeros_x = jnp.zeros(w_full.shape[:2] + (cx,) + w_full.shape[3:],
                        w_full.dtype)
    return jnp.concatenate([zeros_x, dw_h.astype(w_full.dtype)], axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gru_hside_cell(tile_h, interpret, p, gx, prev_state):
    C = prev_state.shape[-1]
    dt = prev_state.dtype
    w_ur = _fold3(jnp.concatenate(
        [p["update_gate"]["weight"][:, :, -C:],
         p["reset_gate"]["weight"][:, :, -C:]], axis=-1)).astype(dt)
    w_o = _fold3(p["out_gate"]["weight"][:, :, -C:]).astype(dt)
    return _run_hside(prev_state, gx[..., :C], gx[..., C:2 * C],
                      gx[..., 2 * C:], w_ur, w_o, tile_h, interpret)


def _gru_hside_fwd(tile_h, interpret, p, gx, prev_state):
    C = prev_state.shape[-1]
    dt = prev_state.dtype
    w_ur = _fold3(jnp.concatenate(
        [p["update_gate"]["weight"][:, :, -C:],
         p["reset_gate"]["weight"][:, :, -C:]], axis=-1)).astype(dt)
    w_o = _fold3(p["out_gate"]["weight"][:, :, -C:]).astype(dt)
    h_new, acts = _run_hside(prev_state, gx[..., :C], gx[..., C:2 * C],
                             gx[..., 2 * C:], w_ur, w_o, tile_h, interpret,
                             residuals=True)
    return h_new, (p, gx, prev_state, acts)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernel (round 4, verdict item 4): the dh/dgx chain of the
# GRU h-side backward — two transpose convs + the gate elementwise — fused
# into one pass over H-tiles, mirroring the forward kernel's structure
# (backward is ~2x the forward work; the XLA bwd pays the same per-step
# boundary/relayout tax the forward kernel removed).  Weight grads stay XLA
# (a batched conv_general contraction the MXU already runs well).
# ---------------------------------------------------------------------------


def _bwd_kernel(g_cur, g_top, g_bot, a_cur, a_top, a_bot, h_cur, h_top,
                h_bot, wbur, wbo, dh_ref, dgx_ref, *, tile_h: int, H: int,
                W: int, C: int):
    """dh = g(1-z) + da*r + convT(concat(dpre_z, dpre_r), Wur);
    da = convT(dpre_o, Wo); dgx = concat(dpre_z, dpre_r, dpre_o).
    convT = correlation with flipped/in-out-swapped weights (arrives
    pre-folded as wbur/wbo).  g and acts carry 2-row halos (da's conv input
    dpre_o is needed one row beyond dpre_ur's conv input rows); h carries a
    1-row halo.  Out-of-range g rows are masked to zero (the zero padding
    _dconv_x sees); h is masked so dr/dpre_z vanish there too."""
    i = pl.program_id(1)
    t = tile_h
    dt = h_cur.dtype
    f32 = jnp.float32

    gb = jnp.concatenate([g_top[0, 0], g_cur[0], g_bot[0, 0]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0) + i * t - 2
    gb = jnp.where((row >= 0) & (row < H), gb, jnp.zeros_like(gb)).astype(f32)
    ab = jnp.concatenate([a_top[0, 0], a_cur[0], a_bot[0, 0]], axis=0)
    z4 = ab[..., :C].astype(f32)
    r4 = ab[..., C:2 * C].astype(f32)
    o4 = ab[..., 2 * C:].astype(f32)

    hb = jnp.concatenate([h_top[0, 0], h_cur[0], h_bot[0, 0]], axis=0)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0) + i * t - 1
    hb = jnp.where((row1 >= 0) & (row1 < H), hb, jnp.zeros_like(hb))
    hf = hb.astype(f32)

    # dpre_o on the full 2-row halo (da's conv consumes it)
    dpre_o = gb * z4 * (1.0 - o4 * o4)                  # [t+4, W, C]
    da = _conv9(dpre_o.astype(dt), wbo, t + 2, C).reshape(t + 2, W, C)

    dr = da * hf                                        # rows [it-1, it+t+1)
    r1 = r4[1:t + 3]
    dpre_r = dr * r1 * (1.0 - r1)
    g1 = gb[1:t + 3]
    z1 = z4[1:t + 3]
    o1 = o4[1:t + 3]
    dpre_z = g1 * (o1 - hf) * z1 * (1.0 - z1)
    dpre_ur = jnp.concatenate([dpre_z, dpre_r], axis=-1).astype(dt)
    dh_conv = _conv9(dpre_ur, wbur, t, 2 * C).reshape(t, W, C)

    z_c = z4[2:t + 2]
    dh = gb[2:t + 2] * (1.0 - z_c) + da[1:t + 1] * r4[2:t + 2] + dh_conv
    dh_ref[0] = dh.astype(dt)
    dgx_ref[0] = jnp.concatenate(
        [dpre_z[1:t + 1], dpre_r[1:t + 1], dpre_o[2:t + 2]],
        axis=-1).astype(dgx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def _run_bwd(g, acts, h, wbur, wbo, tile_h, interpret=False):
    B, H, W, C = h.shape
    n = H // tile_h
    g_top, g_bot = _halos(g, tile_h, 2)
    a_top, a_bot = _halos(acts, tile_h, 2)
    h_top, h_bot = _halos(h, tile_h, 1)
    blk = lambda ch=C: pl.BlockSpec((1, tile_h, W, ch),       # noqa: E731
                                    lambda b, i: (b, i, 0, 0))
    halo = lambda rows, ch=C: pl.BlockSpec(                   # noqa: E731
        (1, 1, rows, W, ch), lambda b, i: (b, i, 0, 0, 0))
    wb_ur = pl.BlockSpec((3, 6 * C, C), lambda b, i: (0, 0, 0))
    wb_o = pl.BlockSpec((3, 3 * C, C), lambda b, i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=(jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
                   jax.ShapeDtypeStruct((B, H, W, 3 * C), h.dtype)),
        grid=(B, n),
        in_specs=[blk(), halo(2), halo(2),
                  blk(3 * C), halo(2, 3 * C), halo(2, 3 * C),
                  blk(), halo(1), halo(1),
                  wb_ur, wb_o],
        out_specs=(blk(), blk(3 * C)),
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(g, g_top, g_bot, acts, a_top, a_bot, h, h_top, h_bot, wbur, wbo)


# Dispatch flag for the Pallas backward: default OFF until a measured win
# (tests toggle it; bench/exp probes force it for measurement).
_BWD_KERNEL = False


def bwd_supports(h) -> bool:
    """Shapes the backward kernel accepts: same alignment rules as the
    forward, with a halved tile budget (the 3C acts/dgx blocks)."""
    if h.ndim != 4 or h.dtype != jnp.bfloat16:
        return False
    _, H, W, C = h.shape
    return (_pick_tile_h(H, W, C, 2, budget=256 * 1024) > 0
            and W % 8 == 0 and C % 8 == 0)


def _gru_hside_bwd(tile_h, interpret, res, g):
    """Hand-derived ConvGRU h-side backward.  Forward:
        z = sig(conv(h,Wz) + gxz); r = sig(conv(h,Wr) + gxr)
        o = tanh(conv(r*h, Wo) + gxo); h' = h*(1-z) + o*z
    acts from the kernel: concat(z, r, o).
    When _BWD_KERNEL is on and shapes allow, the dh/dgx chain runs as ONE
    fused Pallas pass (_run_bwd); weight grads stay XLA either way."""
    p, gx, h, acts = res
    if _BWD_KERNEL and (bwd_supports(h) or interpret):
        return _gru_hside_bwd_kernel_path(tile_h, interpret, res, g)
    return _gru_hside_bwd_xla(tile_h, interpret, res, g)


def _gru_hside_bwd_kernel_path(tile_h, interpret, res, g):
    p, gx, h, acts = res
    C = h.shape[-1]
    dt = h.dtype
    wh_ur = jnp.concatenate([p["update_gate"]["weight"][:, :, -C:],
                             p["reset_gate"]["weight"][:, :, -C:]], axis=-1)
    wh_o = p["out_gate"]["weight"][:, :, -C:]
    wbur = _fold3(jnp.flip(wh_ur, (0, 1)).swapaxes(2, 3)).astype(dt)
    wbo = _fold3(jnp.flip(wh_o, (0, 1)).swapaxes(2, 3)).astype(dt)
    t = _pick_tile_h(h.shape[1], h.shape[2], C, 2, budget=256 * 1024) \
        if not interpret else min(tile_h, h.shape[1])
    dh, dgx = _run_bwd(g.astype(dt), acts, h, wbur, wbo, t,
                       interpret or _INTERPRET)
    # weight grads: batched conv contractions, XLA-native
    ds_ur = dgx[..., :2 * C].astype(dt)
    ds_o = dgx[..., 2 * C:].astype(dt)
    a = (acts[..., C:2 * C].astype(jnp.float32)
         * h.astype(jnp.float32)).astype(dt)
    dwh_ur = _dconv_w(h, ds_ur)
    dwh_o = _dconv_w(a, ds_o)
    dp = _zero_like_tree(p)
    dp["update_gate"]["weight"] = _scatter_hside_wgrad(
        p["update_gate"]["weight"], dwh_ur[..., :C], C)
    dp["reset_gate"]["weight"] = _scatter_hside_wgrad(
        p["reset_gate"]["weight"], dwh_ur[..., C:], C)
    dp["out_gate"]["weight"] = _scatter_hside_wgrad(
        p["out_gate"]["weight"], dwh_o, C)
    return dp, dgx.astype(gx.dtype), dh.astype(dt)


def _gru_hside_bwd_xla(tile_h, interpret, res, g):
    p, gx, h, acts = res
    C = h.shape[-1]
    dt = h.dtype
    f32 = jnp.float32
    z = acts[..., :C].astype(f32)
    r = acts[..., C:2 * C].astype(f32)
    o = acts[..., 2 * C:].astype(f32)
    hf = h.astype(f32)
    gf = g.astype(f32)

    dh = gf * (1.0 - z)
    dz = gf * (o - hf)
    dpre_o = (gf * z) * (1.0 - o * o)
    dpre_z = dz * z * (1.0 - z)

    wh_ur = jnp.concatenate([p["update_gate"]["weight"][:, :, -C:],
                             p["reset_gate"]["weight"][:, :, -C:]],
                            axis=-1)
    wh_o = p["out_gate"]["weight"][:, :, -C:]

    ds_o = dpre_o.astype(dt)
    da = _dconv_x(ds_o, wh_o)
    a = (r * hf).astype(dt)
    dwh_o = _dconv_w(a, ds_o)
    dr = da * hf
    dh = dh + da * r
    dpre_r = dr * r * (1.0 - r)
    ds_ur = jnp.concatenate([dpre_z, dpre_r], axis=-1).astype(dt)
    dh = dh + _dconv_x(ds_ur, wh_ur)
    dwh_ur = _dconv_w(h, ds_ur)

    dgx = jnp.concatenate([dpre_z, dpre_r, dpre_o], axis=-1).astype(gx.dtype)
    dp = _zero_like_tree(p)
    dp["update_gate"]["weight"] = _scatter_hside_wgrad(
        p["update_gate"]["weight"], dwh_ur[..., :C], C)
    dp["reset_gate"]["weight"] = _scatter_hside_wgrad(
        p["reset_gate"]["weight"], dwh_ur[..., C:], C)
    dp["out_gate"]["weight"] = _scatter_hside_wgrad(
        p["out_gate"]["weight"], dwh_o, C)
    return dp, dgx, dh.astype(dt)


_gru_hside_cell.defvjp(_gru_hside_fwd, _gru_hside_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _lstm_hside_cell(tile_h, interpret, p, gx, prev_hidden, prev_cell):
    C = prev_hidden.shape[-1]
    dt = prev_hidden.dtype
    w4 = _fold3(p["Gates"]["weight"][:, :, -C:]).astype(dt)
    return _run_lstm(prev_hidden, prev_cell, gx, w4, tile_h, interpret)


def _lstm_hside_fwd(tile_h, interpret, p, gx, prev_hidden, prev_cell):
    C = prev_hidden.shape[-1]
    dt = prev_hidden.dtype
    w4 = _fold3(p["Gates"]["weight"][:, :, -C:]).astype(dt)
    hid, cell, acts = _run_lstm(prev_hidden, prev_cell, gx, w4, tile_h,
                                interpret, residuals=True)
    return (hid, cell), (p, gx, prev_hidden, prev_cell, cell, acts)


def _lstm_hside_bwd(tile_h, interpret, res, g):
    """Hand-derived ConvLSTM h-side backward.  Forward:
        (i,f,o,u) = acts(conv(h,W4) + gx); c' = f*c + i*u; h' = o*tanh(c')
    acts from the kernel: concat(i, f, o, u)."""
    p, gx, h, c, cell_new, acts = res
    gh, gc = g
    C = h.shape[-1]
    dt = h.dtype
    f32 = jnp.float32
    i_g = acts[..., :C].astype(f32)
    f_g = acts[..., C:2 * C].astype(f32)
    o_g = acts[..., 2 * C:3 * C].astype(f32)
    u_g = acts[..., 3 * C:].astype(f32)
    cf = c.astype(f32)
    t = jnp.tanh(cell_new.astype(f32))
    ghf = gh.astype(f32)
    gcf = gc.astype(f32)

    do = ghf * t
    dcn = ghf * o_g * (1.0 - t * t) + gcf
    dg = jnp.concatenate([
        (dcn * u_g) * i_g * (1.0 - i_g),
        (dcn * cf) * f_g * (1.0 - f_g),
        do * o_g * (1.0 - o_g),
        (dcn * i_g) * (1.0 - u_g * u_g)], axis=-1)

    w_h = p["Gates"]["weight"][:, :, -C:]
    ds = dg.astype(dt)
    dh = _dconv_x(ds, w_h)
    dw_h = _dconv_w(h, ds)
    dc = dcn * f_g

    dgx = dg.astype(gx.dtype)
    dp = _zero_like_tree(p)
    dp["Gates"]["weight"] = _scatter_hside_wgrad(p["Gates"]["weight"],
                                                 dw_h, C)
    return dp, dgx, dh.astype(dt), dc.astype(dt)


_lstm_hside_cell.defvjp(_lstm_hside_fwd, _lstm_hside_bwd)


def conv_lstm_hside_fused(p, gx, state, tile_h: int = 0,
                          interpret: bool = False):
    """Drop-in for layers.conv_lstm_apply_hside: the fused 4-gate ConvLSTM
    h-side completion as ONE Pallas pass (single conv on h, no reset-gate
    halo chain — simpler than the GRU cell).  state = (hidden, cell);
    gx = conv_lstm_x_gates(p, x), gate order (in, remember, out, cell) as
    the reference's fused 'Gates' conv (submodules.py:303-358).
    DIFFERENTIABLE (round 3): custom VJP — jax.grad through this matches
    the unfused path."""
    interpret = interpret or _INTERPRET
    prev_hidden, prev_cell = state
    C = prev_hidden.shape[-1]
    dt = prev_hidden.dtype
    th = tile_h or _pick_tile_h(prev_hidden.shape[1], prev_hidden.shape[2],
                                C, 2 if dt == jnp.bfloat16 else 4,
                                budget=256 * 1024)
    return _lstm_hside_cell(th, interpret, p, gx, prev_hidden, prev_cell)


def _full_kernel(x_prev, x_cur, x_next, h_prev, h_cur, h_next, b_ur, b_o,
                 w_ur, w_o, out_ref, *, tile_h: int, H: int, W: int, C: int):
    """Full ConvGRU cell (x AND h side): conv on cat(x, h) gives K=6C after
    the row-tap fold — full MXU contraction fill at the flagship scales."""
    i = pl.program_id(1)
    dt = h_cur.dtype

    def halo2(prev, cur, nxt):
        b = jnp.concatenate([prev[0, -2:], cur[0], nxt[0, :2]], axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 4, 1, 1), 0) \
            + i * tile_h - 2
        return jnp.where((row >= 0) & (row < H), b, jnp.zeros_like(b))

    xb = halo2(x_prev, x_cur, x_next)
    hb = halo2(h_prev, h_cur, h_next)
    xh = jnp.concatenate([xb, hb], axis=-1)          # [tile_h+4, W, 2C]

    ur = _conv9(xh, w_ur, tile_h + 2, 2 * C).reshape(tile_h + 2, W, 2 * C) \
        + b_ur[0].astype(jnp.float32)
    z = jax.nn.sigmoid(ur[1:tile_h + 1, :, :C])
    r = jax.nn.sigmoid(ur[..., C:])

    a = jnp.concatenate(
        [xb[1:tile_h + 3],
         (r * hb[1:tile_h + 3].astype(jnp.float32)).astype(dt)], axis=-1)
    out_g = jnp.tanh(_conv9(a, w_o, tile_h, 2 * C).reshape(tile_h, W, C)
                     + b_o[0].astype(jnp.float32))

    h_int = hb[2:tile_h + 2].astype(jnp.float32)
    out_ref[0] = (h_int * (1.0 - z) + out_g * z).astype(dt)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def _run_full(x, h, b_ur, b_o, w_ur, w_o, tile_h, interpret=False):
    B, H, W, C = h.shape
    n = H // tile_h
    blk = lambda fm: pl.BlockSpec((1, tile_h, W, C), fm)  # noqa: E731
    cur = blk(lambda b, i: (b, i, 0, 0))
    prv = blk(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    nxt = blk(lambda b, i: (b, jnp.minimum(i + 1, n - 1), 0, 0))
    bspec_ur = pl.BlockSpec((1, 2 * C), lambda b, i: (0, 0))
    bspec_o = pl.BlockSpec((1, C), lambda b, i: (0, 0))
    wspec_ur = pl.BlockSpec((3, 6 * C, 2 * C), lambda b, i: (0, 0, 0))
    wspec_o = pl.BlockSpec((3, 6 * C, C), lambda b, i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_full_kernel, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=(B, n),
        in_specs=[prv, cur, nxt, prv, cur, nxt,
                  bspec_ur, bspec_o, wspec_ur, wspec_o],
        out_specs=cur,
        interpret=interpret,
        compiler_params=_cparams(interpret),
    )(x, x, x, h, h, h, b_ur, b_o, w_ur, w_o)


def conv_gru_full_fused(p, x, prev_state, tile_h: int = 0,
                        interpret: bool = False):
    """Drop-in for layers.conv_gru_apply on TPU-friendly shapes: the whole
    ConvGRU cell in one Pallas pass — for the per-package (latency)
    streaming path where no precomputed gx exists.  The conv on cat(x, h)
    folds to a K=6C contraction (384 at the flagship scale-0: full MXU
    fill).  f32-accumulated gates; bf16 only (supports(..., lstm=True)
    budget — the 6C temps match the LSTM cell's footprint)."""
    interpret = interpret or _INTERPRET
    C = prev_state.shape[-1]
    dt = prev_state.dtype
    th = tile_h or _pick_tile_h(prev_state.shape[1], prev_state.shape[2], C,
                                2 if dt == jnp.bfloat16 else 4,
                                budget=256 * 1024)

    def prep(w):  # HWIO [3, 3, 2C, out] -> [3(dx), 6C(dy-concat), out]
        return jnp.stack([jnp.concatenate([w[dy, dx] for dy in range(3)],
                                          axis=0) for dx in range(3)])

    w_ur = prep(jnp.concatenate([p["update_gate"]["weight"],
                                 p["reset_gate"]["weight"]],
                                axis=-1)).astype(dt)
    w_o = prep(p["out_gate"]["weight"]).astype(dt)
    b_ur = jnp.concatenate([p["update_gate"]["bias"],
                            p["reset_gate"]["bias"]])[None].astype(dt)
    b_o = p["out_gate"]["bias"][None].astype(dt)
    return _run_full(x.astype(dt), prev_state, b_ur, b_o, w_ur, w_o, th,
                     interpret)


def conv_gru_hside_fused(p, gx, prev_state, tile_h: int = 0,
                         interpret: bool = False):
    """Drop-in for layers.conv_gru_apply_hside on TPU-friendly shapes.

    p: ConvGRU param dict (update_gate/reset_gate/out_gate, HWIO weights on
    cat(x, h)); gx: [B, H, W, 3C] precomputed x-side gates in
    (update, reset, out) order with biases folded in; prev_state
    [B, H, W, C].  Accumulates the convs in f32 (vs the XLA path's
    conv-native accumulation) — outputs agree to normal float tolerance.
    DIFFERENTIABLE (round 3): custom VJP — jax.grad through this matches
    the unfused path, so training's sequential critical path can run the
    fused kernel too (h-side weight grads from the op; x-slice weight and
    bias grads flow through conv_gru_x_gates)."""
    interpret = interpret or _INTERPRET
    C = prev_state.shape[-1]
    dt = prev_state.dtype
    th = tile_h or _pick_tile_h(prev_state.shape[1], prev_state.shape[2], C,
                                2 if dt == jnp.bfloat16 else 4)
    return _gru_hside_cell(th, interpret, p, gx, prev_state)
