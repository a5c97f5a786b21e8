"""gx-STREAMING fused ConvGRU h-side cell (round 4).

The per-step fused cells (ops/gru_hside) take their gx gate slices as
custom-call operands, and custom-call operands cannot fuse with their
producers — so inside the precomputed-path scan, XLA must MATERIALIZE the
per-step gx slices of the full-sequence buffers every step (~109 MB/package
of slice writes at the flagship shapes, plus the per-operand lane padding
of three separate C=64 thirds).

This variant removes the materialization: the cell reads its gx blocks
DIRECTLY from the full per-scale sequence buffer via a scalar-prefetched
step index in the BlockSpec index maps (pltpu.PrefetchScalarGridSpec) —
the scan body closes over the invariant buffers and carries only the step
counter.  One 3C-channel gx block per step replaces three lane-padded C
blocks, and the gxr row halos come from skinny side-arrays precomputed
ONCE for the whole sequence.

Constraints: batch 1 (the single-stream record path — exactly where the
sequential while floor is the bottleneck), convgru, bf16 on hardware.
Math identical to ops/gru_hside (reference ConvGRU:
RAM_Net/model/submodules.py:414-454).  Inference-only (no VJP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru_hside import _conv9, _fold3, _pick_tile_h, supports  # noqa: F401

# Test hook: run in interpret mode (CPU tests).
_INTERPRET = False

# Same scoped-VMEM hazard as ops/gru_pair (see the note there): when XLA's
# VMEM-placement pass keeps this kernel's outputs in VMEM inside the big
# streaming program, blocks + outputs exceed the 16 MB default cap.
_VMEM_LIMIT = 32 * 1024 * 1024


def _stream_cell_math(i, h_prev, h_cur, h_next, gx, grt, grb, w_ur, w_o,
                      *, tile_h: int, H: int, W: int, C: int):
    """Shared stream-cell body: one h-side ConvGRU completion on tile i,
    gx block pre-selected by the prefetched step scalar.  h arrives with
    v1-style neighbor blocks (2-row halo via prev/next); gxr's 1-row halo
    arrives as skinny side-array rows (zero/garbage edge rows are killed
    by the h mask, as in the v1/v2 kernels)."""
    t = tile_h
    dt = h_cur.dtype

    hb = jnp.concatenate([h_prev[-2:], h_cur[...], h_next[:2]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0) + i * t - 2
    hb = jnp.where((row >= 0) & (row < H), hb, jnp.zeros_like(hb))

    g = gx[0]                                    # [t, W, 3C]
    gr = jnp.concatenate([grt[0, 0], g[..., C:2 * C], grb[0, 0]], axis=0)

    ur = _conv9(hb, w_ur, t + 2, C).reshape(t + 2, W, 2 * C)
    r = jax.nn.sigmoid(ur[..., C:] + gr.astype(jnp.float32))
    z = jax.nn.sigmoid(ur[1:t + 1, :, :C] + g[..., :C].astype(jnp.float32))

    a = (r * hb[1:t + 3].astype(jnp.float32)).astype(dt)
    out_g = jnp.tanh(_conv9(a, w_o, t, C).reshape(t, W, C)
                     + g[..., 2 * C:].astype(jnp.float32))
    h_int = hb[2:t + 2].astype(jnp.float32)
    return (h_int * (1.0 - z) + out_g * z).astype(dt)


def _stream_kernel(s_ref, h_prev, h_cur, h_next, gx, grt, grb, w_ur, w_o,
                   out_ref, *, tile_h: int, H: int, W: int, C: int):
    out_ref[...] = _stream_cell_math(
        pl.program_id(0), h_prev, h_cur, h_next, gx, grt, grb, w_ur, w_o,
        tile_h=tile_h, H=H, W=W, C=C)


def _stream_pair_kernel(s_ref,
                        h0p, h0c, h0n, gx0, g0t, g0b, w0ur, w0o,
                        h1p, h1c, h1n, gx1, g1t, g1b, w1ur, w1o,
                        out0, out1, *, t0: int, H0: int, W0: int, C0: int,
                        n0: int, t1: int, H1: int, W1: int, C1: int):
    """Two scales' stream cells in ONE launch (ops/gru_pair's dispatch
    structure + the scalar-prefetched gx indexing): grid (n0 + n1),
    pl.when on the grid position, per-scale clamped index maps."""
    j = pl.program_id(0)

    @pl.when(j < n0)
    def _scale0():
        out0[...] = _stream_cell_math(
            j, h0p, h0c, h0n, gx0, g0t, g0b, w0ur, w0o,
            tile_h=t0, H=H0, W=W0, C=C0)

    @pl.when(j >= n0)
    def _scale1():
        out1[...] = _stream_cell_math(
            j - n0, h1p, h1c, h1n, gx1, g1t, g1b, w1ur, w1o,
            tile_h=t1, H=H1, W=W1, C=C1)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def _run_stream(sel, h, gx_seq, gxr_top, gxr_bot, w_ur, w_o, tile_h,
                interpret=False):
    """h: [H, W, C] (batch squeezed); gx_seq: [S, H, W, 3C];
    gxr_top/bot: [S, n, 1, W, C] skinny halo side-arrays;
    sel: [1] int32 — the step index s."""
    H, W, C = h.shape
    n = H // tile_h
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((tile_h, W, C),
                         lambda i, s: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((tile_h, W, C), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((tile_h, W, C),
                         lambda i, s: (jnp.minimum(i + 1, n - 1), 0, 0)),
            pl.BlockSpec((1, tile_h, W, 3 * C),
                         lambda i, s: (s[0], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, W, C), lambda i, s: (s[0], i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, W, C), lambda i, s: (s[0], i, 0, 0, 0)),
            pl.BlockSpec((3, 3 * C, 2 * C), lambda i, s: (0, 0, 0)),
            pl.BlockSpec((3, 3 * C, C), lambda i, s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_h, W, C), lambda i, s: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_stream_kernel, tile_h=tile_h, H=H, W=W, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W, C), h.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(sel, h, h, h, gx_seq, gxr_top, gxr_bot, w_ur, w_o)


@functools.partial(jax.jit, static_argnames=("t0", "t1", "interpret"))
def _run_stream_pair(sel, h0, gx0, g0t, g0b, w0ur, w0o,
                     h1, gx1, g1t, g1b, w1ur, w1o, t0, t1,
                     interpret=False):
    H0, W0, C0 = h0.shape
    H1, W1, C1 = h1.shape
    n0, n1 = H0 // t0, H1 // t1

    def m0(off=0):
        return lambda j, s: (jnp.clip(j + off, 0, n0 - 1), 0, 0)

    def m1(off=0):
        return lambda j, s: (jnp.clip(j - n0 + off, 0, n1 - 1), 0, 0)

    def gxm(n, base):
        if base == 0:
            return lambda j, s: (s[0], jnp.clip(j, 0, n - 1), 0, 0)
        return lambda j, s: (s[0], jnp.clip(j - base, 0, n - 1), 0, 0)

    def halom(n, base):
        if base == 0:
            return lambda j, s: (s[0], jnp.clip(j, 0, n - 1), 0, 0, 0)
        return lambda j, s: (s[0], jnp.clip(j - base, 0, n - 1), 0, 0, 0)

    wconst = lambda *shape: pl.BlockSpec(                      # noqa: E731
        shape, lambda j, s: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n0 + n1,),
        in_specs=[
            pl.BlockSpec((t0, W0, C0), m0(-1)),
            pl.BlockSpec((t0, W0, C0), m0(0)),
            pl.BlockSpec((t0, W0, C0), m0(1)),
            pl.BlockSpec((1, t0, W0, 3 * C0), gxm(n0, 0)),
            pl.BlockSpec((1, 1, 1, W0, C0), halom(n0, 0)),
            pl.BlockSpec((1, 1, 1, W0, C0), halom(n0, 0)),
            wconst(3, 3 * C0, 2 * C0), wconst(3, 3 * C0, C0),
            pl.BlockSpec((t1, W1, C1), m1(-1)),
            pl.BlockSpec((t1, W1, C1), m1(0)),
            pl.BlockSpec((t1, W1, C1), m1(1)),
            pl.BlockSpec((1, t1, W1, 3 * C1), gxm(n1, n0)),
            pl.BlockSpec((1, 1, 1, W1, C1), halom(n1, n0)),
            pl.BlockSpec((1, 1, 1, W1, C1), halom(n1, n0)),
            wconst(3, 3 * C1, 2 * C1), wconst(3, 3 * C1, C1),
        ],
        out_specs=(pl.BlockSpec((t0, W0, C0), m0(0)),
                   pl.BlockSpec((t1, W1, C1), m1(0))),
    )
    return pl.pallas_call(
        functools.partial(_stream_pair_kernel, t0=t0, H0=H0, W0=W0, C0=C0,
                          n0=n0, t1=t1, H1=H1, W1=W1, C1=C1),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((H0, W0, C0), h0.dtype),
                   jax.ShapeDtypeStruct((H1, W1, C1), h1.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(sel, h0, h0, h0, gx0, g0t, g0b, w0ur, w0o,
      h1, h1, h1, gx1, g1t, g1b, w1ur, w1o)


def stream_pair_step(plan0: "StreamPlan", plan1: "StreamPlan", h0, h1,
                     pkg_idx, k=None):
    """One modality step's h-side completions for scales 0 AND 1 in a
    single launch, gx blocks selected by the prefetched step scalar.
    h_i: [1, h, w, C_i] -> same."""
    interp = _INTERPRET or jax.default_backend() == "cpu"
    if k is None:
        sel = jnp.reshape(pkg_idx, (1,)).astype(jnp.int32)
        a0 = (plan0.gx_im, plan0.im_top, plan0.im_bot) + plan0.w_im
        a1 = (plan1.gx_im, plan1.im_top, plan1.im_bot) + plan1.w_im
    else:
        sel = jnp.reshape(pkg_idx * plan0.loop + k, (1,)).astype(jnp.int32)
        a0 = (plan0.gx_ev, plan0.ev_top, plan0.ev_bot) + plan0.w_ev
        a1 = (plan1.gx_ev, plan1.ev_top, plan1.ev_bot) + plan1.w_ev
    o0, o1 = _run_stream_pair(sel, h0[0], *a0, h1[0], *a1,
                              plan0.tile, plan1.tile, interpret=interp)
    return o0[None], o1[None]


def seq_halos(gx_seq, tile_h: int, C: int):
    """Skinny gxr halo side-arrays for the FULL sequence, computed once:
    gx_seq [S, H, W, 3C] -> (top, bot) [S, n, 1, W, C] where
    top[s, i] = gxr[s, i*t - 1] (edge rows carry rolled-in garbage — the
    kernels' h row mask makes them inert, as in gru_hside._halos)."""
    S, H, W, _ = gx_seq.shape
    n = H // tile_h
    gxr = gx_seq[..., C:2 * C].reshape(S, n, tile_h, W, C)
    top = jnp.roll(gxr[:, :, -1:], 1, axis=1)
    bot = jnp.roll(gxr[:, :, :1], -1, axis=1)
    return top, bot


class StreamPlan:
    """Per-scale invariants for the streaming scan: folded weights and the
    whole-sequence gxr halo side-arrays, prepared ONCE outside the scan."""

    def __init__(self, p_ev, p_im, gx_ev, gx_im, h0):
        """gx_ev: [l, b=1, loop, h, w, 3C]; gx_im: [l, b=1, h, w, 3C];
        h0: [1, h, w, C]."""
        _, H, W, C = h0.shape
        self.C = C
        self.H, self.W = H, W
        dt = h0.dtype
        self.tile = _pick_tile_h(H, W, C, 2 if dt == jnp.bfloat16 else 4)
        l, b, loop = gx_ev.shape[0], gx_ev.shape[1], gx_ev.shape[2]
        assert b == 1, "stream cells are single-stream (batch 1)"
        self.loop = loop
        self.gx_ev = gx_ev.reshape((l * loop,) + gx_ev.shape[3:])
        self.gx_im = gx_im.reshape((l,) + gx_im.shape[2:])
        self.ev_top, self.ev_bot = seq_halos(self.gx_ev, self.tile, C)
        self.im_top, self.im_bot = seq_halos(self.gx_im, self.tile, C)

        def fold(p):
            w_ur = _fold3(jnp.concatenate(
                [p["update_gate"]["weight"][:, :, -C:],
                 p["reset_gate"]["weight"][:, :, -C:]], axis=-1)).astype(dt)
            w_o = _fold3(p["out_gate"]["weight"][:, :, -C:]).astype(dt)
            return w_ur, w_o

        self.w_ev = fold(p_ev)
        self.w_im = fold(p_im)

    def step(self, h, pkg_idx, k=None):
        """One h-side completion: event sub-step k of package pkg_idx when
        k is given (static int), else the package's image step.
        h: [1, h, w, C] -> [1, h, w, C]."""
        interp = _INTERPRET or jax.default_backend() == "cpu"
        if k is None:
            sel = jnp.reshape(pkg_idx, (1,)).astype(jnp.int32)
            gx, top, bot = self.gx_im, self.im_top, self.im_bot
            w_ur, w_o = self.w_im
        else:
            sel = jnp.reshape(pkg_idx * self.loop + k, (1,)).astype(jnp.int32)
            gx, top, bot = self.gx_ev, self.ev_top, self.ev_bot
            w_ur, w_o = self.w_ev
        out = _run_stream(sel, h[0], gx, top, bot, w_ur, w_o, self.tile,
                          interpret=interp)
        return out[None]
