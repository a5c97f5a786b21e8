"""Cross-scale merged ConvGRU h-side cell: TWO scales in ONE Pallas launch.

Round-3 verdict lever: the record program's sequential while floor charges
~31 us of XLA bookkeeping per custom-call boundary (0.56 ms/pkg over 18
per-scale cell launches).  The per-scale h-side completions of one modality
step are independent, so this kernel runs scales 0 and 1 (the two largest)
in a single pallas_call: grid (B, n0 + n1), the kernel body dispatching on
the grid position with pl.when, per-scale BlockSpec index maps clamped so an
inactive scale's blocks are never re-fetched.

Why only TWO scales: at the flagship shapes every scale wants tile_h=16
(the per-grid-step fixed cost of ~9-23 us dominates below that —
PERF.md round-3 gru_chunk findings), and a 3-scale merge at tile 16 needs
~15.4 MB of double-buffered operand blocks + 4.4 MB of folded weights
(scale-2's C=256 weights alone are 3.4 MB) — over the ~16 MB VMEM.  Scales
0+1 fit in ~12-13 MB; scale 2 stays a separate per-scale launch.

Math identical to ops/gru_hside (v2 halo-side-array design; reference
semantics RAM_Net/model/submodules.py:414-454).  Inference-only: no VJP
(training keeps the per-scale residual cells).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gru_hside import (_fold3, _gru_cell_math_v2, _halos, _pick_tile_h)

# XLA's aggressive-VMEM-placement pass may assign this kernel's OUTPUTS to
# VMEM when the surrounding program keeps h resident between launches (seen
# in the chunked record program: outputs 6.3 MB S(1) + the kernel's ~10.8 MB
# double-buffered blocks = 17.08 MB > the 16 MB default scoped-vmem cap, so
# the FULL-program compile died while the standalone kernel fit — round-5
# isolation, exp/pair_e2e_bisect.py / pair_e2e_errors.txt).  Raise the cap
# for this kernel: v5e has 128 MiB physical VMEM; 32 MiB covers blocks +
# both outputs with headroom.
_VMEM_LIMIT = 32 * 1024 * 1024

# Test hook: run the kernel in interpret mode (CPU tests).
_INTERPRET = False


def _pair_kernel(h0c, h0t, h0b, g0z, g0r, g0rt, g0rb, g0o, w0ur, w0o,
                 h1c, h1t, h1b, g1z, g1r, g1rt, g1rb, g1o, w1ur, w1o,
                 out0, out1, *, t0: int, H0: int, W0: int, C0: int, n0: int,
                 t1: int, H1: int, W1: int, C1: int):
    j = pl.program_id(1)

    @pl.when(j < n0)
    def _scale0():
        h_new, _, _, _ = _gru_cell_math_v2(
            h0c, h0t, h0b, g0z, g0r, g0rt, g0rb, g0o, w0ur, w0o,
            tile_h=t0, H=H0, W=W0, C=C0, i=j)
        out0[0] = h_new

    @pl.when(j >= n0)
    def _scale1():
        h_new, _, _, _ = _gru_cell_math_v2(
            h1c, h1t, h1b, g1z, g1r, g1rt, g1rb, g1o, w1ur, w1o,
            tile_h=t1, H=H1, W=W1, C=C1, i=j - n0)
        out1[0] = h_new


@functools.partial(jax.jit, static_argnames=("t0", "t1", "interpret"))
def _run_pair(h0, g0z, g0r, g0o, w0ur, w0o,
              h1, g1z, g1r, g1o, w1ur, w1o, t0, t1, interpret=False):
    B, H0, W0, C0 = h0.shape
    _, H1, W1, C1 = h1.shape
    n0, n1 = H0 // t0, H1 // t1
    h0t, h0b = _halos(h0, t0, 2)
    g0rt, g0rb = _halos(g0r, t0, 1)
    h1t, h1b = _halos(h1, t1, 2)
    g1rt, g1rb = _halos(g1r, t1, 1)

    def blk(t, W, C, off=None):
        if off is None:
            fm = lambda b, j: (b, jnp.clip(j, 0, n0 - 1), 0, 0)   # noqa: E731
        else:
            fm = lambda b, j: (b, jnp.clip(j - off, 0, n1 - 1), 0, 0)  # noqa: E731,E501
        return pl.BlockSpec((1, t, W, C), fm)

    def halo_spec(rows, W, C, off=None):
        if off is None:
            fm = lambda b, j: (b, jnp.clip(j, 0, n0 - 1), 0, 0, 0)  # noqa: E731,E501
        else:
            fm = lambda b, j: (b, jnp.clip(j - off, 0, n1 - 1), 0, 0, 0)  # noqa: E731,E501
        return pl.BlockSpec((1, 1, rows, W, C), fm)

    wconst = lambda *shape: pl.BlockSpec(shape, lambda b, j: (0,) * len(shape))  # noqa: E731,E501

    in_specs = [
        blk(t0, W0, C0), halo_spec(2, W0, C0), halo_spec(2, W0, C0),
        blk(t0, W0, C0),
        blk(t0, W0, C0), halo_spec(1, W0, C0), halo_spec(1, W0, C0),
        blk(t0, W0, C0),
        wconst(3, 3 * C0, 2 * C0), wconst(3, 3 * C0, C0),
        blk(t1, W1, C1, n0), halo_spec(2, W1, C1, n0), halo_spec(2, W1, C1, n0),
        blk(t1, W1, C1, n0),
        blk(t1, W1, C1, n0), halo_spec(1, W1, C1, n0), halo_spec(1, W1, C1, n0),
        blk(t1, W1, C1, n0),
        wconst(3, 3 * C1, 2 * C1), wconst(3, 3 * C1, C1),
    ]
    out_specs = (blk(t0, W0, C0), blk(t1, W1, C1, n0))
    out_shape = (jax.ShapeDtypeStruct((B, H0, W0, C0), h0.dtype),
                 jax.ShapeDtypeStruct((B, H1, W1, C1), h1.dtype))
    return pl.pallas_call(
        functools.partial(_pair_kernel, t0=t0, H0=H0, W0=W0, C0=C0, n0=n0,
                          t1=t1, H1=H1, W1=W1, C1=C1),
        out_shape=out_shape,
        grid=(B, n0 + n1),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(h0, h0t, h0b, g0z, g0r, g0rt, g0rb, g0o, w0ur, w0o,
      h1, h1t, h1b, g1z, g1r, g1rt, g1rb, g1o, w1ur, w1o)


def _pair_tiles(h0, h1):
    """tile_h per scale under the PAIR VMEM budget: ~5 full planes per
    scale double-buffered + both scales' folded weights must fit together,
    so each scale gets the standard 512K-block budget only if the other
    does too (the flagship scales all satisfy tile 16 at 512K)."""
    t0 = _pick_tile_h(h0.shape[1], h0.shape[2], h0.shape[3], 2)
    t1 = _pick_tile_h(h1.shape[1], h1.shape[2], h1.shape[3], 2)
    return t0, t1


def supports_pair(h0, h1) -> bool:
    """Both scales bf16, aligned, tile-able (same gates as the per-scale
    v1 cell).  VMEM feasibility is decided by the compiler, not a host
    formula: conservative double-buffer arithmetic rejects configurations
    the Mosaic allocator demonstrably fits (the per-scale v1 cell at the
    flagship scale-0 'costs' ~14 MB by that accounting yet compiles and
    runs) — a genuine overflow surfaces as a compile error on this
    EXPLICITLY OPT-IN path, and the A/B probes record it per leg."""
    for h in (h0, h1):
        if h.ndim != 4 or h.dtype != jnp.bfloat16:
            return False
        if h.shape[2] % 8 or h.shape[3] % 8:
            return False
    t0, t1 = _pair_tiles(h0, h1)
    return bool(t0 and t1)


def conv_gru_hside_pair(p0, p1, gx0, gx1, h0, h1):
    """Two scales' ConvGRU h-side completions in one launch.

    p_i: the scale's recurrent_block params ({update,reset,out}_gate
    full-width weights; the h-slice is the trailing C channels);
    gx_i: [B, h, w, 3C] precomputed x-side gate pre-activations
    (z | r | o thirds); h_i: [B, h, w, C] previous super state."""
    C0, C1 = h0.shape[-1], h1.shape[-1]
    dt0, dt1 = h0.dtype, h1.dtype
    w0ur = _fold3(jnp.concatenate(
        [p0["update_gate"]["weight"][:, :, -C0:],
         p0["reset_gate"]["weight"][:, :, -C0:]], axis=-1)).astype(dt0)
    w0o = _fold3(p0["out_gate"]["weight"][:, :, -C0:]).astype(dt0)
    w1ur = _fold3(jnp.concatenate(
        [p1["update_gate"]["weight"][:, :, -C1:],
         p1["reset_gate"]["weight"][:, :, -C1:]], axis=-1)).astype(dt1)
    w1o = _fold3(p1["out_gate"]["weight"][:, :, -C1:]).astype(dt1)
    t0, t1 = _pair_tiles(h0, h1)
    return _run_pair(h0, gx0[..., :C0], gx0[..., C0:2 * C0], gx0[..., 2 * C0:],
                     w0ur, w0o,
                     h1, gx1[..., :C1], gx1[..., C1:2 * C1], gx1[..., 2 * C1:],
                     w1ur, w1o, t0, t1,
                     interpret=_INTERPRET or jax.default_backend() == "cpu")
