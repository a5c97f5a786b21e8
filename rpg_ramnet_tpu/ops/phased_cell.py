"""Fused phased ConvLSTM cell: h-side 4-gate completion + time-gate blend
in ONE Pallas pass.

Reference semantics: RAM_Net/model/submodules.py:218-411 (PhasedConvLSTM —
a ConvLSTM whose output/cell are blended with the previous state by the
time gate k(t); tau/phase are per flattened-feature parameters).  The XLA
composition (ops.gru_hside.conv_lstm_hside_fused followed by the
layers.phased_gate_k elementwise blend) writes both LSTM outputs to HBM
and re-reads h_t, c_t, h0, c0 plus tau/phase for the blend — 8 map-sized
transfers per scale per step in a bandwidth-bound streaming regime.  Here
the blend runs in VMEM on the f32 gate outputs: c_t never round-trips and
only the three consumed maps (h_t for the next scale, and the blended
h_new/c_new state) are written.

Slot conventions kept verbatim from the reference (submodules.py:381-411):
the caller's state is (c0, h0); the ConvLSTM consumes them in its
(hidden, cell) slots, so inside the kernel `h` = c0 (the conv operand,
with row halos) and `c` = h0; the LSTM's hidden' output is c_t and its
cell' output is h_t.

DIFFERENTIABLE: custom VJP — forward is the Pallas kernel (the residual
variant additionally saves the gate activations), backward reuses the
fused LSTM cell's hand-derived h-side backward (gru_hside._lstm_hside_bwd)
with slot-swapped cotangents, plus the elementwise time-gate chain
(tau/phase/t gradients via jax.vjp on the gate formula — the same ops the
reference's autograd differentiates, so phased fine-tuning can run the
fused path).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .gru_hside import _conv9, _fold3, _pick_tile_h, _lstm_hside_bwd
from . import gru_hside


def supports(prev_state) -> bool:
    """Same envelope as the plain fused LSTM cell (bf16, tiled-friendly
    H/W/C); the extra tau/phase blocks and third output are small next to
    the 4C gx block already budgeted there."""
    return gru_hside.supports(prev_state, lstm=True)


def _phased_cell_math(h_prev, h_cur, h_next, c_cur, gx_cur, w4, tau, phase,
                      t, *, tile_h: int, H: int, W: int, C: int,
                      leak: float, ratio_on: float):
    """Shared body: returns (h_t, h_new, c_new, acts) — all f32 except the
    caller casts; acts = concat(in, rem, out, cell_g)."""
    i = pl.program_id(1)
    f32 = jnp.float32

    # 1-row halo (single 3x3 conv on h, no reset-gate chain)
    hb = jnp.concatenate([h_prev[0, -1:], h_cur[0], h_next[0, :1]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0) \
        + i * tile_h - 1
    hb = jnp.where((row >= 0) & (row < H), hb, jnp.zeros_like(hb))

    gates = _conv9(hb, w4, tile_h, C).reshape(tile_h, W, 4 * C) \
        + gx_cur[0].astype(f32)
    in_g = jax.nn.sigmoid(gates[..., :C])
    rem_g = jax.nn.sigmoid(gates[..., C:2 * C])
    out_g = jax.nn.sigmoid(gates[..., 2 * C:3 * C])
    cell_g = jnp.tanh(gates[..., 3 * C:])
    # LSTM cell'/hidden' — in phased naming: cell' = h_t, hidden' = c_t
    h_t = rem_g * c_cur[0].astype(f32) + in_g * cell_g
    c_t = out_g * jnp.tanh(h_t)

    # time gate k(t): same scalar ops as layers.phased_gate_k (f32)
    t_ = t[0, 0].astype(f32)
    tau_f = tau[...].astype(f32)
    phi = jnp.abs(jnp.fmod(t_ - phase[...].astype(f32), tau_f)) / tau_f
    k_up = 2.0 * phi / ratio_on
    k = jnp.where(phi < ratio_on, 2.0 - k_up, leak * phi)
    k = jnp.where(phi < 0.5 * ratio_on, k_up, k)

    # blended next state; h0 = c_cur input, c0 = h_cur center
    h_new = k * h_t + (1.0 - k) * c_cur[0].astype(f32)
    c_new = k * c_t + (1.0 - k) * h_cur[0].astype(f32)
    acts = jnp.concatenate([in_g, rem_g, out_g, cell_g], axis=-1)
    return h_t, h_new, c_new, acts


def _phased_kernel(h_prev, h_cur, h_next, c_cur, gx_cur, w4, tau, phase, t,
                   ht_ref, hnew_ref, cnew_ref, *, tile_h: int, H: int,
                   W: int, C: int, leak: float, ratio_on: float):
    dt = h_cur.dtype
    h_t, h_new, c_new, _ = _phased_cell_math(
        h_prev, h_cur, h_next, c_cur, gx_cur, w4, tau, phase, t,
        tile_h=tile_h, H=H, W=W, C=C, leak=leak, ratio_on=ratio_on)
    ht_ref[0] = h_t.astype(dt)
    hnew_ref[0] = h_new.astype(dt)
    cnew_ref[0] = c_new.astype(dt)


def _phased_kernel_res(h_prev, h_cur, h_next, c_cur, gx_cur, w4, tau, phase,
                       t, ht_ref, hnew_ref, cnew_ref, acts_ref, *,
                       tile_h: int, H: int, W: int, C: int, leak: float,
                       ratio_on: float):
    dt = h_cur.dtype
    h_t, h_new, c_new, acts = _phased_cell_math(
        h_prev, h_cur, h_next, c_cur, gx_cur, w4, tau, phase, t,
        tile_h=tile_h, H=H, W=W, C=C, leak=leak, ratio_on=ratio_on)
    ht_ref[0] = h_t.astype(dt)
    hnew_ref[0] = h_new.astype(dt)
    cnew_ref[0] = c_new.astype(dt)
    acts_ref[0] = acts.astype(dt)


@functools.partial(jax.jit, static_argnames=("tile_h", "leak", "ratio_on",
                                             "interpret", "residuals"))
def _run_phased(h, c, gx, w4, tau, phase, t, tile_h, leak, ratio_on,
                interpret=False, residuals=False):
    B, H, W, C = h.shape
    n = H // tile_h
    blk = lambda fm, ch=C: pl.BlockSpec((1, tile_h, W, ch), fm)  # noqa: E731
    cur = blk(lambda b, i: (b, i, 0, 0))
    prv = blk(lambda b, i: (b, jnp.maximum(i - 1, 0), 0, 0))
    nxt = blk(lambda b, i: (b, jnp.minimum(i + 1, n - 1), 0, 0))
    gspec = blk(lambda b, i: (b, i, 0, 0), 4 * C)
    wspec = pl.BlockSpec((3, 3 * C, 4 * C), lambda b, i: (0, 0, 0))
    tpspec = pl.BlockSpec((tile_h, W, C), lambda b, i: (i, 0, 0))
    tspec = pl.BlockSpec((1, 1), lambda b, i: (b, 0))
    shp = jax.ShapeDtypeStruct((B, H, W, C), h.dtype)
    if residuals:
        kern = _phased_kernel_res
        out_shape = (shp, shp, shp,
                     jax.ShapeDtypeStruct((B, H, W, 4 * C), h.dtype))
        out_specs = (cur, cur, cur, gspec)
    else:
        kern = _phased_kernel
        out_shape = (shp, shp, shp)
        out_specs = (cur, cur, cur)
    return pl.pallas_call(
        functools.partial(kern, tile_h=tile_h, H=H, W=W, C=C,
                          leak=leak, ratio_on=ratio_on),
        out_shape=out_shape,
        grid=(B, n),
        in_specs=[prv, cur, nxt, cur, gspec, wspec, tpspec, tpspec, tspec],
        out_specs=out_specs,
        interpret=interpret,
    )(h, h, h, c, gx, w4, tau, phase, t)


def _gate_k(tau, phase, t2, leak: float, ratio_on: float):
    """The time gate in XLA, identical formula to the kernel (and to
    layers.phased_gate_k) — used by the backward pass so tau/phase/t
    gradients come from jax.vjp on the exact forward ops."""
    f32 = jnp.float32
    t_ = t2[:, 0].astype(f32)[:, None, None, None]
    tau_f = tau.astype(f32)[None]
    phi = jnp.abs(jnp.fmod(t_ - phase.astype(f32)[None], tau_f)) / tau_f
    k_up = 2.0 * phi / ratio_on
    k = jnp.where(phi < ratio_on, 2.0 - k_up, leak * phi)
    return jnp.where(phi < 0.5 * ratio_on, k_up, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _phased_cell(tile_h, leak, ratio_on, interpret, p, gx, c0, h0, tau,
                 phase, t2):
    C = c0.shape[-1]
    dt = c0.dtype
    w4 = _fold3(p["Gates"]["weight"][:, :, -C:]).astype(dt)
    return _run_phased(c0, h0, gx, w4, tau, phase, t2, tile_h, leak,
                       ratio_on, interpret)


def _phased_cell_fwd(tile_h, leak, ratio_on, interpret, p, gx, c0, h0, tau,
                     phase, t2):
    C = c0.shape[-1]
    dt = c0.dtype
    w4 = _fold3(p["Gates"]["weight"][:, :, -C:]).astype(dt)
    h_t, h_new, c_new, acts = _run_phased(c0, h0, gx, w4, tau, phase, t2,
                                          tile_h, leak, ratio_on, interpret,
                                          residuals=True)
    return (h_t, h_new, c_new), (p, gx, c0, h0, tau, phase, t2, h_t, acts)


def _phased_cell_bwd(tile_h, leak, ratio_on, interpret, res, g):
    """Backward: the k(t) blend chain (elementwise; tau/phase/t via
    jax.vjp on the gate formula) feeding the fused LSTM cell's
    hand-derived h-side backward with SLOT-SWAPPED cotangents — the LSTM's
    hidden' is the phased c_t and its cell' is the phased h_t."""
    p, gx, c0, h0, tau, phase, t2, h_t, acts = res
    gy, ghn, gcn = g
    C = c0.shape[-1]
    f32 = jnp.float32

    k, gate_vjp = jax.vjp(
        lambda a, b, c: _gate_k(a, b, c, leak, ratio_on), tau, phase, t2)
    htf = h_t.astype(f32)
    out_g = acts[..., 2 * C:3 * C].astype(f32)
    c_t = out_g * jnp.tanh(htf)                       # recomputed hidden'
    gyf, ghnf, gcnf = (x.astype(f32) for x in (gy, ghn, gcn))

    dk = ghnf * (htf - h0.astype(f32)) + gcnf * (c_t - c0.astype(f32))
    dtau, dphase, dt2 = gate_vjp(dk)

    g_hidden = gcnf * k                               # cot of hidden' (c_t)
    g_cell = gyf + ghnf * k                           # cot of cell'  (h_t)
    # reuse the LSTM h-side backward: res=(p, gx, prev_hidden, prev_cell,
    # cell_new, acts) with prev_hidden=c0 (the conv operand), prev_cell=h0
    dp, dgx, dc0, dh0 = _lstm_hside_bwd(
        tile_h, interpret, (p, gx, c0, h0, h_t, acts),
        (g_hidden.astype(h_t.dtype), g_cell.astype(h_t.dtype)))
    # direct blend terms: h_new carries (1-k)*h0, c_new carries (1-k)*c0
    dc0 = (dc0.astype(f32) + gcnf * (1.0 - k)).astype(c0.dtype)
    dh0 = (dh0.astype(f32) + ghnf * (1.0 - k)).astype(h0.dtype)
    return (dp, dgx, dc0, dh0, dtau.astype(tau.dtype),
            dphase.astype(phase.dtype), dt2.astype(t2.dtype))


_phased_cell.defvjp(_phased_cell_fwd, _phased_cell_bwd)


def conv_lstm_phased_fused(p_lstm, p_phased, gx, state, times,
                           leak: float = 0.001, ratio_on: float = 0.1,
                           tile_h: int = 0, interpret: bool = False):
    """Drop-in for the phased layer's fused branch: state = (c0, h0) per
    the reference slot quirk; gx = layers.conv_lstm_x_gates(p_lstm, x).
    Returns (h_t, (h_new, c_new)).  tau/phase are stored per flattened
    torch-order feature (c*H*W + y*W + x); reshaping them to [H, W, C] is
    loop-invariant, so XLA hoists it out of scan/fori streaming bodies.
    Differentiable (custom VJP) including tau/phase/times gradients."""
    interpret = interpret or gru_hside._INTERPRET
    c0, h0 = state
    B, H, W, C = c0.shape
    dt = c0.dtype
    tau = jnp.moveaxis(p_phased["tau"].reshape(C, H, W), 0, -1)
    phase = jnp.moveaxis(p_phased["phase"].reshape(C, H, W), 0, -1)
    t2 = times.reshape(B, 1).astype(jnp.float32)
    th = tile_h or _pick_tile_h(H, W, C, 2 if dt == jnp.bfloat16 else 4,
                                budget=256 * 1024)
    h_t, h_new, c_new = _phased_cell(th, leak, ratio_on, interpret,
                                     p_lstm, gx, c0, h0, tau, phase, t2)
    return h_t, (h_new, c_new)
