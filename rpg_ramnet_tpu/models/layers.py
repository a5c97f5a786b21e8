"""Functional NHWC conv layers with explicit param pytrees.

Design: every layer is a pair of pure functions ``*_init(key, ...) -> params``
and ``*_apply(params, x, ...) -> y``.  Params are nested dicts whose key names
mirror the reference PyTorch module names (reference model/submodules.py) so
that checkpoint conversion (compat/) is a mechanical transpose+regroup.

Data layout is NHWC (TPU-native; channels on the 128-lane minor dimension).
Conv kernels are stored HWIO.  All paddings are explicit (low, high) pairs so
outputs match torch's symmetric-padding semantics exactly (XLA 'SAME' pads
asymmetrically for stride 2 and would NOT match).

Capability parity reference: RAM_Net/model/submodules.py (ConvLayer:8,
UpsampleConvLayer:69, TransposedConvLayer:38, ResidualBlock:182, ConvLSTM:303,
ConvGRU:414, RecurrentConvLayer:100, Recurrent2ConvLayer:122).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# initializers (match torch defaults so training-from-scratch is comparable)
# ---------------------------------------------------------------------------


def _torch_conv_init(key, kh, kw, in_ch, out_ch, dtype=jnp.float32):
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on weight,
    uniform(+-1/sqrt(fan_in)) on bias; both reduce to U(-1/sqrt(fan_in), ...)
    for the weight bound sqrt(3)*gain/sqrt(fan_in) with gain=sqrt(1/3)."""
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    w = jax.random.uniform(k_w, (kh, kw, in_ch, out_ch), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (out_ch,), dtype, -bound, bound)
    return w, b


def _orthogonal_oihw(key, kh, kw, in_ch, out_ch, dtype=jnp.float32):
    """torch init.orthogonal_ on an OIHW conv weight flattens to
    (out_ch, in_ch*kh*kw) (reference submodules.py:429-431 for ConvGRU gates).
    Returns the HWIO layout equivalent."""
    rows, cols = out_ch, in_ch * kh * kw
    flat = jax.nn.initializers.orthogonal(column_axis=-1)(key, (rows, cols), dtype)
    oihw = flat.reshape(out_ch, in_ch, kh, kw)
    return jnp.transpose(oihw, (2, 3, 1, 0))  # -> HWIO


# ---------------------------------------------------------------------------
# primitive conv
# ---------------------------------------------------------------------------


def conv2d(x, w, b=None, stride: int = 1, padding: int = 0,
           input_layout: str = "NHWC"):
    """Conv with explicit symmetric padding (torch semantics); output NHWC.

    input_layout='NCHW' lets the conv itself absorb a channel-first input
    (used by the head convs on TPU so channel-first sequence storage needs
    no explicit transpose that XLA would hoist into a 25x lane-padded
    buffer — see PERF.md)."""
    dtype = x.dtype
    y = lax.conv_general_dilated(
        x, w.astype(dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=(input_layout, "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(dtype)
    return y


def conv2d_transpose(x, w, b=None, stride: int = 2, padding: int = 2,
                     output_padding: int = 1):
    """Matches torch nn.ConvTranspose2d(k, stride=2, padding, output_padding=1).

    Implemented as input dilation (lhs_dilation) + padded conv with the
    spatially-flipped kernel, which is the definition of transposed conv.
    """
    dtype = x.dtype
    kh, kw = w.shape[0], w.shape[1]
    # torch transposed conv: out = (in-1)*stride - 2*padding + k + output_padding
    pad_lo = kh - 1 - padding
    pad_hi = kh - 1 - padding + output_padding
    y = lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).astype(dtype),
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        y = y + b.astype(dtype)
    return y


def upsample2x_bilinear(x):
    """Bilinear x2 upsample, torch align_corners=False semantics (half-pixel
    centers), NHWC.  Equals f.interpolate(scale_factor=2, mode='bilinear',
    align_corners=False) used in reference submodules.py:88."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")


def _activation_fn(name: Optional[str]):
    if name is None or name == "identity":
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    raise KeyError(f"unknown activation {name}")


# ---------------------------------------------------------------------------
# ConvLayer  (reference submodules.py:8-35)
# ---------------------------------------------------------------------------


def conv_layer_init(key, in_ch, out_ch, kernel_size, norm=None, dtype=jnp.float32):
    kh = kw = kernel_size
    # torch: Conv2d bias is disabled under BN (submodules.py:13)
    w, b = _torch_conv_init(key, kh, kw, in_ch, out_ch, dtype)
    p = {"conv2d": {"weight": w} if norm == "BN" else {"weight": w, "bias": b}}
    if norm == "BN":
        # BatchNorm2d: affine + tracked stats
        p["norm_layer"] = {
            "weight": jnp.ones((out_ch,), dtype),
            "bias": jnp.zeros((out_ch,), dtype),
            "running_mean": jnp.zeros((out_ch,), dtype),
            "running_var": jnp.ones((out_ch,), dtype),
        }
    elif norm == "IN":
        # InstanceNorm2d(track_running_stats=True): affine=False (torch default)
        p["norm_layer"] = {
            "running_mean": jnp.zeros((out_ch,), dtype),
            "running_var": jnp.ones((out_ch,), dtype),
        }
    return p


class NormCtx:
    """Training-mode normalization context (pure-functional running stats).

    The reference trains with torch BatchNorm2d / InstanceNorm2d(
    track_running_stats=True) when configured (submodules.py:13-24):
    normalization uses BATCH statistics (biased variance), running stats
    update with momentum 0.1 using the UNBIASED variance.

    `stats` holds the current running stats as a flat dict keyed by the
    dotted param path of the norm dict (e.g. 'head_rgb.norm_layer'); it is
    typically part of a lax.scan carry so per-call sequential updates match
    torch exactly across a TBPTT window.  `out` collects the updated stats
    during tracing — sound under jit because the call order is deterministic
    and the values are consumed functionally by the caller in the same trace.
    """

    def __init__(self, stats, momentum: float = 0.1):
        self.stats = stats
        self.out = {}
        self.momentum = momentum

    def fetch(self, path, fallback):
        # a layer applied several times per package (e.g. head_events for
        # k event steps) must see its own earlier update, like torch's
        # in-place buffer momentum applied per call
        if path in self.out:
            return self.out[path]
        return self.stats.get(path, fallback)


def _train_bn(nl, x, eps, ctx, path):
    """torch BatchNorm2d .train(): normalize by batch stats, update running
    stats (unbiased var) with momentum."""
    m = jnp.mean(x, axis=(0, 1, 2))
    v = jnp.mean(jnp.square(x - m), axis=(0, 1, 2))
    y = (x - m) * lax.rsqrt(v + eps) * nl["weight"] + nl["bias"]
    n = x.shape[0] * x.shape[1] * x.shape[2]
    unbiased = v * (n / max(n - 1, 1))
    old = ctx.fetch(path, nl)
    mom = ctx.momentum
    ctx.out[path] = {
        "running_mean": (1 - mom) * old["running_mean"] + mom * m,
        "running_var": (1 - mom) * old["running_var"] + mom * unbiased,
    }
    return y


def _train_in(nl, x, eps, ctx, path):
    """torch InstanceNorm2d(track_running_stats=True) .train(): normalize
    each instance by its own (H, W) stats; running stats update with the
    batch mean of the per-instance stats (unbiased var over H*W)."""
    m = jnp.mean(x, axis=(1, 2), keepdims=True)          # [B,1,1,C]
    v = jnp.mean(jnp.square(x - m), axis=(1, 2), keepdims=True)
    y = (x - m) * lax.rsqrt(v + eps)
    n = x.shape[1] * x.shape[2]
    unbiased = v * (n / max(n - 1, 1))
    old = ctx.fetch(path, nl)
    mom = ctx.momentum
    ctx.out[path] = {
        "running_mean": (1 - mom) * old["running_mean"]
        + mom * jnp.mean(m[:, 0, 0, :], axis=0),
        "running_var": (1 - mom) * old["running_var"]
        + mom * jnp.mean(unbiased[:, 0, 0, :], axis=0),
    }
    return y


def _apply_norm(p, x, norm, eps=1e-5, ctx=None, path=""):
    """BN / IN matching the reference's torch semantics
    (submodules.py:21-24): eval mode uses the tracked running stats
    (BatchNorm2d affine, InstanceNorm2d(track_running_stats=True)
    non-affine); with a NormCtx (training) batch statistics are used and
    running-stat updates are collected into the ctx."""
    if norm not in ("BN", "IN"):
        return x
    nl = p["norm_layer"]
    if ctx is not None:
        # `path` is the dotted param path of the norm-stats dict itself
        fn = _train_bn if norm == "BN" else _train_in
        return fn(nl, x, eps, ctx, path)
    if norm == "BN":
        inv = lax.rsqrt(nl["running_var"] + eps)
        return (x - nl["running_mean"]) * inv * nl["weight"] + nl["bias"]
    inv = lax.rsqrt(nl["running_var"] + eps)
    return (x - nl["running_mean"]) * inv


def conv_layer_apply(p, x, stride=1, padding=0, activation="relu", norm=None,
                     input_layout="NHWC", ctx=None, path=""):
    out = conv2d(x, p["conv2d"]["weight"], p["conv2d"].get("bias"), stride,
                 padding, input_layout)
    out = _apply_norm(p, out, norm, ctx=ctx,
                      path=path + ".norm_layer" if path else "norm_layer")
    return _activation_fn(activation)(out)


# ---------------------------------------------------------------------------
# UpsampleConvLayer (submodules.py:69-97) / TransposedConvLayer (:38-66)
# ---------------------------------------------------------------------------


def upsample_conv_layer_init(key, in_ch, out_ch, kernel_size, norm=None, dtype=jnp.float32):
    return conv_layer_init(key, in_ch, out_ch, kernel_size, norm, dtype)


# -- subpixel ("fast upsample") decomposition of bilinear-2x + 5x5 conv -----
#
# The composite U2x -> conv5x5 is, in the interior, translation-invariant
# per output phase with 4x4 support at LOW resolution: 36% fewer MACs and no
# materialized 2x tensor (the decoder is ~57% of inference time, PERF.md).
# The phase kernels come from composing the half-pixel bilinear stencils
# (0.25/0.75) with the 5x5 weights via the 4x5 matrices S0/S1 below.  The
# borders (outermost 2 up-res rows/cols) mix the resize's replicate-clamp
# with the conv's zero padding and are NOT convolutional — they are
# recomputed exactly with the reference op on 4-pixel slabs and stitched.

_S0 = np.array([[0.25, 0.00, 0.00, 0.00, 0.00],
                [0.75, 0.75, 0.25, 0.00, 0.00],
                [0.00, 0.25, 0.75, 0.75, 0.25],
                [0.00, 0.00, 0.00, 0.25, 0.75]], np.float32)  # dm in {-2..1}
_S1 = np.array([[0.75, 0.25, 0.00, 0.00, 0.00],
                [0.25, 0.75, 0.75, 0.25, 0.00],
                [0.00, 0.00, 0.25, 0.75, 0.75],
                [0.00, 0.00, 0.00, 0.00, 0.25]], np.float32)  # dm in {-1..2}


def _phase_kernels(w):
    """w: [5, 5, Cin, Cout] -> {(p, q): [4, 4, Cin, Cout]} phase kernels."""
    s = {0: jnp.asarray(_S0), 1: jnp.asarray(_S1)}
    out = {}
    for p in (0, 1):
        for q in (0, 1):
            out[(p, q)] = jnp.einsum("au,uvio,bv->abio", s[p].astype(w.dtype),
                                     w, s[q].astype(w.dtype))
    return out


def upsample_conv_layer_fast_apply(p, x, padding=2, activation="relu",
                                   norm=None, ctx=None, path=""):
    """Exact fast equivalent of upsample_conv_layer_apply (bilinear 2x +
    5x5 conv, padding=2): interior via four 4x4 phase convolutions at low
    resolution, borders restitched from 4-pixel slabs of the reference op."""
    w = p["conv2d"]["weight"]
    b = p["conv2d"].get("bias")
    n, h, wd, cin = x.shape
    kern = _phase_kernels(w)
    xr = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")

    outs = {}
    for (pp, qq), k in kern.items():
        # dm support: {-2..1} for phase 0 (slice offset 0), {-1..2} for
        # phase 1 (slice offset 1); VALID 4-tap conv yields H (resp W) rows
        ro, co = (0 if pp == 0 else 1), (0 if qq == 0 else 1)
        sl = xr[:, ro:ro + h + 3, co:co + wd + 3, :]
        outs[(pp, qq)] = lax.conv_general_dilated(
            sl, k.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cout = w.shape[-1]
    y = jnp.zeros((n, 2 * h, 2 * wd, cout), outs[(0, 0)].dtype)
    for (pp, qq), v in outs.items():
        y = y.at[:, pp::2, qq::2, :].set(v)

    # exact border restitch: reference op on 4-pixel slabs (each slab's own
    # far-end clamp only affects its far outputs, which we discard)
    def ref_up(xs):
        return conv2d(upsample2x_bilinear(xs), w, None, 1, padding)

    y = y.at[:, :2, :, :].set(ref_up(x[:, :4, :, :])[:, :2])
    y = y.at[:, -2:, :, :].set(ref_up(x[:, -4:, :, :])[:, -2:])
    y = y.at[:, :, :2, :].set(ref_up(x[:, :, :4, :])[:, :, :2])
    y = y.at[:, :, -2:, :].set(ref_up(x[:, :, -4:, :])[:, :, -2:])
    # corners: both clamps interact; 4x4 corner slabs give them exactly
    y = y.at[:, :2, :2, :].set(ref_up(x[:, :4, :4, :])[:, :2, :2])
    y = y.at[:, :2, -2:, :].set(ref_up(x[:, :4, -4:, :])[:, :2, -2:])
    y = y.at[:, -2:, :2, :].set(ref_up(x[:, -4:, :4, :])[:, -2:, :2])
    y = y.at[:, -2:, -2:, :].set(ref_up(x[:, -4:, -4:, :])[:, -2:, -2:])

    if b is not None:
        y = y + b.astype(y.dtype)
    y = _apply_norm(p, y, norm, ctx=ctx,
                    path=path + ".norm_layer" if path else "norm_layer")
    return _activation_fn(activation)(y)


def upsample_conv_layer_apply(p, x, padding=2, activation="relu", norm=None,
                              ctx=None, path=""):
    out = conv2d(upsample2x_bilinear(x), p["conv2d"]["weight"],
                 p["conv2d"].get("bias"), 1, padding)
    out = _apply_norm(p, out, norm, ctx=ctx,
                      path=path + ".norm_layer" if path else "norm_layer")
    return _activation_fn(activation)(out)


# -- composed transposed-conv formulation of bilinear-2x + 5x5 conv ---------
#
# u[m] = sum_j c[m - 2j] x[j] with c = [.25, .75, .75, .25] (the bilinear
# half-pixel stencil as a stride-2 transposed conv), so the whole layer is
# ONE stride-2 transposed conv with the composed 8-tap kernel
# k_eff[t] = sum_d w[d] c[t + d], t in [-3, 4] — no materialized hi-res
# intermediate, ~16 effective input taps per output (vs 25), and XLA keeps
# its own native conv layouts (the Pallas kernel's in-context failure mode).
# Borders: edge-padding x by 2 reproduces the resize's clamp; the conv's
# zero padding at the outer 2 hi-res rows/cols differs, so those are
# restitched exactly from 4-pixel slabs of the reference op (contiguous
# edge overwrites only — no strided phase scatter).  Measured on v5e at
# the 96-deep chunked decode batch: 1.59x XLA on the 64->32 layer, 1.50x
# on 128->64, ~tie on 256->128; LOSES at small (latency-mode) batches
# (exp/decoder_composed_probe.json) — gating in statenet._use_composed.

_C4 = np.array([0.25, 0.75, 0.75, 0.25], np.float32)  # c[t], t in [-1..2]


def _composed_kernel_1d():
    k1 = np.zeros((8, 5), np.float32)          # [t_idx (t=-3..4), d_idx]
    for ti, t in enumerate(range(-3, 5)):
        for di, d in enumerate(range(-2, 3)):
            ci = t + d + 1
            if 0 <= ci < 4:
                k1[ti, di] = _C4[ci]
    return k1


def compose_upsample_conv_kernel(w):
    """w HWIO [5, 5, C, Cout] -> spatially-flipped composed kernel
    [8, 8, C, Cout] for conv_general_dilated(lhs_dilation=2, padding 0)
    on a 2-edge-padded input."""
    k1 = jnp.asarray(_composed_kernel_1d())
    k_eff = jnp.einsum("au,uvio,bv->abio", k1, w.astype(jnp.float32), k1)
    return jnp.flip(k_eff, (0, 1))


def upsample_conv_layer_composed_apply(p, x, activation="relu"):
    """Exact equivalent of upsample_conv_layer_apply(norm=None) as ONE
    stride-2 transposed conv + border restitch (see the derivation above).
    Differentiable (pure lax ops) and sharding-safe."""
    w = p["conv2d"]["weight"]
    b = p["conv2d"].get("bias")
    k = compose_upsample_conv_kernel(w).astype(x.dtype)
    xe = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        xe, k, (1, 1), ((0, 0), (0, 0)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)

    def ref_up(xs):
        return conv2d(upsample2x_bilinear(xs), w, b, 1, 2)

    y = y.at[:, :2, :, :].set(ref_up(x[:, :4, :, :])[:, :2])
    y = y.at[:, -2:, :, :].set(ref_up(x[:, -4:, :, :])[:, -2:])
    y = y.at[:, :, :2, :].set(ref_up(x[:, :, :4, :])[:, :, :2])
    y = y.at[:, :, -2:, :].set(ref_up(x[:, :, -4:, :])[:, :, -2:])
    y = y.at[:, :2, :2, :].set(ref_up(x[:, :4, :4, :])[:, :2, :2])
    y = y.at[:, :2, -2:, :].set(ref_up(x[:, :4, -4:, :])[:, :2, -2:])
    y = y.at[:, -2:, :2, :].set(ref_up(x[:, -4:, :4, :])[:, -2:, :2])
    y = y.at[:, -2:, -2:, :].set(ref_up(x[:, -4:, -4:, :])[:, -2:, -2:])
    return _activation_fn(activation)(y)


def transposed_conv_layer_init(key, in_ch, out_ch, kernel_size, norm=None, dtype=jnp.float32):
    kh = kw = kernel_size
    # torch ConvTranspose2d weight is (in, out, kh, kw); fan_in = out*k*k? No:
    # torch uses weight.size(1)*k*k = out_ch*k*k for ConvTranspose fan_in.
    fan_in = out_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    k_w, k_b = jax.random.split(key)
    w = jax.random.uniform(k_w, (kh, kw, in_ch, out_ch), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (out_ch,), dtype, -bound, bound)
    p = ({"transposed_conv2d": {"weight": w}} if norm == "BN"
         else {"transposed_conv2d": {"weight": w, "bias": b}})
    if norm == "BN":
        p["norm_layer"] = {
            "weight": jnp.ones((out_ch,), dtype), "bias": jnp.zeros((out_ch,), dtype),
            "running_mean": jnp.zeros((out_ch,), dtype), "running_var": jnp.ones((out_ch,), dtype),
        }
    elif norm == "IN":
        p["norm_layer"] = {
            "running_mean": jnp.zeros((out_ch,), dtype),
            "running_var": jnp.ones((out_ch,), dtype),
        }
    return p


def transposed_conv_layer_apply(p, x, padding=2, activation="relu", norm=None,
                                ctx=None, path=""):
    out = conv2d_transpose(x, p["transposed_conv2d"]["weight"],
                           p["transposed_conv2d"].get("bias"), 2, padding, 1)
    out = _apply_norm(p, out, norm, ctx=ctx,
                      path=path + ".norm_layer" if path else "norm_layer")
    return _activation_fn(activation)(out)


# ---------------------------------------------------------------------------
# ResidualBlock (submodules.py:182-215)
# ---------------------------------------------------------------------------


def residual_block_init(key, in_ch, out_ch, norm=None, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    w1, b1 = _torch_conv_init(k1, 3, 3, in_ch, out_ch, dtype)
    w2, b2 = _torch_conv_init(k2, 3, 3, out_ch, out_ch, dtype)
    if norm == "BN":
        p = {"conv1": {"weight": w1}, "conv2": {"weight": w2}}
    else:
        p = {"conv1": {"weight": w1, "bias": b1},
             "conv2": {"weight": w2, "bias": b2}}
    if norm == "BN":
        for n in ("bn1", "bn2"):
            p[n] = {"weight": jnp.ones((out_ch,), dtype), "bias": jnp.zeros((out_ch,), dtype),
                    "running_mean": jnp.zeros((out_ch,), dtype), "running_var": jnp.ones((out_ch,), dtype)}
    elif norm == "IN":
        # reference ResidualBlock uses InstanceNorm2d WITHOUT running stats
        # (submodules.py:193-194) -> per-instance stats, non-affine
        pass
    return p


def residual_block_apply(p, x, norm=None, eps=1e-5, ctx=None, path=""):
    # reference ResidualBlock IN is InstanceNorm2d() WITHOUT running stats
    # (submodules.py:193-194): per-instance stats in BOTH train and eval,
    # so no ctx handling is needed for IN here (torch semantics)
    residual = x
    out = conv2d(x, p["conv1"]["weight"], p["conv1"].get("bias"), 1, 1)
    if norm == "BN":
        out = _apply_norm({"norm_layer": p["bn1"]}, out, norm, ctx=ctx,
                          path=path + ".bn1" if path else "bn1")
    elif norm == "IN":
        out = (out - jnp.mean(out, (1, 2), keepdims=True)) * lax.rsqrt(
            jnp.var(out, (1, 2), keepdims=True) + eps)
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"]["weight"], p["conv2"].get("bias"), 1, 1)
    if norm == "BN":
        out = _apply_norm({"norm_layer": p["bn2"]}, out, norm, ctx=ctx,
                          path=path + ".bn2" if path else "bn2")
    elif norm == "IN":
        out = (out - jnp.mean(out, (1, 2), keepdims=True)) * lax.rsqrt(
            jnp.var(out, (1, 2), keepdims=True) + eps)
    return jax.nn.relu(out + residual)


# ---------------------------------------------------------------------------
# Recurrent cells.  Pure functions (params, x, state) -> (y, state)
# ---------------------------------------------------------------------------


def conv_lstm_init(key, input_size, hidden_size, kernel_size=3, dtype=jnp.float32):
    """ConvLSTM (submodules.py:303-358): one fused 4-gate conv on cat(x, h).
    Gate (channel-chunk) order: in, forget('remember'), out, cell."""
    w, b = _torch_conv_init(key, kernel_size, kernel_size,
                            input_size + hidden_size, 4 * hidden_size, dtype)
    return {"Gates": {"weight": w, "bias": b}}


def conv_lstm_apply(p, x, state: Tuple[jnp.ndarray, jnp.ndarray], padding=1):
    prev_hidden, prev_cell = state
    stacked = jnp.concatenate([x, prev_hidden], axis=-1)
    gates = conv2d(stacked, p["Gates"]["weight"], p["Gates"]["bias"], 1, padding)
    in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
    in_g = jax.nn.sigmoid(in_g)
    rem_g = jax.nn.sigmoid(rem_g)
    out_g = jax.nn.sigmoid(out_g)
    cell_g = jnp.tanh(cell_g)
    cell = rem_g * prev_cell + in_g * cell_g
    hidden = out_g * jnp.tanh(cell)
    return hidden, cell


def conv_gru_init(key, input_size, hidden_size, kernel_size=3, dtype=jnp.float32):
    """ConvGRU (submodules.py:414-454): three gate convs with orthogonal
    weight init and zero bias (submodules.py:429-434)."""
    ks = jax.random.split(key, 3)
    names = ("reset_gate", "update_gate", "out_gate")
    p = {}
    for k, name in zip(ks, names):
        w = _orthogonal_oihw(k, kernel_size, kernel_size,
                             input_size + hidden_size, hidden_size, dtype)
        p[name] = {"weight": w, "bias": jnp.zeros((hidden_size,), dtype)}
    return p


def conv_gru_apply(p, x, prev_state, padding=1):
    stacked = jnp.concatenate([x, prev_state], axis=-1)
    # update+reset share the same input; one fused conv halves the reads of
    # [x, h].  The weight concat is loop-invariant under scan (hoisted by
    # XLA), and the math is identical to two separate convs.
    w_ur = jnp.concatenate([p["update_gate"]["weight"],
                            p["reset_gate"]["weight"]], axis=-1)
    b_ur = jnp.concatenate([p["update_gate"]["bias"],
                            p["reset_gate"]["bias"]], axis=-1)
    ur = jax.nn.sigmoid(conv2d(stacked, w_ur, b_ur, 1, padding))
    hidden = prev_state.shape[-1]
    update, reset = ur[..., :hidden], ur[..., hidden:]
    stacked_reset = jnp.concatenate([x, prev_state * reset], axis=-1)
    out = jnp.tanh(conv2d(stacked_reset, p["out_gate"]["weight"], p["out_gate"]["bias"], 1, padding))
    return prev_state * (1.0 - update) + out * update


def conv_gru_x_gates(p, x, padding=1):
    """Precomputable x-side of the three ConvGRU gate convs, as ONE conv.

    conv([x, h], W) == conv(x, W[:, :, :Cx]) + conv(h, W[:, :, Cx:]) — the
    x-side is state-independent, so for recurrent_block_type='conv' configs
    it can run BATCHED over all steps of a sequence outside the scan, while
    only the h-side (half the MACs) stays on the sequential critical path
    (the per-scale GRU chain is ~40% of package time, PERF.md).  Returns
    [..., 3C] in (update, reset, out) gate order; the biases are folded in
    here so the h-side convs are bias-free."""
    hidden = p["update_gate"]["weight"].shape[3]
    cx = p["update_gate"]["weight"].shape[2] - hidden
    wx = jnp.concatenate([p[g]["weight"][:, :, :cx]
                          for g in ("update_gate", "reset_gate", "out_gate")],
                         axis=-1)
    bx = jnp.concatenate([p[g]["bias"]
                          for g in ("update_gate", "reset_gate", "out_gate")])
    return conv2d(x, wx, bx, 1, padding)


def conv_gru_apply_hside(p, gx, prev_state, padding=1):
    """Sequential h-side completion of conv_gru_apply given precomputed
    x-side gate contributions gx = conv_gru_x_gates(p, x).

    Matches conv_gru_apply up to float summation order: the fused [x, h]
    conv accumulates across the channel split inside one dot, here the two
    halves are summed post-conv (differences ~1 ulp; NOT bit-identical)."""
    hidden = prev_state.shape[-1]
    wh_ur = jnp.concatenate([p["update_gate"]["weight"][:, :, -hidden:],
                             p["reset_gate"]["weight"][:, :, -hidden:]],
                            axis=-1)
    ur = jax.nn.sigmoid(conv2d(prev_state, wh_ur, None, 1, padding)
                        + gx[..., :2 * hidden])
    update, reset = ur[..., :hidden], ur[..., hidden:]
    out = jnp.tanh(conv2d(prev_state * reset,
                          p["out_gate"]["weight"][:, :, -hidden:], None,
                          1, padding)
                   + gx[..., 2 * hidden:])
    return prev_state * (1.0 - update) + out * update


def conv_lstm_x_gates(p, x, padding=1):
    """Precomputable x-side of the fused 4-gate ConvLSTM conv (the convlstm
    analogue of conv_gru_x_gates; biases folded in here)."""
    w = p["Gates"]["weight"]
    hidden = w.shape[3] // 4
    cx = w.shape[2] - hidden
    return conv2d(x, w[:, :, :cx], p["Gates"]["bias"], 1, padding)


def conv_lstm_apply_hside(p, gx, state, padding=1):
    """Sequential h-side completion of conv_lstm_apply given precomputed
    x-side gate contributions gx = conv_lstm_x_gates(p, x).  Matches
    conv_lstm_apply up to float summation order (~1 ulp)."""
    prev_hidden, prev_cell = state
    hidden = prev_hidden.shape[-1]
    gates = conv2d(prev_hidden, p["Gates"]["weight"][:, :, -hidden:], None,
                   1, padding) + gx
    in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
    in_g = jax.nn.sigmoid(in_g)
    rem_g = jax.nn.sigmoid(rem_g)
    out_g = jax.nn.sigmoid(out_g)
    cell_g = jnp.tanh(cell_g)
    cell = rem_g * prev_cell + in_g * cell_g
    return out_g * jnp.tanh(cell), cell


# RecurrentConvLayer (submodules.py:100-120): bare recurrent block (its conv
# is commented out in the reference), used for per-scale state combination.


def recurrent_conv_layer_init(key, out_ch, recurrent_block_type="convlstm", dtype=jnp.float32):
    if recurrent_block_type == "convlstm":
        blk = conv_lstm_init(key, out_ch, out_ch, 3, dtype)
    else:
        blk = conv_gru_init(key, out_ch, out_ch, 3, dtype)
    return {"recurrent_block": blk}


def recurrent_conv_layer_apply(p, x, prev_state, recurrent_block_type="convlstm"):
    """Returns (y, state) like the reference: y = hidden for convlstm, y = new
    state for convgru."""
    if recurrent_block_type == "convlstm":
        state = conv_lstm_apply(p["recurrent_block"], x, prev_state)
        return state[0], state
    state = conv_gru_apply(p["recurrent_block"], x, prev_state)
    return state, state


# Recurrent2ConvLayer (submodules.py:122-142): conv (stride-2) then recurrent.


def recurrent2_conv_layer_init(key, in_ch, out_ch, kernel_size=5,
                               recurrent_block_type="convlstm", norm=None, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {"conv": conv_layer_init(k1, in_ch, out_ch, kernel_size, norm, dtype)}
    if recurrent_block_type == "convlstm":
        p["recurrent_block"] = conv_lstm_init(k2, out_ch, out_ch, 3, dtype)
    else:
        p["recurrent_block"] = conv_gru_init(k2, out_ch, out_ch, 3, dtype)
    return p


def recurrent2_conv_layer_apply(p, x, prev_state, stride=2, padding=2,
                                recurrent_block_type="convlstm", norm=None,
                                ctx=None, path=""):
    x = conv_layer_apply(p["conv"], x, stride, padding, "relu", norm,
                         ctx=ctx, path=path + ".conv" if path else "conv")
    if recurrent_block_type == "convlstm":
        state = conv_lstm_apply(p["recurrent_block"], x, prev_state)
        return state[0], state
    state = conv_gru_apply(p["recurrent_block"], x, prev_state)
    return state, state


# ---------------------------------------------------------------------------
# PhasedLSTM time gate (submodules.py:218-300) — irregular-timestamp hook.
# ---------------------------------------------------------------------------


def phased_lstm_gate_init(key, hidden_size, period_init_min=0.02,
                          period_init_max=50.0, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    log_period = jax.random.uniform(
        k1, (hidden_size,), dtype, math.log(period_init_min), math.log(period_init_max))
    tau = jnp.exp(log_period)
    phase = jax.random.uniform(k2, (hidden_size,), dtype) * tau
    return {"tau": tau, "phase": phase}


def phased_conv_lstm_init(key, input_channels, hidden_channels, height, width,
                          kernel_size=3, dtype=jnp.float32):
    """PhasedConvLSTMCell (submodules.py:361-411): a ConvLSTM whose output
    states are blended with the previous states by a learnable time gate
    over the flattened feature map (hidden_size = C*H*W).  In the reference
    the gate is lazily created on first forward; here the spatial size is
    part of the config (spatial_resolution), so init is eager."""
    k1, k2 = jax.random.split(key)
    return {
        "lstm": conv_lstm_init(k1, input_channels, hidden_channels, kernel_size, dtype),
        "phased_cell": phased_lstm_gate_init(k2, hidden_channels * height * width,
                                             dtype=dtype),
    }


def _flatten_torch_order(x):
    """[B, H, W, C] -> [B, C*H*W] matching torch's NCHW .view(B, -1), so the
    per-feature tau/phase parameters line up with reference checkpoints."""
    return jnp.moveaxis(x, -1, 1).reshape(x.shape[0], -1)


def _unflatten_torch_order(x, h, w, c):
    return jnp.moveaxis(x.reshape(x.shape[0], c, h, w), 1, -1)


def phased_gate_k(p, t, h, w, c, leak=0.001, ratio_on=0.1):
    """Time-gate openness k(t) evaluated directly in NHWC layout.

    tau/phase are stored per flattened torch-order feature (f = c*H*W +
    y*W + x, submodules.py:218-300 — matching reference checkpoints);
    reshaping THEM to [H, W, C] here means the blend runs in the native
    TPU layout: the previous flatten/unflatten round trip physically
    transposed four full feature maps to NCHW and two back per scale per
    step.  The parameter reshape/transpose is loop-invariant, so XLA
    hoists it out of scan/fori_loop streaming and TBPTT bodies.  Same
    scalar ops per element as phased_lstm_gate_apply — values identical."""
    tau = jnp.moveaxis(p["tau"].reshape(c, h, w), 0, -1)[None]
    phase = jnp.moveaxis(p["phase"].reshape(c, h, w), 0, -1)[None]
    t_ = t[:, None, None, None]
    phi = jnp.abs(jnp.fmod(t_ - phase, tau)) / tau
    k_up = 2.0 * phi / ratio_on
    k_down = 2.0 - k_up
    k = jnp.where(phi < ratio_on, k_down, leak * phi)
    return jnp.where(phi < 0.5 * ratio_on, k_up, k)


def phased_conv_lstm_apply(p, x, times, state, padding=1, fused=False):
    """Reference forward (submodules.py:381-411), including its state-slot
    conventions: state=(c0, h0); the ConvLSTM consumes them in its
    (hidden, cell) slots; returns (h_t, (c_s, h_s)) where the time gate k(t)
    blends new vs previous states (evaluated in NHWC — phased_gate_k).

    fused=True: x/h split + the fused Pallas LSTM h-side cell
    (ops.gru_hside.conv_lstm_hside_fused) — differentiable; deviates from
    the single fused [x, h] conv by float summation order (~1 ulp).
    Callers gate on shape support (statenet._use_fused_cell)."""
    c0, h0 = state
    # the reference feeds (c0, h0) into the ConvLSTM's (hidden, cell) slots
    # and unpacks its (hidden, cell) return as (c_t, h_t) — kept verbatim
    if fused:
        gx = conv_lstm_x_gates(p["lstm"], x, padding)
        if padding == 1:
            # single-launch cell: h-side gates + time-gate blend in VMEM
            # (c_t never round-trips through HBM; ops/phased_cell.py)
            from ..ops.phased_cell import conv_lstm_phased_fused
            return conv_lstm_phased_fused(p["lstm"], p["phased_cell"], gx,
                                          (c0, h0), times)
        from ..ops.gru_hside import conv_lstm_hside_fused
        c_t, h_t = conv_lstm_hside_fused(p["lstm"], gx, (c0, h0))
    else:
        c_t, h_t = conv_lstm_apply(p["lstm"], x, (c0, h0), padding)
    hh, ww, ch = c_t.shape[1], c_t.shape[2], c_t.shape[3]
    k = phased_gate_k(p["phased_cell"], times, hh, ww, ch)
    # (h_new, c_new) = (k*h_t+(1-k)*h0, k*c_t+(1-k)*c0); the reference
    # stores exactly this pair as the next (c0, h0) state.  The blend runs
    # in f32 (tau/phase params are f32 -> k is f32) and is cast back to the
    # compute/state dtype: without the cast a bf16 run's state would be
    # promoted to f32 after the first step, changing the scan/fori carry
    # structure (no-op for f32 runs).
    dt = h_t.dtype
    return h_t, ((k * h_t + (1.0 - k) * h0).astype(dt),
                 (k * c_t + (1.0 - k) * c0).astype(dt))


def downsample_recurrent_conv_layer_init(key, in_ch, out_ch, kernel_size=3,
                                         recurrent_block_type="convlstm",
                                         dtype=jnp.float32):
    """DownsampleRecurrentConvLayer (submodules.py:160-178): recurrent block
    then bilinear 0.5x downsample + activation."""
    if recurrent_block_type == "convlstm":
        blk = conv_lstm_init(key, in_ch, out_ch, kernel_size, dtype)
    else:
        blk = conv_gru_init(key, in_ch, out_ch, kernel_size, dtype)
    return {"recurrent_block": blk}


def downsample_half_bilinear(x):
    """torch f.interpolate(scale_factor=0.5, bilinear, align_corners=False)
    WITHOUT antialiasing: output (j+0.5)*2-0.5 = 2j+0.5 samples reduce to an
    exact 2x2 average (jax.image.resize would antialias instead)."""
    n, h, w, c = x.shape
    hh, ww = h // 2, w // 2
    return x[:, :hh * 2, :ww * 2, :].reshape(n, hh, 2, ww, 2, c).mean(axis=(2, 4))


def downsample_recurrent_conv_layer_apply(p, x, prev_state,
                                          recurrent_block_type="convlstm",
                                          activation="relu", padding=1):
    if recurrent_block_type == "convlstm":
        state = conv_lstm_apply(p["recurrent_block"], x, prev_state, padding)
        y = state[0]
    else:
        state = conv_gru_apply(p["recurrent_block"], x, prev_state, padding)
        y = state
    y = downsample_half_bilinear(y)
    return _activation_fn(activation)(y), state


def recurrent_residual_layer_init(key, in_ch, out_ch,
                                  recurrent_block_type="convlstm",
                                  norm=None, dtype=jnp.float32):
    """RecurrentResidualLayer (submodules.py:457-480): residual block then
    recurrent block."""
    k1, k2 = jax.random.split(key)
    p = {"conv": residual_block_init(k1, in_ch, out_ch, norm, dtype)}
    if recurrent_block_type == "convlstm":
        p["recurrent_block"] = conv_lstm_init(k2, out_ch, out_ch, 3, dtype)
    else:
        p["recurrent_block"] = conv_gru_init(k2, out_ch, out_ch, 3, dtype)
    return p


def recurrent_residual_layer_apply(p, x, prev_state,
                                   recurrent_block_type="convlstm", norm=None):
    x = residual_block_apply(p["conv"], x, norm)
    if recurrent_block_type == "convlstm":
        state = conv_lstm_apply(p["recurrent_block"], x, prev_state)
        return state[0], state
    state = conv_gru_apply(p["recurrent_block"], x, prev_state)
    return state, state


def recurrent_phased_conv_layer_init(key, in_ch, out_ch, height, width,
                                     kernel_size=3, norm=None, dtype=jnp.float32):
    """RecurrentPhasedConvLayer (submodules.py:145-157): strided conv
    followed by a PhasedConvLSTMCell; `height`/`width` are the POST-conv
    spatial dims (the phased gate is per flattened feature)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv": conv_layer_init(k1, in_ch, out_ch, kernel_size, norm, dtype),
        "recurrent_block": phased_conv_lstm_init(k2, out_ch, out_ch,
                                                 height, width, 3, dtype),
    }


def recurrent_phased_conv_layer_apply(p, x, times, state, stride=1, padding=0,
                                      norm=None, fused=False):
    x = conv_layer_apply(p["conv"], x, stride, padding, "relu", norm)
    if state is None:
        z = jnp.zeros_like(x)
        state = (z, z)
    y, state = phased_conv_lstm_apply(p["recurrent_block"], x, times, state,
                                      fused=fused)
    return y, state


def phased_lstm_gate_apply(p, c_s, h_s, c0, h0, t, leak=0.001, ratio_on=0.1):
    """Time gate k(t) blending new state (c_s, h_s) with previous (c0, h0).

    phi = |mod(t - phase, tau)| / tau;   k = k_up / k_down / leak*phi regions
    (submodules.py:285-300).  Shapes: states [B, F]; t [B]."""
    tau = p["tau"][None, :]
    phase = p["phase"][None, :]
    t_ = t[:, None]
    phi = jnp.abs(jnp.fmod(t_ - phase, tau)) / tau
    k_up = 2.0 * phi / ratio_on
    k_down = 2.0 - k_up
    k_closed = leak * phi
    k = jnp.where(phi < ratio_on, k_down, k_closed)
    k = jnp.where(phi < 0.5 * ratio_on, k_up, k)
    c_new = k * c_s + (1.0 - k) * c0
    h_new = k * h_s + (1.0 - k) * h0
    return h_new, c_new


# ---------------------------------------------------------------------------
# norm running-stats extraction / merge (training-mode BN/IN support)
# ---------------------------------------------------------------------------


def extract_norm_stats(params):
    """Flat {dotted-path: {'running_mean', 'running_var'}} view of every
    tracked-stats norm in a param tree — the initial NormCtx.stats / scan
    carry for training-mode BN/IN."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "running_mean" in node and "running_var" in node:
                out[path] = {"running_mean": node["running_mean"],
                             "running_var": node["running_var"]}
                return
            for k, v in node.items():
                walk(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}.{i}" if path else str(i))

    walk(params, "")
    return out


def merge_norm_stats(params, stats):
    """Write updated running stats back into a param tree (inverse of
    extract_norm_stats).  Returns a new tree; unlisted paths are untouched."""
    import jax

    def walk(node, path):
        if isinstance(node, dict):
            if "running_mean" in node and "running_var" in node:
                if path in stats:
                    upd = stats[path]
                    node = dict(node)
                    node["running_mean"] = upd["running_mean"]
                    node["running_var"] = upd["running_var"]
                return node
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}.{i}" if path else str(i))
                    for i, v in enumerate(node)]
        if isinstance(node, tuple):
            return tuple(walk(v, f"{path}.{i}" if path else str(i))
                         for i, v in enumerate(node))
        return node

    return walk(params, "")
