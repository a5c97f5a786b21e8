"""Plain feedforward UNet (non-recurrent baseline).

Capability reference: RAM_Net/model/unet.py:87-131 (UNet).  Used by the
ERGB2Depth arch (configs/..._no_recurrent.json).  Unlike StateNet's decoder,
the UNet pred layer DOES include the head skip (unet.py:129).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from . import layers as L


def init_params(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    nb = cfg.base_num_channels
    # head is norm-free in the reference regardless of config (unet.py:93-94)
    p["head"] = L.conv_layer_init(next(keys), cfg.num_bins_rgb, nb, 5, None, dtype)
    p["encoders"] = [
        L.conv_layer_init(next(keys), in_c, out_c, 5, cfg.norm, dtype)
        for in_c, out_c in zip(cfg.encoder_input_sizes, cfg.encoder_output_sizes)
    ]
    p["resblocks"] = [
        L.residual_block_init(next(keys), cfg.max_num_channels, cfg.max_num_channels, cfg.norm, dtype)
        for _ in range(cfg.num_residual_blocks)
    ]
    decs = []
    for in_c in reversed(cfg.encoder_output_sizes):
        dec_in = in_c if cfg.skip_type == "sum" else 2 * in_c
        if cfg.use_upsample_conv:
            decs.append(L.upsample_conv_layer_init(next(keys), dec_in, in_c // 2, 5, cfg.norm, dtype))
        else:
            decs.append(L.transposed_conv_layer_init(next(keys), dec_in, in_c // 2, 5, cfg.norm, dtype))
    p["decoders"] = decs
    pred_in = nb if cfg.skip_type == "sum" else 2 * nb
    p["pred"] = L.conv_layer_init(next(keys), pred_in, cfg.num_output_channels, 1, cfg.norm, dtype)
    return p


def _skip(cfg: ModelConfig, x1, x2):
    if cfg.skip_type == "sum":
        return x1 + x2
    if cfg.skip_type == "concat":
        return jnp.concatenate([x1, x2], axis=-1)
    return x1


def forward(params, cfg: ModelConfig, x, norm_ctx=None,
            input_layout: str = "NHWC"):
    """x: [N, H, W, num_bins_rgb] -> [N, H, W, 1] in [0, 1].
    norm_ctx: layers.NormCtx for training-mode BN/IN (None = eval).
    input_layout='NCHW' lets the head conv absorb a channel-first input
    (the chunked drivers' TPU-friendly '*_tcf' packing) transpose-free."""
    from .statenet import compute_dtype
    x = x.astype(compute_dtype(cfg))
    x = L.conv_layer_apply(params["head"], x, 1, 2, "relu", None,
                           input_layout=input_layout)
    head = x
    blocks = []
    for ei, enc in enumerate(params["encoders"]):
        x = L.conv_layer_apply(enc, x, 2, 2, "relu", cfg.norm,
                               ctx=norm_ctx, path=f"encoders.{ei}")
        blocks.append(x)
    for ri, rb in enumerate(params["resblocks"]):
        x = L.residual_block_apply(rb, x, cfg.norm,
                                   ctx=norm_ctx, path=f"resblocks.{ri}")
    n = cfg.num_encoders
    for i, dec in enumerate(params["decoders"]):
        x = _skip(cfg, x, blocks[n - i - 1])
        if cfg.use_upsample_conv:
            if cfg.fast_upsample:
                x = L.upsample_conv_layer_fast_apply(
                    dec, x, 2, "relu", cfg.norm,
                    ctx=norm_ctx, path=f"decoders.{i}")
            else:
                x = L.upsample_conv_layer_apply(
                    dec, x, 2, "relu", cfg.norm,
                    ctx=norm_ctx, path=f"decoders.{i}")
        else:
            x = L.transposed_conv_layer_apply(
                dec, x, 2, "relu", cfg.norm,
                ctx=norm_ctx, path=f"decoders.{i}")
    pred = L.conv_layer_apply(params["pred"], _skip(cfg, x, head), 1, 0, None,
                              cfg.norm, ctx=norm_ctx, path="pred")
    return L._activation_fn(cfg.activation)(pred.astype(jnp.float32))
