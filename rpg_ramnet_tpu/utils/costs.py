"""Analytic FLOP / byte accounting for MFU and roofline numbers.

Walks the model config (the conv shapes are all static) and counts exact
MAC-based FLOPs plus a *minimum* HBM byte estimate for one datapackage
(K event sweeps + 1 image sweep, each followed by a decoder pass — reference
model/model.py:176-217) and for one TBPTT training window.

The byte model is a lower bound on HBM traffic: each conv reads its input
once and writes its output once (perfect fusion of elementwise/norm/act into
the producing conv, which XLA does); weights are counted once per *program*
invocation, not per conv application, because XLA keeps them resident only
per-invocation.  Recurrent state reads/writes are counted explicitly.

Peaks used for utilization come from the detected device kind; v5e:
197 TFLOP/s bf16 (394 TOPS int8), 819 GB/s HBM.  fp32 matmuls on the MXU
run at roughly 1/4-1/3 of bf16 peak via multi-pass, so MFU is reported
against the bf16 peak with the compute dtype noted.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

# (bf16 peak FLOP/s, HBM GB/s, HBM GiB) per device kind substring
_DEVICE_PEAKS = {
    "v5 lite": (197e12, 819e9, 16),
    "v5e": (197e12, 819e9, 16),
    "v5p": (459e12, 2765e9, 95),
    "v4": (275e12, 1228e9, 32),
    "v6 lite": (918e12, 1640e9, 32),
    "v6e": (918e12, 1640e9, 32),
}


def device_peaks(kind: str) -> Tuple[float, float, float]:
    k = kind.lower()
    for sub, peaks in _DEVICE_PEAKS.items():
        if sub in k:
            return peaks
    return (197e12, 819e9, 16)  # default: v5e


@dataclass
class Costs:
    flops: float = 0.0        # multiply-adds x2
    bytes_min: float = 0.0    # lower-bound HBM traffic (activations + state)
    param_bytes: float = 0.0  # parameter reads, once per program invocation

    def __iadd__(self, o: "Costs"):
        self.flops += o.flops
        self.bytes_min += o.bytes_min
        self.param_bytes += o.param_bytes
        return self


def _conv(b, h, w, cin, cout, k, act_bytes=4):
    """One conv application: FLOPs and min bytes (read in + write out)."""
    return Costs(
        flops=2.0 * b * h * w * cin * cout * k * k,
        bytes_min=float(b * h * w * (cin + cout)) * act_bytes,
        param_bytes=float(cin * cout * k * k) * 4,
    )


def modality_sweep_costs(cfg, H: int, W: int, batch: int = 1,
                         act_bytes: int = 4) -> Costs:
    """One encoder sweep (head + strided encoders + per-scale state comb),
    reference statenet.py:204-288."""
    c = Costs()
    nb = cfg.base_num_channels
    # head 5x5 (num_bins -> nb); count the larger (events) input conservatively
    c += _conv(batch, H, W, max(cfg.num_bins_events, cfg.num_bins_rgb), nb, 5,
               act_bytes)
    for i, (cin, cout) in enumerate(zip(cfg.encoder_input_sizes,
                                        cfg.encoder_output_sizes)):
        h, w = H // (2 ** (i + 1)), W // (2 ** (i + 1))
        # stride-2 5x5 encoder conv (recurrent_block_type='conv' shipped cfg)
        c += _conv(batch, h, w, cin, cout, 5, act_bytes)
        if cfg.state_combination == "convgru":
            # 3 gate convs 3x3 on cat(x, state): cin = 2*cout
            for _ in range(3):
                c += _conv(batch, h, w, 2 * cout, cout, 3, act_bytes)
            # state read + write per scale
            c.bytes_min += 2.0 * batch * h * w * cout * act_bytes
        elif cfg.state_combination == "convlstm":
            c += _conv(batch, h, w, 2 * cout, 4 * cout, 3, act_bytes)
            c.bytes_min += 4.0 * batch * h * w * cout * act_bytes  # (h, c) rw
        elif cfg.state_combination == "conv":
            c += _conv(batch, h, w, 2 * cout, cout, 5, act_bytes)
            c.bytes_min += 2.0 * batch * h * w * cout * act_bytes
    return c


def decoder_costs(cfg, H: int, W: int, batch: int = 1,
                  act_bytes: int = 4) -> Costs:
    """One decoder pass (resblocks + upsample convs + 1x1 pred),
    reference statenet.py:290-315."""
    c = Costs()
    top = cfg.max_num_channels
    h, w = H // (2 ** cfg.num_encoders), W // (2 ** cfg.num_encoders)
    for _ in range(cfg.num_residual_blocks):
        c += _conv(batch, h, w, top, top, 3, act_bytes)
        c += _conv(batch, h, w, top, top, 3, act_bytes)
    cin = top
    for i in range(cfg.num_encoders):
        h, w = h * 2, w * 2
        cout = cin // 2
        # bilinear 2x (8 flops/px, reads cin at h/2 writes cin at h) + 5x5 conv
        c.bytes_min += batch * h * w * cin * act_bytes
        c.flops += 8.0 * batch * h * w * cin
        eff_cin = 2 * cin if (cfg.skip_type == "concat" and i > 0) else cin
        c += _conv(batch, h, w, eff_cin, cout, 5, act_bytes)
        cin = cout
    c += _conv(batch, H, W, cfg.base_num_channels, cfg.num_output_channels, 1,
               act_bytes)
    return c


def package_costs(cfg, H: int, W: int, batch: int = 1,
                  act_bytes: int = 4, decodes: Optional[int] = None) -> Costs:
    """One datapackage: K event sweeps + 1 image sweep, decoder after every
    modality update (model/model.py:176-217)."""
    K = cfg.every_x_rgb_frame
    n_sweeps = K + 1
    n_decodes = n_sweeps if decodes is None else decodes
    c = Costs()
    for _ in range(n_sweeps):
        c += modality_sweep_costs(cfg, H, W, batch, act_bytes)
    for _ in range(n_decodes):
        c += decoder_costs(cfg, H, W, batch, act_bytes)
    return c


def train_window_costs(cfg, H: int, W: int, batch: int, L: int,
                       act_bytes: int = 4, supervised_decodes: int = 2,
                       remat: bool = True) -> Costs:
    """One TBPTT window forward+backward.  Backward of a conv is ~2x its
    forward FLOPs (grad-input + grad-weight); remat adds one extra forward."""
    fwd = package_costs(cfg, H, W, batch, act_bytes,
                        decodes=supervised_decodes)
    factor = L * (3.0 + (1.0 if remat else 0.0))
    return Costs(flops=fwd.flops * factor,
                 bytes_min=fwd.bytes_min * factor,
                 param_bytes=fwd.param_bytes * 2)


def compiled_costs(jitted, *args) -> Dict[str, float]:
    """XLA's own cost model for a jitted callable: {'flops', 'bytes'} (may be
    empty on backends that do not expose cost analysis)."""
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return {"flops": float(an.get("flops", 0.0)),
                "bytes": float(an.get("bytes accessed", 0.0))}
    except Exception:
        return {}
