"""v2 fused GRU h-side cell probe: skinny HALO SIDE-ARRAYS instead of
neighbor-block re-reads.

The shipped kernel reads h and gxr via prev/cur/next BlockSpecs on the
same array — 3 full plane-reads each, ~11 planes of HBM traffic per cell
vs the 5-plane ideal (measured 106us at scale-0 vs 25.6 roofline).  v2
slices 2-row (h) / 1-row (gxr) halo arrays OUT of the tiled array with
XLA (reads only 2n/1n rows), rolls them by one tile, and feeds them as
separate small inputs — the kernel then reads each plane ONCE.
Correctness + per-cell timing vs the shipped kernel at the 3 flagship
scales."""
import os, sys, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from rpg_ramnet_tpu.models import layers as L
from rpg_ramnet_tpu.ops import gru_hside
from rpg_ramnet_tpu.ops.gru_hside import _conv9, _fold3, _pick_tile_h
from bench import _per_iter_seconds


def _kernel_v2(h_cur, h_top, h_bot, gxz, gxr_cur, gxr_top, gxr_bot, gxo,
               w_ur, w_o, out_ref, *, tile_h: int, H: int, W: int, C: int):
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

    a = (r * hb[1:tile_h + 3].astype(jnp.float32)).astype(dt)
    acc_o = _conv9(a, w_o, tile_h, C)
    out_g = jnp.tanh(acc_o.reshape(tile_h, W, C) + gxo[0].astype(jnp.float32))
    h_int = hb[2:tile_h + 2].astype(jnp.float32)
    out_ref[0] = (h_int * (1.0 - z) + out_g * z).astype(dt)


def _halos(x, tile_h, rows):
    """top[i] = x rows [i*tile_h-rows, i*tile_h); bot[i] = rows
    [(i+1)*tile_h, +rows).  Edge blocks get rolled-in garbage — the kernel
    masks out-of-range rows to zero.  Slices read only rows*n rows."""
    B, H, W, C = x.shape
    n = H // tile_h
    xr = x.reshape(B, n, tile_h, W, C)
    top = jnp.roll(xr[:, :, -rows:], 1, axis=1)
    bot = jnp.roll(xr[:, :, :rows], -1, axis=1)
    return top, bot


@functools.partial(jax.jit, static_argnames=("tile_h",))
def run_v2(h, gxz, gxr, gxo, w_ur, w_o, tile_h):
    B, H, W, C = h.shape
    n = H // tile_h
    h_top, h_bot = _halos(h, tile_h, 2)
    gxr_top, gxr_bot = _halos(gxr, tile_h, 1)
    cur = pl.BlockSpec((1, tile_h, W, C), lambda b, i: (b, i, 0, 0))
    halo2 = pl.BlockSpec((1, 1, 2, W, C), lambda b, i: (b, i, 0, 0, 0))
    halo1 = pl.BlockSpec((1, 1, 1, W, C), lambda b, i: (b, i, 0, 0, 0))
    wspec_ur = pl.BlockSpec((3, 3 * C, 2 * C), lambda b, i: (0, 0, 0))
    wspec_o = pl.BlockSpec((3, 3 * C, C), lambda b, i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_v2, tile_h=tile_h, H=H, W=W, C=C),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), h.dtype),
        grid=(B, n),
        in_specs=[cur, halo2, halo2, cur, cur, halo1, halo1, cur,
                  wspec_ur, wspec_o],
        out_specs=cur,
    )(h, h_top, h_bot, gxz, gxr, gxr_top, gxr_bot, gxo, w_ur, w_o)


def main():
    out = {}
    for (H, W, C) in ((128, 256, 64), (64, 128, 128), (32, 64, 256)):
        p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
        rng = np.random.RandomState(0)
        h0 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
        gx = jnp.asarray(rng.randn(1, H, W, 3 * C), jnp.bfloat16)
        th_def = _pick_tile_h(H, W, C, 2)
        dt = jnp.bfloat16
        w_ur = _fold3(jnp.concatenate(
            [p["update_gate"]["weight"][:, :, -C:],
             p["reset_gate"]["weight"][:, :, -C:]], axis=-1)).astype(dt)
        w_o = _fold3(p["out_gate"]["weight"][:, :, -C:]).astype(dt)

        # correctness oracle: the unfused XLA h-side (standalone-jitting the
        # v1 kernel scoped-vmem-OOMs at 64x128x128 — it only fits inside the
        # bigger record program)
        ref = L.conv_gru_apply_hside(p, gx.astype(jnp.float32),
                                     h0.astype(jnp.float32))
        k = f"{H}x{W}x{C}"
        out[k] = {"roofline_us": round(H * W * C * 2 * 5 / 819e9 * 1e6, 1)}
        # v2's footprint is ~5 blocks vs v1's 9 -> larger tiles may fit
        for th in {th_def, th_def * 2}:
            if H % th or th * W * C * 2 > 2 * 512 * 1024:
                continue
            try:
                got = run_v2(h0, gx[..., :C], gx[..., C:2 * C],
                             gx[..., 2 * C:], w_ur, w_o, th)
                d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
            except Exception as e:  # noqa: BLE001 - probe records failures
                out[k][f"tile{th}"] = {"error": str(e)[:160]}
                continue

            @jax.jit
            def run_n(h, gxz, gxr, gxo, n):
                def body(i, h):
                    return run_v2(h, gxz, gxr, gxo, w_ur, w_o, th)
                return jnp.sum(jnp.abs(
                    lax.fori_loop(0, n, body, h).astype(jnp.float32)))

            args = (h0, gx[..., :C], gx[..., C:2 * C], gx[..., 2 * C:])
            sec = _per_iter_seconds(run_n, args + (32,), args + (160,),
                                    32, 160)
            out[k][f"tile{th}"] = {"v2_us": round(sec * 1e6, 1),
                                   "max_diff_vs_xla": d}
            print(json.dumps({k: {f"tile{th}": out[k][f"tile{th}"]}}),
                  flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "hside_v2_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
