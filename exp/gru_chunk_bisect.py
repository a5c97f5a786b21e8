"""Bisect the chunk kernel's ~10us/grid-step body overhead (scale-1, t=16):
A = shipped kernel; B = no stash/concat (hb_raw direct — wrong at tile
seams, perf-only); C = h from a streamed input block instead of scratch
(v1-like reads, same call structure).  Identifies whether the overhead is
the scratch R/W + select/concat glue or the call/DMA structure."""
import os, sys, json, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from rpg_ramnet_tpu.models import layers as L
from rpg_ramnet_tpu.ops.gru_hside import _conv9, _fold3
from rpg_ramnet_tpu.ops import gru_chunk as GC
from bench import _per_iter_seconds

H, W, C, t = 64, 128, 128, 16
K, LP = 5, 16
S = LP * (K + 1)
n = H // t


def body_math(hb, gxz, gxr_full, gxo, w_ur, w_o, dt):
    ur = _conv9(hb, w_ur, t + 2, C).reshape(t + 2, W, 2 * C)
    r = jax.nn.sigmoid(ur[..., C:] + gxr_full.astype(jnp.float32))
    z = jax.nn.sigmoid(ur[1:t + 1, :, :C] + gxz.astype(jnp.float32))
    a = (r * hb[1:t + 3].astype(jnp.float32)).astype(dt)
    out_g = jnp.tanh(_conv9(a, w_o, t, C).reshape(t, W, C)
                     + gxo.astype(jnp.float32))
    h_int = hb[2:t + 2].astype(jnp.float32)
    return (h_int * (1.0 - z) + out_g * z).astype(dt)


def kern_B(h0, gxz, gxr, gxr_t, gxr_b, gxo, w_ur, w_o, snap, hpad, stash):
    s = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        hpad[pl.ds(2 + i * t, t)] = h0[0]

    @pl.when(s > 0)
    def _():
        hb = hpad[pl.ds(i * t, t + 4)]          # no stash/concat
        gxr_full = jnp.concatenate([gxr_t[0, 0], gxr[0], gxr_b[0, 0]], 0)
        snap[0] = body_math(hb, gxz[0], gxr_full, gxo[0], w_ur[0], w_o[0],
                            hpad.dtype)


def kern_C(h_in, gxz, gxr, gxr_t, gxr_b, gxo, w_ur, w_o, snap, hpad, stash):
    s = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(s > 0)
    def _():
        hb = jnp.pad(h_in[0], ((2, 2), (0, 0), (0, 0)))   # fake 2-row halo
        gxr_full = jnp.concatenate([gxr_t[0, 0], gxr[0], gxr_b[0, 0]], 0)
        snap[0] = body_math(hb, gxz[0], gxr_full, gxo[0], w_ur[0], w_o[0],
                            h_in.dtype)


def run(kern, h_from_input):
    sc = lambda s, i: (jnp.maximum(s - 1, 0), i, 0, 0)
    blk = pl.BlockSpec((1, t, W, C), sc)
    halo = pl.BlockSpec((1, 1, 1, W, C),
                        lambda s, i: (jnp.maximum(s - 1, 0), i, 0, 0, 0))
    h0spec = (blk if h_from_input else
              pl.BlockSpec((1, t, W, C),
                           lambda s, i: (0, jnp.where(s == 0, i, 0), 0, 0)))
    wsel = lambda s, i: ((lax.rem(jnp.maximum(s - 1, 0), K + 1) == K)
                         .astype(jnp.int32), 0, 0, 0)

    @jax.jit
    def go(h0, gxz, gxr, gxo, w_ur_all, w_o_all):
        gxr_top, gxr_bot = GC._halo_rows(gxr, t)
        h0s = jnp.broadcast_to(h0, (S, H, W, C)) if h_from_input else h0
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, H, W, C), h0.dtype),
            grid=(S + 1, n),
            in_specs=[h0spec, blk, blk, halo, halo, blk,
                      pl.BlockSpec((1, 3, 3 * C, 2 * C), wsel),
                      pl.BlockSpec((1, 3, 3 * C, C), wsel)],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((H + 4, W, C), h0.dtype),
                            pltpu.VMEM((2, W, C), h0.dtype)],
        )(h0s, gxz, gxr, gxr_top, gxr_bot, gxo, w_ur_all, w_o_all)
    return go


p_ev = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
p_im = L.conv_gru_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
rng = np.random.RandomState(0)
h0 = jnp.asarray(rng.randn(1, H, W, C) * 0.5, jnp.bfloat16)
gx = jnp.asarray(rng.randn(S, H, W, 3 * C) * 0.5, jnp.bfloat16)
w_ur_ev, w_o_ev = GC._hside_weights(p_ev, C, jnp.bfloat16)
w_ur_im, w_o_im = GC._hside_weights(p_im, C, jnp.bfloat16)
w_ur_all = jnp.stack([w_ur_ev, w_ur_im])
w_o_all = jnp.stack([w_o_ev, w_o_im])
args0 = (h0, gx[..., :C], gx[..., C:2 * C], gx[..., 2 * C:],
         w_ur_all, w_o_all)

out = {}
for name, go in (("B_noconcat", run(kern_B, False)),
                 ("C_hstreamed", run(kern_C, True))):
    @jax.jit
    def run_n(n_, *a):
        def body(j, acc):
            r = go(a[0], a[1] + j.astype(jnp.bfloat16) * jnp.bfloat16(1e-8),
                   *a[2:])
            return acc + jnp.sum(r[-1].astype(jnp.float32))
        return lax.fori_loop(0, n_, body, jnp.float32(0))
    try:
        sec = _per_iter_seconds(run_n, (2,) + args0, (10,) + args0, 2, 10)
        out[name] = {"per_step_us": round(sec / S * 1e6, 1)}
    except Exception as e:  # noqa: BLE001
        out[name] = {"error": str(e)[:200]}
    print(json.dumps({name: out[name]}), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "gru_chunk_bisect.json"), "w") as f:
    json.dump(out, f, indent=1)
