"""Layout experiment (round-3 TODO lead): does running the 96-deep decode
batch in NCHW logical layout change XLA's relayout ('data formatting')
tax?  Standalone decoder replica with ('NCHW','HWIO','NCHW') convs +
NCHW bilinear resize, numerically checked against the shipped NHWC
decoder, then both timed at the chunked decode batch shapes."""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from rpg_ramnet_tpu.core.config import ModelConfig
from rpg_ramnet_tpu.models import statenet
from rpg_ramnet_tpu.models import layers as L


def conv_nchw(x, w, b=None, stride=1, padding=0):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None, None]
    return y


def upsample2x_nchw(x):
    n, c, h, w = x.shape
    return jax.image.resize(x, (n, c, 2 * h, 2 * w), method="bilinear")


def decoder_nchw(params, cfg, supers_cf):
    """forward_decoder_supers with every tensor NCHW."""
    x = supers_cf[-1]
    for rb in params["resblocks"]:
        res = x
        o = jax.nn.relu(conv_nchw(x, rb["conv1"]["weight"],
                                  rb["conv1"].get("bias"), 1, 1))
        o = conv_nchw(o, rb["conv2"]["weight"], rb["conv2"].get("bias"), 1, 1)
        x = jax.nn.relu(o + res)
    n = cfg.num_encoders
    for i, dec in enumerate(params["decoders"]):
        if i > 0:
            x = x + supers_cf[n - i - 1]
        x = jax.nn.relu(conv_nchw(upsample2x_nchw(x), dec["conv2d"]["weight"],
                                  dec["conv2d"].get("bias"), 1, 2))
    pred = conv_nchw(x, params["pred"]["conv2d"]["weight"],
                     params["pred"]["conv2d"].get("bias"), 1, 0)
    return jax.nn.sigmoid(pred.astype(jnp.float32))


def timed(fn, *a):
    t0 = time.perf_counter()
    float(np.asarray(fn(*a)).ravel()[0])
    return time.perf_counter() - t0


def per_iter(run_n, args, n_lo, n_hi, repeats=2):
    timed(run_n, *args, n_lo)
    lo = min(timed(run_n, *args, n_lo) for _ in range(repeats))
    hi = min(timed(run_n, *args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)


def main():
    cfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "skip_type": "sum",
        "recurrent_block_type": "conv", "state_combination": "convgru",
        "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
        "use_upsample_conv": True, "norm": "none", "every_x_rgb_frame": 5,
        "baseline": False, "compute_dtype": "bfloat16"})
    params = statenet.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B = 96
    supers = tuple(
        jnp.asarray(rng.randn(B, 256 // 2 ** (i + 1), 512 // 2 ** (i + 1),
                              32 * 2 ** (i + 1)).astype(np.float32))
        .astype(jnp.bfloat16)
        for i in range(3))

    nhwc = jax.jit(lambda s: statenet.forward_decoder_supers(params, cfg, s))
    # include the NHWC->NCHW transposes IN the nchw program (they are what
    # the scan would otherwise have to emit per snapshot)
    nchw = jax.jit(lambda s: decoder_nchw(
        params, cfg, tuple(jnp.transpose(x, (0, 3, 1, 2)) for x in s)))

    a = np.asarray(nhwc(supers)).astype(np.float32)   # [B, H, W, 1]
    b = np.asarray(nchw(supers)).astype(np.float32)   # [B, 1, H, W]
    err = float(np.max(np.abs(a[..., 0] - b[:, 0])))
    print("nchw vs nhwc max err:", err, flush=True)
    assert err < 2e-2, err

    out = {"max_err": err}
    for name, fn, red in (("nhwc", nhwc, None), ("nchw", nchw, None)):
        @jax.jit
        def run_n(s, n, _f=fn):
            def body(i, acc):
                ss = tuple(x + (acc * 1e-20).astype(x.dtype) for x in s)
                return acc + jnp.sum(_f(ss))
            return lax.fori_loop(0, n, body, jnp.float32(0.0))
        sec = per_iter(run_n, (supers,), 2, 8)
        out[name + "_ms"] = round(sec * 1e3, 3)
        print(name, out[name + "_ms"], "ms per 96-deep decode", flush=True)
    with open(os.path.join(os.path.dirname(__file__),
                           "decoder_nchw_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
