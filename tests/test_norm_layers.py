"""BN/IN norm-variant parity vs the reference ConvLayer in eval mode
(submodules.py:8-35; eval semantics: running stats)."""
import numpy as np
import torch

import jax.numpy as jnp

from rpg_ramnet_tpu.models import layers as L
from reference_loader import reference_modules


def nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def _convert_conv_layer(tl, norm):
    p = {"conv2d": {"weight": jnp.asarray(
        np.transpose(tl.conv2d.weight.detach().numpy(), (2, 3, 1, 0)))}}
    if tl.conv2d.bias is not None:
        p["conv2d"]["bias"] = jnp.asarray(tl.conv2d.bias.detach().numpy())
    if norm in ("BN", "IN"):
        nl = {"running_mean": jnp.asarray(tl.norm_layer.running_mean.numpy()),
              "running_var": jnp.asarray(tl.norm_layer.running_var.numpy())}
        if norm == "BN":
            nl["weight"] = jnp.asarray(tl.norm_layer.weight.detach().numpy())
            nl["bias"] = jnp.asarray(tl.norm_layer.bias.detach().numpy())
        p["norm_layer"] = nl
    return p


def test_conv_layer_bn_eval_parity():
    _, sub, _ = reference_modules()
    torch.manual_seed(20)
    tl = sub.ConvLayer(4, 8, 3, stride=1, padding=1, norm="BN")
    # fake non-trivial running stats
    tl.norm_layer.running_mean.copy_(torch.randn(8) * 0.3)
    tl.norm_layer.running_var.copy_(torch.rand(8) + 0.5)
    tl.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 12, 4).astype(np.float32)
    with torch.no_grad():
        ref = tl(nchw(x))
    p = _convert_conv_layer(tl, "BN")
    ours = L.conv_layer_apply(p, jnp.asarray(x), 1, 1, "relu", "BN")
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), atol=1e-5, rtol=1e-4)


def test_conv_layer_in_eval_parity():
    _, sub, _ = reference_modules()
    torch.manual_seed(21)
    tl = sub.ConvLayer(4, 8, 3, stride=1, padding=1, norm="IN")
    tl.norm_layer.running_mean.copy_(torch.randn(8) * 0.2)
    tl.norm_layer.running_var.copy_(torch.rand(8) + 0.7)
    tl.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 12, 4).astype(np.float32)
    with torch.no_grad():
        ref = tl(nchw(x))
    p = _convert_conv_layer(tl, "IN")
    ours = L.conv_layer_apply(p, jnp.asarray(x), 1, 1, "relu", "IN")
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), atol=1e-5, rtol=1e-4)


def test_residual_block_in_parity():
    _, sub, _ = reference_modules()
    torch.manual_seed(22)
    blk = sub.ResidualBlock(6, 6, norm="IN")
    blk.eval()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    with torch.no_grad():
        ref = blk(nchw(x))
    p = {
        "conv1": {"weight": jnp.asarray(np.transpose(blk.conv1.weight.detach().numpy(), (2, 3, 1, 0))),
                  "bias": jnp.asarray(blk.conv1.bias.detach().numpy())},
        "conv2": {"weight": jnp.asarray(np.transpose(blk.conv2.weight.detach().numpy(), (2, 3, 1, 0))),
                  "bias": jnp.asarray(blk.conv2.bias.detach().numpy())},
    }
    ours = L.residual_block_apply(p, jnp.asarray(x), norm="IN")
    np.testing.assert_allclose(np.asarray(ours), nhwc(ref), atol=1e-5, rtol=1e-4)
