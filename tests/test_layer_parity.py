"""Layer-level numerical parity vs PyTorch primitives.

Each of our NHWC functional layers must match the torch NCHW equivalent used
by the reference (model/submodules.py) to ~1e-5 in float32.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.models import layers as L

jax.config.update("jax_enable_x64", False)


def nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def nhwc(t_nchw):
    return np.moveaxis(t_nchw.detach().numpy(), 1, -1)


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("stride,pad,k", [(1, 2, 5), (2, 2, 5), (1, 1, 3), (1, 0, 1)])
def test_conv2d_matches_torch(stride, pad, k):
    x = rand(2, 16, 20, 3)
    w = rand(k, k, 3, 8, seed=1) * 0.1
    b = rand(8, seed=2)
    ours = L.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride, pad)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    theirs = F.conv2d(nchw(x), wt, torch.from_numpy(b), stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs), atol=1e-5, rtol=1e-5)


def test_upsample_bilinear_matches_torch():
    x = rand(2, 13, 17, 4)
    ours = L.upsample2x_bilinear(jnp.asarray(x))
    theirs = F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs), atol=1e-5, rtol=1e-5)


def test_conv_transpose_matches_torch():
    # torch ConvTranspose2d(k=5, stride=2, padding=2, output_padding=1)
    x = rand(2, 8, 10, 6)
    w_t = rand(6, 4, 5, 5, seed=3) * 0.1  # torch layout (in, out, kh, kw)
    b = rand(4, seed=4)
    theirs = F.conv_transpose2d(nchw(x), torch.from_numpy(w_t), torch.from_numpy(b),
                                stride=2, padding=2, output_padding=1)
    w_ours = jnp.asarray(np.transpose(w_t, (2, 3, 0, 1)))  # -> (kh, kw, in, out)
    ours = L.conv2d_transpose(jnp.asarray(x), w_ours, jnp.asarray(b), 2, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs), atol=1e-5, rtol=1e-5)


@pytest.mark.smoke
def test_conv_gru_matches_reference():
    from reference_loader import reference_modules
    _, sub, _ = reference_modules()
    torch.manual_seed(7)
    cell = sub.ConvGRU(input_size=8, hidden_size=8, kernel_size=3)
    x = rand(2, 12, 14, 8)
    h = rand(2, 12, 14, 8, seed=5)
    theirs = cell(nchw(x), nchw(h))
    p = {
        name: {
            "weight": jnp.asarray(np.transpose(getattr(cell, name).weight.detach().numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(getattr(cell, name).bias.detach().numpy()),
        }
        for name in ("reset_gate", "update_gate", "out_gate")
    }
    ours = L.conv_gru_apply(p, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs), atol=1e-5, rtol=1e-5)


def test_conv_lstm_matches_reference():
    from reference_loader import reference_modules
    _, sub, _ = reference_modules()
    torch.manual_seed(8)
    cell = sub.ConvLSTM(input_size=6, hidden_size=6, kernel_size=3)
    x = rand(2, 10, 12, 6)
    h = rand(2, 10, 12, 6, seed=6)
    c = rand(2, 10, 12, 6, seed=7)
    th_h, th_c = cell(nchw(x), (nchw(h), nchw(c)))
    p = {"Gates": {
        "weight": jnp.asarray(np.transpose(cell.Gates.weight.detach().numpy(), (2, 3, 1, 0))),
        "bias": jnp.asarray(cell.Gates.bias.detach().numpy()),
    }}
    our_h, our_c = L.conv_lstm_apply(p, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    np.testing.assert_allclose(np.asarray(our_h), nhwc(th_h), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(our_c), nhwc(th_c), atol=1e-5, rtol=1e-5)


def test_downsample_recurrent_conv_layer_matches_reference():
    from reference_loader import reference_modules
    _, sub, _ = reference_modules()
    torch.manual_seed(30)
    layer = sub.DownsampleRecurrentConvLayer(6, 6, kernel_size=3,
                                             recurrent_block_type="convgru")
    rng = np.random.RandomState(7)
    x = rng.randn(2, 12, 16, 6).astype(np.float32)
    h = rng.randn(2, 12, 16, 6).astype(np.float32)
    with torch.no_grad():
        th_y, th_state = layer(nchw(x), nchw(h))
    p = {"recurrent_block": {
        name: {"weight": jnp.asarray(np.transpose(
                   getattr(layer.recurrent_block, name).weight.detach().numpy(), (2, 3, 1, 0))),
               "bias": jnp.asarray(getattr(layer.recurrent_block, name).bias.detach().numpy())}
        for name in ("reset_gate", "update_gate", "out_gate")}}
    our_y, our_state = L.downsample_recurrent_conv_layer_apply(
        p, jnp.asarray(x), jnp.asarray(h), "convgru")
    np.testing.assert_allclose(np.asarray(our_y), nhwc(th_y), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_state), nhwc(th_state), atol=1e-5, rtol=1e-4)


def test_recurrent_residual_layer_matches_reference():
    from reference_loader import reference_modules
    _, sub, _ = reference_modules()
    torch.manual_seed(31)
    layer = sub.RecurrentResidualLayer(8, 8, recurrent_block_type="convlstm")
    layer.eval()
    rng = np.random.RandomState(8)
    x = rng.randn(2, 10, 10, 8).astype(np.float32)
    h = rng.randn(2, 10, 10, 8).astype(np.float32)
    c = rng.randn(2, 10, 10, 8).astype(np.float32)
    with torch.no_grad():
        th_y, (th_h, th_c) = layer(nchw(x), (nchw(h), nchw(c)))
    p = {
        "conv": {
            "conv1": {"weight": jnp.asarray(np.transpose(layer.conv.conv1.weight.detach().numpy(), (2, 3, 1, 0))),
                      "bias": jnp.asarray(layer.conv.conv1.bias.detach().numpy())},
            "conv2": {"weight": jnp.asarray(np.transpose(layer.conv.conv2.weight.detach().numpy(), (2, 3, 1, 0))),
                      "bias": jnp.asarray(layer.conv.conv2.bias.detach().numpy())},
        },
        "recurrent_block": {"Gates": {
            "weight": jnp.asarray(np.transpose(layer.recurrent_block.Gates.weight.detach().numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(layer.recurrent_block.Gates.bias.detach().numpy())}},
    }
    our_y, (our_h, our_c) = L.recurrent_residual_layer_apply(
        p, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)), "convlstm")
    np.testing.assert_allclose(np.asarray(our_y), nhwc(th_y), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_h), nhwc(th_h), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_c), nhwc(th_c), atol=1e-5, rtol=1e-4)


def test_residual_block_matches_reference():
    from reference_loader import reference_modules
    _, sub, _ = reference_modules()
    torch.manual_seed(9)
    blk = sub.ResidualBlock(16, 16)
    blk.eval()
    x = rand(2, 8, 8, 16)
    theirs = blk(nchw(x))
    p = {
        "conv1": {"weight": jnp.asarray(np.transpose(blk.conv1.weight.detach().numpy(), (2, 3, 1, 0))),
                  "bias": jnp.asarray(blk.conv1.bias.detach().numpy())},
        "conv2": {"weight": jnp.asarray(np.transpose(blk.conv2.weight.detach().numpy(), (2, 3, 1, 0))),
                  "bias": jnp.asarray(blk.conv2.bias.detach().numpy())},
    }
    ours = L.residual_block_apply(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), nhwc(theirs), atol=1e-5, rtol=1e-5)
