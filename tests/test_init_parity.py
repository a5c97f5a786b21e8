"""Initializer parity: training-from-scratch comparability requires the
same init distributions as torch (conv kaiming-uniform bounds) and the
ConvGRU's orthogonal gates with zero bias (submodules.py:429-434)."""
import numpy as np

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.models import layers as L


def test_conv_init_bounds():
    p = L.conv_layer_init(jax.random.PRNGKey(0), 16, 32, 5)
    w = np.asarray(p["conv2d"]["weight"])
    b = np.asarray(p["conv2d"]["bias"])
    bound = 1.0 / np.sqrt(16 * 5 * 5)
    assert w.min() >= -bound and w.max() <= bound
    assert b.min() >= -bound and b.max() <= bound
    # roughly uniform: std of U(-a, a) is a/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)


def test_conv_gru_orthogonal_init():
    p = L.conv_gru_init(jax.random.PRNGKey(1), 16, 16, 3)
    for gate in ("reset_gate", "update_gate", "out_gate"):
        w = np.asarray(p[gate]["weight"])          # HWIO
        assert np.all(np.asarray(p[gate]["bias"]) == 0)
        # torch orthogonal_: rows of the (out, in*k*k) flattening are
        # orthonormal
        oihw = np.transpose(w, (3, 2, 0, 1))
        flat = oihw.reshape(oihw.shape[0], -1)     # (16, 288)
        gram = flat @ flat.T
        np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)


def test_conv_lstm_gate_order_matches_torch_chunk():
    """Gate channel-chunk order must be (in, forget, out, cell) — the torch
    .chunk(4, 1) order (submodules.py:344)."""
    p = L.conv_lstm_init(jax.random.PRNGKey(2), 4, 4, 3)
    # force gates to produce distinguishable outputs per chunk
    w = np.zeros_like(np.asarray(p["Gates"]["weight"]))
    b = np.array([+10.0] * 4 + [-10.0] * 4 + [+10.0] * 4 + [0.0] * 4, np.float32)
    p = {"Gates": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}
    x = jnp.zeros((1, 4, 4, 4))
    h = jnp.zeros((1, 4, 4, 4))
    c = jnp.ones((1, 4, 4, 4))
    hidden, cell = L.conv_lstm_apply(p, x, (h, c))
    # forget gate ~0 -> cell ~= in_gate * tanh(cell_gate=0) = 0
    np.testing.assert_allclose(np.asarray(cell), 0.0, atol=1e-4)
    # hidden = out_gate(~1) * tanh(cell=0) = 0
    np.testing.assert_allclose(np.asarray(hidden), 0.0, atol=1e-4)
    # now forget ~1: cell preserved
    b2 = np.array([-10.0] * 4 + [+10.0] * 4 + [+10.0] * 4 + [0.0] * 4, np.float32)
    p2 = {"Gates": {"weight": jnp.asarray(w), "bias": jnp.asarray(b2)}}
    hidden2, cell2 = L.conv_lstm_apply(p2, x, (h, c))
    np.testing.assert_allclose(np.asarray(cell2), 1.0, atol=1e-3)
