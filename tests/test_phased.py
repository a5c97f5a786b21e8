"""PhasedLSTM time-gate parity vs the reference (irregular-timestamp hook,
MVSEC branch machinery: submodules.py:218-300,361-411)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.models import layers as L
from reference_loader import reference_modules


def nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_phased_lstm_gate_parity():
    _, sub, _ = reference_modules()
    torch.manual_seed(11)
    hidden = 24
    cell = sub.PhasedLSTMCell(hidden_size=hidden)
    B = 3
    rng = np.random.RandomState(0)
    c_s = rng.randn(B, hidden).astype(np.float32)
    h_s = rng.randn(B, hidden).astype(np.float32)
    c0 = rng.randn(B, hidden).astype(np.float32)
    h0 = rng.randn(B, hidden).astype(np.float32)
    t = rng.uniform(0, 10, B).astype(np.float32)

    cell.set_state(torch.from_numpy(c0), torch.from_numpy(h0))
    th_h, th_c = cell(torch.from_numpy(c_s), torch.from_numpy(h_s),
                      torch.from_numpy(t))

    p = {"tau": jnp.asarray(cell.tau.detach().numpy()),
         "phase": jnp.asarray(cell.phase.detach().numpy())}
    our_h, our_c = L.phased_lstm_gate_apply(
        p, jnp.asarray(c_s), jnp.asarray(h_s), jnp.asarray(c0),
        jnp.asarray(h0), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(our_h), th_h.detach().numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_c), th_c.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


def test_phased_conv_lstm_parity():
    _, sub, _ = reference_modules()
    torch.manual_seed(12)
    B, H, W, Cin, Ch = 2, 6, 8, 4, 4
    cell = sub.PhasedConvLSTMCell(input_channels=Cin, hidden_channels=Ch)
    rng = np.random.RandomState(1)
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    c0 = rng.randn(B, H, W, Ch).astype(np.float32)
    h0 = rng.randn(B, H, W, Ch).astype(np.float32)
    times = rng.uniform(0, 5, B).astype(np.float32)

    with torch.no_grad():
        th_y, (th_c, th_h) = cell(nchw(x), torch.from_numpy(times),
                                  (nchw(c0), nchw(h0)))

    p = {
        "lstm": {"Gates": {
            "weight": jnp.asarray(np.transpose(cell.lstm.Gates.weight.detach().numpy(), (2, 3, 1, 0))),
            "bias": jnp.asarray(cell.lstm.Gates.bias.detach().numpy())}},
        "phased_cell": {"tau": jnp.asarray(cell.phased_cell.tau.detach().numpy()),
                        "phase": jnp.asarray(cell.phased_cell.phase.detach().numpy())},
    }
    our_y, (our_c, our_h) = L.phased_conv_lstm_apply(
        p, jnp.asarray(x), jnp.asarray(times), (jnp.asarray(c0), jnp.asarray(h0)))
    np.testing.assert_allclose(np.asarray(our_y), nhwc(th_y), atol=1e-5, rtol=1e-4)
    # gate states go through fp32 fmod(t - phase, tau); torch and XLA round
    # that differently (x/y up to ~250 -> ~1e-5 phi error, amplified by the
    # k_up = 2*phi/ratio_on factor), so the state tolerance is wider
    np.testing.assert_allclose(np.asarray(our_c), nhwc(th_c), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_h), nhwc(th_h), atol=2e-3, rtol=1e-3)
