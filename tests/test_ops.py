"""Unit tests for the ops layer: voxelizer (all paths vs the reference numpy
oracle), normalization, log-depth transforms, spatial gradients, pooling."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu import ops
from rpg_ramnet_tpu.train import losses


def random_events(n=5000, height=40, width=60, seed=0):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0.0, 0.05, n))
    x = rng.randint(0, width, n).astype(np.float64)
    y = rng.randint(0, height, n).astype(np.float64)
    p = rng.randint(0, 2, n).astype(np.float64)  # 0/1; 0 -> -1 in voxelizer
    return np.stack([t, x, y, p], axis=1)


def reference_voxel_oracle(events, num_bins, height, width):
    """The reference's own numpy voxelizer, imported read-only as the oracle
    (utils/event_tensor_utils.py:71; needs an np.int shim on modern numpy)."""
    import sys
    if "/root/reference/RAM_Net" not in sys.path:
        sys.path.insert(0, "/root/reference/RAM_Net")
    if not hasattr(np, "int"):
        np.int = int  # reference targets numpy<1.24
    from utils.event_tensor_utils import events_to_voxel_grid as ref_vox
    return ref_vox(events.copy(), num_bins, width, height)


class TestVoxelizer:
    NB, H, W = 5, 40, 60

    def test_np_matches_reference_oracle(self):
        ev = random_events(height=self.H, width=self.W)
        ours = ops.events_to_voxel_grid_np(ev, self.NB, self.H, self.W)
        ref = reference_voxel_oracle(ev, self.NB, self.H, self.W)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_scatter_matches_np(self):
        ev = random_events(height=self.H, width=self.W, seed=1)
        ours = ops.events_to_voxel_grid_scatter(
            jnp.asarray(ev, jnp.float32), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        ref = ops.events_to_voxel_grid_np(ev.astype(np.float32), self.NB, self.H, self.W)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-3)

    def test_matmul_matches_scatter(self):
        ev = random_events(n=3000, height=self.H, width=self.W, seed=2).astype(np.float32)
        a = ops.events_to_voxel_grid_scatter(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        b = ops.events_to_voxel_grid_matmul(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_pallas_matches_scatter(self):
        ev = random_events(n=2500, height=self.H, width=self.W, seed=3).astype(np.float32)
        a = ops.events_to_voxel_grid_scatter(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        b = ops.events_to_voxel_grid_pallas(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_pallas_bf16_factors_close(self):
        import jax.numpy as jnp
        ev = random_events(n=2000, height=self.H, width=self.W, seed=6).astype(np.float32)
        a = ops.events_to_voxel_grid_scatter(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        b = ops.events_to_voxel_grid_pallas(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W,
            factor_dtype=jnp.bfloat16)
        # bf16 vals round to ~3 decimal digits per contribution
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05)

    def test_sortseg_matches_scatter(self):
        """Voxelizer v2 (sort + windowed segment-accumulate, the default TPU
        backend: 164 Mev/s vs scatter's 73 on v5e)."""
        ev = random_events(n=2500, height=self.H, width=self.W, seed=7).astype(np.float32)
        a = ops.events_to_voxel_grid_scatter(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        b = ops.events_to_voxel_grid_sortseg(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=self.NB, height=self.H, width=self.W)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_sortseg_sparse_tail_and_padding(self):
        """Sparse inputs exercise the while-loop correctness tail; padded
        rows beyond n_valid must be ignored (their value is zero)."""
        ev = random_events(n=64, height=260, width=346, seed=8).astype(np.float32)
        padded = np.concatenate([ev, np.zeros((1984, 4), np.float32)])
        a = ops.events_to_voxel_grid_sortseg(
            jnp.asarray(padded), jnp.int32(64),
            num_bins=self.NB, height=260, width=346)
        ref = ops.events_to_voxel_grid_np(ev, self.NB, 260, 346)
        np.testing.assert_allclose(np.asarray(a), ref, atol=1e-4, rtol=1e-4)

    def test_sortseg_single_bin(self):
        """num_bins=1: every right-bilinear contribution is out of range."""
        ev = random_events(n=1500, height=self.H, width=self.W, seed=9).astype(np.float32)
        a = ops.events_to_voxel_grid_sortseg(
            jnp.asarray(ev), jnp.int32(ev.shape[0]),
            num_bins=1, height=self.H, width=self.W)
        ref = ops.events_to_voxel_grid_np(ev, 1, self.H, self.W)
        np.testing.assert_allclose(np.asarray(a), ref, atol=1e-4, rtol=1e-4)

    def test_padded_events_ignored(self):
        ev = random_events(n=1000, height=self.H, width=self.W, seed=4).astype(np.float32)
        padded = np.concatenate([ev, np.zeros((500, 4), np.float32)])
        a = ops.events_to_voxel_grid_scatter(
            jnp.asarray(padded), jnp.int32(1000),
            num_bins=self.NB, height=self.H, width=self.W)
        ref = ops.events_to_voxel_grid_np(ev, self.NB, self.H, self.W)
        np.testing.assert_allclose(np.asarray(a), ref, atol=1e-3, rtol=1e-3)

    def test_empty_and_degenerate(self):
        # all events at one timestamp: deltaT == 0 branch
        ev = random_events(n=100, height=self.H, width=self.W, seed=5)
        ev[:, 0] = 0.5
        ours = ops.events_to_voxel_grid_np(ev, self.NB, self.H, self.W)
        ref = reference_voxel_oracle(ev, self.NB, self.H, self.W)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalize_voxel_grid():
    rng = np.random.RandomState(0)
    g = rng.randn(5, 16, 16).astype(np.float32)
    g[g < 0.3] = 0.0  # sparsity
    ours = np.asarray(ops.normalize_voxel_grid(jnp.asarray(g)))
    ref = ops.normalize_voxel_grid_np(g)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
    # semantics: nonzero values have mean 0, std 1 (event_dataset.py:144-151)
    nz = ours[ours != 0]
    assert abs(nz.mean()) < 1e-4 and abs(nz.std() - 1) < 1e-3
    # all-zero grid unchanged
    z = np.zeros((2, 4, 4), np.float32)
    np.testing.assert_array_equal(np.asarray(ops.normalize_voxel_grid(jnp.asarray(z))), z)


@pytest.mark.smoke
def test_log_depth_round_trip():
    rng = np.random.RandomState(1)
    depth = rng.uniform(0.5, 900.0, (64, 64)).astype(np.float32)
    clip, reg = 1000.0, 5.70378
    log_d = ops.depth_to_log_np(depth, clip, reg)
    rec = ops.log_to_depth_np(log_d, clip, reg)
    ok = depth > np.exp(-reg) * clip  # below the floor, log transform clips
    np.testing.assert_allclose(rec[ok], depth[ok], rtol=1e-4)
    # device path equals host path
    np.testing.assert_allclose(
        np.asarray(ops.depth_to_log(jnp.asarray(depth), clip, reg)), log_d, atol=1e-5)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 17, 19, 3).astype(np.float32)
    x[0, 3, 4, 1] = np.nan
    for k in (1, 2, 4):
        ours = np.asarray(ops.avg_pool(jnp.asarray(x), k))
        theirs = F.avg_pool2d(torch.from_numpy(np.moveaxis(x, -1, 1).copy()), k, k)
        np.testing.assert_allclose(ours, np.moveaxis(theirs.numpy(), 1, -1),
                                   atol=1e-5, equal_nan=True)


def test_spatial_gradient_matches_scipy():
    """Sobel/8 with replicate padding == scipy correlate(mode='nearest')."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 12, 14, 2).astype(np.float32)
    gx, gy = ops.spatial_gradient(jnp.asarray(x))
    sob_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
    for c in range(2):
        ref_gx = ndi.correlate(x[0, :, :, c], sob_x, mode="nearest")
        ref_gy = ndi.correlate(x[0, :, :, c], sob_x.T, mode="nearest")
        np.testing.assert_allclose(np.asarray(gx)[0, :, :, c], ref_gx, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy)[0, :, :, c], ref_gy, atol=1e-5)


class TestLosses:
    def test_scale_invariant_loss(self):
        rng = np.random.RandomState(4)
        a = rng.randn(2, 8, 8, 1).astype(np.float32)
        b = rng.randn(2, 8, 8, 1).astype(np.float32)
        b[0, 2, 3, 0] = np.nan
        d = (a - b).ravel()
        d = d[~np.isnan(d)]
        expect = (d ** 2).mean() - d.mean() ** 2
        got = float(losses.scale_invariant_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_mse_loss(self):
        rng = np.random.RandomState(5)
        a = rng.randn(2, 8, 8, 1).astype(np.float32)
        b = rng.randn(2, 8, 8, 1).astype(np.float32)
        b[1, 1, 1, 0] = np.nan
        ok = ~np.isnan(b)
        expect = ((a[ok] - b[ok]) ** 2).mean()
        got = float(losses.mse_loss(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_multi_scale_grad_loss_reference_math(self):
        """Direct numpy re-derivation of loss.py:33-63 (kornia semantics:
        sobel/8, replicate pad), incl. NaN handling and x batch x 2 scale."""
        rng = np.random.RandomState(6)
        B, H, W = 2, 32, 32
        pred = rng.rand(B, H, W, 1).astype(np.float32)
        targ = rng.rand(B, H, W, 1).astype(np.float32)
        targ[0, 5, 7, 0] = np.nan
        sob = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0

        def np_avgpool(img, k):
            h, w = img.shape
            img = img[:h // k * k, :w // k * k]
            return img.reshape(h // k, k, w // k, k).mean(axis=(1, 3))

        total = 0.0
        diff = (pred - targ)[..., 0]
        for s in range(4):
            k = 2 ** s
            vals = []
            for b in range(B):
                d = np_avgpool(diff[b], k)
                gx = ndi.correlate(d, sob, mode="nearest")
                gy = ndi.correlate(d, sob.T, mode="nearest")
                vals.append(np.stack([gx, gy]))
            g = np.stack(vals)
            ok = ~np.isnan(g)
            total += np.abs(g[ok]).sum() / ok.sum() * B * 2
        expect = total / 4
        got = float(losses.multi_scale_grad_loss(jnp.asarray(pred), jnp.asarray(targ)))
        np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_fused_gru_hside_kernel_matches_reference():
    """Pallas fused h-side ConvGRU cell (ops/gru_hside.py, interpret mode on
    CPU) == layers.conv_gru_apply_hside, including zero-padding borders and
    multi-tile grids with halos."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_hside_fused, supports

    from rpg_ramnet_tpu.ops import gru_hside

    rng = np.random.RandomState(0)
    for (B, H, W, C) in ((1, 32, 24, 8), (2, 16, 16, 16), (1, 8, 8, 8)):
        p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
        h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        gx = L.conv_gru_x_gates(p, x)
        # hardware support is bf16-only (VMEM budget); interpret mode
        # validates the math in f32
        assert supports(h.astype(jnp.bfloat16))
        ref = L.conv_gru_apply_hside(p, gx, h)
        # both kernel generations: v1 (neighbor-block halos) and v2
        # (skinny halo side-arrays)
        for v2 in (False, True):
            old = gru_hside._GRU_V2
            gru_hside._GRU_V2 = v2
            try:
                got = conv_gru_hside_fused(p, gx, h, interpret=True)
            finally:
                gru_hside._GRU_V2 = old
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=str((B, H, W, C, v2)))
    # unsupported: odd H, f32 on hardware
    assert not supports(jnp.zeros((1, 9, 16, 8), jnp.bfloat16))
    assert not supports(jnp.zeros((1, 16, 16, 8), jnp.float32))


def test_fused_lstm_hside_kernel_matches_reference():
    """Pallas fused h-side ConvLSTM cell == layers.conv_lstm_apply_hside
    (interpret mode), hidden and cell outputs, multi-tile halos + borders."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_lstm_hside_fused

    rng = np.random.RandomState(3)
    for (B, H, W, C) in ((1, 32, 24, 8), (2, 16, 16, 16)):
        p = L.conv_lstm_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
        h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        gx = L.conv_lstm_x_gates(p, x)
        ref_h, ref_c = L.conv_lstm_apply_hside(p, gx, (h, c))
        got_h, got_c = conv_lstm_hside_fused(p, gx, (h, c), interpret=True)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                                   atol=1e-5, rtol=1e-5)


def test_fused_phased_cell_kernel_matches_composition():
    """Single-launch phased ConvLSTM cell (ops/phased_cell.py, interpret
    mode) == the XLA composition: conv_lstm_apply_hside on the reference's
    swapped (c0, h0) slots + the phased_gate_k blend — all three outputs
    (h_t, h_new, c_new), multi-tile halos + per-batch times."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.phased_cell import conv_lstm_phased_fused

    rng = np.random.RandomState(7)
    for (B, H, W, C) in ((1, 32, 24, 8), (2, 16, 16, 16)):
        p = L.conv_lstm_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
        F = C * H * W
        pc = {"tau": jnp.asarray(
                  rng.uniform(0.02, 50, F).astype(np.float32)),
              "phase": jnp.asarray(rng.uniform(0, 5, F).astype(np.float32))}
        c0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        h0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        t = jnp.asarray((rng.rand(B) * 10).astype(np.float32))
        gx = L.conv_lstm_x_gates(p, x)
        # oracle: reference slot quirk (c0, h0) -> LSTM (hidden, cell),
        # unpack (c_t, h_t), then the NHWC time-gate blend
        c_t, h_t = L.conv_lstm_apply_hside(p, gx, (c0, h0))
        k = L.phased_gate_k(pc, t, H, W, C)
        ref_hn = k * h_t + (1.0 - k) * h0
        ref_cn = k * c_t + (1.0 - k) * c0
        got_ht, (got_hn, got_cn) = conv_lstm_phased_fused(
            p, pc, gx, (c0, h0), t, interpret=True)
        np.testing.assert_allclose(np.asarray(got_ht), np.asarray(h_t),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_hn), np.asarray(ref_hn),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_cn), np.asarray(ref_cn),
                                   atol=1e-5, rtol=1e-5)


def test_fused_phased_cell_grads_match_unfused():
    """jax.grad through the single-launch phased cell (custom VJP,
    interpret mode) == grad through the all-XLA phased layer, for ALL
    differentiable inputs: LSTM weights, x, previous (c0, h0), the
    trained tau/phase gate parameters, and times."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L

    rng = np.random.RandomState(11)
    B, H, W, C = 2, 16, 16, 8
    F = C * H * W
    p = {"lstm": L.conv_lstm_init(jax.random.PRNGKey(3), C, C, 3,
                                  jnp.float32),
         "phased_cell": {
             "tau": jnp.asarray(rng.uniform(0.5, 50, F).astype(np.float32)),
             "phase": jnp.asarray(rng.uniform(0, 5, F).astype(np.float32))}}
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    c0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    h0 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    t = jnp.asarray((rng.rand(B) * 10 + 0.3).astype(np.float32))
    cot = [jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
           for _ in range(3)]

    def loss(p_, x_, c0_, h0_, t_, fused):
        y, (hn, cn) = L.phased_conv_lstm_apply(p_, x_, t_, (c0_, h0_),
                                               fused=fused)
        return (jnp.sum(y * cot[0]) + jnp.sum(hn * cot[1])
                + jnp.sum(cn * cot[2]))

    from rpg_ramnet_tpu.ops import gru_hside
    gru_hside._INTERPRET = True
    try:
        g_fused = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            p, x, c0, h0, t, True)
    finally:
        gru_hside._INTERPRET = False
    g_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(p, x, c0, h0, t, False)
    for got, ref in zip(jax.tree_util.tree_leaves(g_fused),
                        jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_gru_full_cell_matches_reference():
    """Full fused ConvGRU cell (x+h in-kernel, K=6C fold) ==
    layers.conv_gru_apply (interpret mode).  Measured as an in-context
    LOSS on hardware (custom-call layout boundaries) — kept as an opt-in
    with the math verified here (PERF.md)."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_full_fused

    rng = np.random.RandomState(5)
    for (B, H, W, C) in ((1, 32, 24, 8), (2, 16, 16, 16)):
        p = L.conv_gru_init(jax.random.PRNGKey(2), C, C, 3, jnp.float32)
        h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        ref = L.conv_gru_apply(p, x, h)
        got = conv_gru_full_fused(p, x, h, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=str((B, H, W, C)))


def test_full_fused_cell_gate_uses_lstm_budget():
    """Regression (round-2 advice): forward_modality's full fused ConvGRU
    cell gate must use the halved (lstm=True) VMEM budget that
    conv_gru_full_fused picks its tile with.  At shapes where only the
    h-side budget fits (e.g. 128x512x128 bf16), the mismatched gate
    resolved tile_h=0 and crashed with ZeroDivisionError at trace time."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import statenet
    from rpg_ramnet_tpu.ops import gru_hside
    from test_train import tiny_config

    h = jnp.zeros((1, 128, 512, 128), jnp.bfloat16)
    # the mismatch: h-side budget admits the shape, full-cell budget doesn't
    assert gru_hside.supports(h)
    assert not gru_hside.supports(h, lstm=True)
    cfg = tiny_config(num_encoders=1, base_num_channels=64,
                      fused_gru="on", compute_dtype="bfloat16").model
    assert not statenet._use_fused_cell(cfg, h, lstm=True)

    # trace (no compute) the actual call site at that super-state shape:
    # pre-fix this raised ZeroDivisionError inside conv_gru_full_fused
    params = jax.eval_shape(
        lambda k: statenet.init_params(k, cfg),
        jax.random.PRNGKey(0))
    state = jax.eval_shape(
        lambda: statenet.init_state(cfg, 1, 256, 1024, jnp.bfloat16))
    x = jax.ShapeDtypeStruct((1, 256, 1024, cfg.num_bins_events),
                             jnp.bfloat16)
    out = jax.eval_shape(
        lambda p, xx, s: statenet.forward_modality(
            p, cfg, xx, s, "events", allow_fused=True),
        params, x, state)
    assert out.super_states[0].shape == (1, 128, 512, 128)


def test_fused_cells_custom_vjp_matches_unfused():
    """jax.grad through the fused Pallas h-side cells (custom VJP, round 3)
    must match the unfused XLA path — all cotangents: params (h-side weight
    slices), gx, state (interpret mode, f32)."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.gru_hside import (conv_gru_hside_fused,
                                              conv_lstm_hside_fused)

    rng = np.random.RandomState(0)
    B, H, W, C = 2, 16, 16, 16
    p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
    h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gx = L.conv_gru_x_gates(p, x)

    def loss_ref(p, gx, h):
        return jnp.sum(jnp.sin(L.conv_gru_apply_hside(p, gx, h)))

    def loss_fused(p, gx, h):
        return jnp.sum(jnp.sin(conv_gru_hside_fused(p, gx, h,
                                                    interpret=True)))

    from rpg_ramnet_tpu.ops import gru_hside
    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p, gx, h)
    for v2 in (False, True):   # both kernel generations (residual variants)
        old = gru_hside._GRU_V2
        gru_hside._GRU_V2 = v2
        try:
            got = jax.grad(loss_fused, argnums=(0, 1, 2))(p, gx, h)
        finally:
            gru_hside._GRU_V2 = old
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
            ref, got)

    pl_ = L.conv_lstm_init(jax.random.PRNGKey(1), C, C, 3, jnp.float32)
    c = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gxl = L.conv_lstm_x_gates(pl_, x)

    def lloss_ref(p, gx, h, c):
        hh, cc = L.conv_lstm_apply_hside(p, gx, (h, c))
        return jnp.sum(jnp.sin(hh)) + jnp.sum(jnp.cos(cc))

    def lloss_fused(p, gx, h, c):
        hh, cc = conv_lstm_hside_fused(p, gx, (h, c), interpret=True)
        return jnp.sum(jnp.sin(hh)) + jnp.sum(jnp.cos(cc))

    ref = jax.grad(lloss_ref, argnums=(0, 1, 2, 3))(pl_, gxl, h, c)
    got = jax.grad(lloss_fused, argnums=(0, 1, 2, 3))(pl_, gxl, h, c)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=2e-5, rtol=1e-4),
        ref, got)


def test_fused_upsample_conv_matches_reference():
    """Pallas fused bilinear-2x-upsample + 5x5 conv (+skip +bias +relu)
    decoder kernel (ops/upsample_conv.py, interpret mode) == the XLA
    layer (layers.upsample_conv_layer_apply), including the resize's edge
    clamp, the conv's zero padding at all four borders, and multi-tile
    grids with halos."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops.upsample_conv import (upsample_conv_fused,
                                                  supports)

    rng = np.random.RandomState(1)
    for (B, H, W, C, Cout) in ((1, 16, 24, 8, 8), (2, 8, 8, 16, 8),
                               (1, 32, 16, 8, 16)):
        p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), C, Cout, 5,
                                       None, jnp.float32)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        sk = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        ref = L.upsample_conv_layer_apply(p, x + sk, 2, "relu", None)
        got = upsample_conv_fused(p, x, skip=sk, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=str((B, H, W, C, Cout)))
        ref2 = L.upsample_conv_layer_apply(p, x, 2, "relu", None)
        got2 = upsample_conv_fused(p, x, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                                   atol=1e-5, rtol=1e-5)
    # hardware gate: bf16 only, shape-constrained
    assert supports(jnp.zeros((1, 128, 256, 64), jnp.bfloat16), 32)
    assert not supports(jnp.zeros((1, 128, 256, 64), jnp.float32), 32)
    assert not supports(jnp.zeros((1, 9, 256, 64), jnp.bfloat16), 32)


def test_fused_decoder_full_forward_matches():
    """forward_decoder_supers with the fused Pallas decoder layers
    (fused_decoder='on', interpret via the module hook) == the XLA decoder,
    on the flagship-style norm-free sum-skip config."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import statenet
    from rpg_ramnet_tpu.ops import upsample_conv
    from test_train import tiny_config

    cfg = tiny_config(fused_decoder="on").model
    params = statenet.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(5)
    B, H, W = 2, 32, 32  # both decoder layers pass the (patched) shape gate
    supers = tuple(
        jnp.asarray(rng.randn(B, H // (2 ** (i + 1)), W // (2 ** (i + 1)),
                              cfg.base_num_channels * 2 ** (i + 1))
                    .astype(np.float32))
        for i in range(cfg.num_encoders))
    ref = statenet.forward_decoder_supers(params, cfg, supers,
                                          allow_fused=False)
    # patch: interpret mode + admit f32 (hardware gate is bf16-only)
    orig_supports, orig_int = upsample_conv.supports, upsample_conv._INTERPRET
    upsample_conv._INTERPRET = True
    upsample_conv.supports = lambda x, cout: (
        x.ndim == 4 and upsample_conv._pick_tile_h(
            x.shape[1], x.shape[2], x.shape[3], cout, 4) > 0
        and x.shape[2] % 8 == 0)
    try:
        got = statenet.forward_decoder_supers(params, cfg, supers,
                                              allow_fused=True)
    finally:
        upsample_conv.supports, upsample_conv._INTERPRET = (orig_supports,
                                                            orig_int)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sortseg_fused_stats_normalize():
    """with_stats=True: the sortseg kernel's fused epilogue emits the
    nonzero count/sum/sumsq; normalize_voxel_grid(grid, stats) must equal
    the plain two-pass normalize AND the numpy oracle."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.ops.voxel import (events_to_voxel_grid_sortseg,
                                          normalize_voxel_grid,
                                          normalize_voxel_grid_np)
    from rpg_ramnet_tpu import ops

    ev = random_events(4000, 24, 32, seed=7)
    n = jnp.int32(ev.shape[0])
    ev_j = jnp.asarray(ev.astype(np.float32))
    grid, stats = events_to_voxel_grid_sortseg(
        ev_j, n, num_bins=5, height=24, width=32, with_stats=True)
    grid_plain = events_to_voxel_grid_sortseg(
        ev_j, n, num_bins=5, height=24, width=32)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(grid_plain))

    ref = ops.events_to_voxel_grid_np(ev.copy(), 5, 24, 32)
    np.testing.assert_allclose(np.asarray(grid), ref, atol=1e-3)

    mask = ref != 0
    np.testing.assert_allclose(float(stats[0]), mask.sum(), rtol=1e-6)
    np.testing.assert_allclose(float(stats[1]), ref[mask].sum(), rtol=1e-3,
                               atol=1e-3)

    got = normalize_voxel_grid(grid, stats)
    want2 = normalize_voxel_grid(grid)
    want_np = normalize_voxel_grid_np(ref.copy())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got), want_np, atol=1e-3)


def test_composed_upsample_conv_matches_reference():
    """Composed stride-2 transposed-conv formulation of bilinear-2x + 5x5
    conv (layers.upsample_conv_layer_composed_apply) == the two-stage
    layer, forward AND gradient, including all borders/corners."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L

    rng = np.random.RandomState(2)
    for (B, H, W, C, Cout) in ((2, 16, 24, 8, 8), (1, 8, 8, 16, 8),
                               (1, 32, 16, 8, 16)):
        p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), C, Cout, 5,
                                       None, jnp.float32)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        ref = L.upsample_conv_layer_apply(p, x, 2, "relu", None)
        got = L.upsample_conv_layer_composed_apply(p, x, "relu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=str((B, H, W, C, Cout)))

        def loss_ref(p, x):
            return jnp.sum(jnp.sin(L.upsample_conv_layer_apply(
                p, x, 2, "relu", None)))

        def loss_comp(p, x):
            return jnp.sum(jnp.sin(L.upsample_conv_layer_composed_apply(
                p, x, "relu")))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        g_comp = jax.grad(loss_comp, argnums=(0, 1))(p, x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3),
            g_ref, g_comp)


def test_composed_decoder_full_forward_matches():
    """forward_decoder_supers with composed_decoder='on' + allow_composed
    == the standard decoder (f32, CPU)."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import statenet
    from test_train import tiny_config

    cfg = tiny_config(composed_decoder="on").model
    params = statenet.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(6)
    B, H, W = 2, 32, 32
    supers = tuple(
        jnp.asarray(rng.randn(B, H // (2 ** (i + 1)), W // (2 ** (i + 1)),
                              cfg.base_num_channels * 2 ** (i + 1))
                    .astype(np.float32))
        for i in range(cfg.num_encoders))
    ref = statenet.forward_decoder_supers(params, cfg, supers)
    got = statenet.forward_decoder_supers(params, cfg, supers,
                                          allow_composed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gru_pair_kernel_matches_per_scale():
    """Cross-scale merged GRU h-side launch (ops/gru_pair.py, interpret
    mode on CPU) == two per-scale layers.conv_gru_apply_hside calls, at
    flagship-like scale relationships (scale 1 half the spatial size,
    double the channels) including multi-tile grids."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops import gru_pair

    rng = np.random.RandomState(0)
    for (B, H0, W0, C0) in ((1, 32, 32, 8), (2, 32, 16, 8)):
        H1, W1, C1 = H0 // 2, W0 // 2, C0 * 2
        p0 = L.conv_gru_init(jax.random.PRNGKey(0), C0, C0, 3, jnp.float32)
        p1 = L.conv_gru_init(jax.random.PRNGKey(1), C1, C1, 3, jnp.float32)
        h0 = jnp.asarray(rng.randn(B, H0, W0, C0).astype(np.float32))
        h1 = jnp.asarray(rng.randn(B, H1, W1, C1).astype(np.float32))
        gx0 = L.conv_gru_x_gates(p0, jnp.asarray(
            rng.randn(B, H0, W0, C0).astype(np.float32)))
        gx1 = L.conv_gru_x_gates(p1, jnp.asarray(
            rng.randn(B, H1, W1, C1).astype(np.float32)))
        assert gru_pair.supports_pair(h0.astype(jnp.bfloat16),
                                      h1.astype(jnp.bfloat16))
        ref0 = L.conv_gru_apply_hside(p0, gx0, h0)
        ref1 = L.conv_gru_apply_hside(p1, gx1, h1)
        got0, got1 = gru_pair.conv_gru_hside_pair(p0, p1, gx0, gx1, h0, h1)
        np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"scale0 {(B, H0, W0, C0)}")
        np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"scale1 {(B, H1, W1, C1)}")
    # f32 not supported on hardware
    assert not gru_pair.supports_pair(jnp.zeros((1, 16, 16, 8), jnp.float32),
                                      jnp.zeros((1, 8, 8, 16), jnp.float32))


def test_fused_pair_model_path_matches_unfused():
    """forward_sequence_precomputed with fused_pair='on' (+ fused_gru='on',
    interpret hooks) == the all-XLA path through the full model."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent as M
    from rpg_ramnet_tpu.ops import gru_hside, gru_pair

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type":
        "conv", "state_combination": "convgru", "num_encoders": 3,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none", "compute_dtype": "bfloat16",
        "fused_gru": "on", "fused_pair": "on"})
    off = dataclasses.replace(mcfg, fused_gru="off", fused_pair="off")
    params = M.init_params(jax.random.PRNGKey(0), mcfg)
    st0 = M.init_state(mcfg, 1, 32, 32)
    rng = np.random.RandomState(0)
    L_, K = 2, 2
    seq = {"events": jnp.asarray(
               rng.randn(1, L_, K, 32, 32, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(1, L_, 32, 32, 1).astype(np.float32))}
    gru_hside._INTERPRET = True
    gru_pair._INTERPRET = True
    try:
        _, p_pair = M.forward_sequence_precomputed(params, mcfg, st0, seq)
    finally:
        gru_hside._INTERPRET = False
        gru_pair._INTERPRET = False
    _, p_plain = M.forward_sequence_precomputed(params, off, st0, seq)
    for k in p_plain:
        d = np.max(np.abs(np.asarray(p_pair[k], np.float32)
                          - np.asarray(p_plain[k], np.float32)))
        assert d < 0.05, (k, d)   # bf16 path tolerance (f32-accum gates)


def test_gru_bwd_kernel_matches_xla_backward():
    """The fused Pallas BACKWARD kernel (gru_hside._BWD_KERNEL, interpret
    mode) must produce the same cotangents as the hand-written XLA backward
    — params, gx, and state, including multi-tile grids with halos and
    zero-padding borders."""
    import jax
    import jax.numpy as jnp
    from rpg_ramnet_tpu.models import layers as L
    from rpg_ramnet_tpu.ops import gru_hside
    from rpg_ramnet_tpu.ops.gru_hside import conv_gru_hside_fused

    rng = np.random.RandomState(1)
    for (B, H, W, C) in ((1, 32, 16, 8), (2, 16, 16, 16)):
        p = L.conv_gru_init(jax.random.PRNGKey(0), C, C, 3, jnp.float32)
        h = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        gx = L.conv_gru_x_gates(p, jnp.asarray(
            rng.randn(B, H, W, C).astype(np.float32)))

        def loss(p, gx, h):
            return jnp.sum(jnp.sin(conv_gru_hside_fused(p, gx, h,
                                                        interpret=True)))

        ref = jax.grad(loss, argnums=(0, 1, 2))(p, gx, h)
        old = gru_hside._BWD_KERNEL
        gru_hside._BWD_KERNEL = True
        try:
            got = jax.grad(loss, argnums=(0, 1, 2))(p, gx, h)
        finally:
            gru_hside._BWD_KERNEL = old
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
                err_msg=str((B, H, W, C))),
            ref, got)
    # hardware support: bf16 + aligned only
    assert gru_hside.bwd_supports(jnp.zeros((1, 16, 16, 8), jnp.bfloat16))
    assert not gru_hside.bwd_supports(jnp.zeros((1, 16, 16, 8), jnp.float32))
