"""Evaluation extras: event-mask metric variants and SSIM."""
import os
import numpy as np
import pytest

from rpg_ramnet_tpu.eval.evaluation import evaluate_directories
from rpg_ramnet_tpu.eval.metrics import structural_similarity, _ssim_single
from rpg_ramnet_tpu.ops.depth import depth_to_log_np


def _write_pairs(tmp_path, n=4, h=32, w=40, seed=0):
    rng = np.random.RandomState(seed)
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    mask_dir = tmp_path / "masks"
    for d in (pred_dir, gt_dir, mask_dir):
        os.makedirs(d, exist_ok=True)
    clip, reg = 80.0, 3.70378
    for i in range(n):
        depth = rng.uniform(2, 70, (h, w)).astype(np.float32)
        noise = depth * (1 + rng.randn(h, w).astype(np.float32) * 0.05)
        np.save(gt_dir / f"frame_{i:010d}.npy",
                depth_to_log_np(depth, clip, reg)[None])
        np.save(pred_dir / f"depth_{i:010d}.npy",
                depth_to_log_np(noise, clip, reg)[None])
        mask = (rng.rand(h, w, 3) > 0.5).astype(np.uint8) * 255
        import cv2
        cv2.imwrite(str(mask_dir / f"frame_{i:010d}.png"), mask)
    return str(gt_dir), str(pred_dir), str(mask_dir), clip, reg


def test_event_mask_evaluation(tmp_path):
    gt, pred, masks, clip, reg = _write_pairs(tmp_path)
    metrics = evaluate_directories(gt, pred, clip_distance=clip,
                                   reg_factor=reg, crop_ymax=260,
                                   event_masks=masks)
    assert "_abs_rel_diff" in metrics
    assert "event_masked_abs_rel_diff" in metrics
    assert "event_masked_30_SILog" in metrics
    # ~5% multiplicative noise -> abs-rel around 0.04, thresholds near 1
    assert 0.01 < metrics["_abs_rel_diff"] < 0.12
    assert metrics["_threshold_delta_1.25"] > 0.95
    # masked variants are finite and plausible
    assert 0.0 < metrics["event_masked_abs_rel_diff"] < 0.2


def test_ssim_basics():
    rng = np.random.RandomState(1)
    a = rng.rand(1, 1, 24, 24).astype(np.float64)
    # identical images -> 1
    np.testing.assert_allclose(structural_similarity(a, a.copy()), 1.0,
                               atol=1e-6)
    # heavy noise -> clearly lower
    b = a + rng.randn(*a.shape) * 0.5
    assert structural_similarity(b, a) < 0.6


def test_ssim_matches_bruteforce():
    """Uniform-window SSIM vs a direct sliding-window implementation."""
    rng = np.random.RandomState(2)
    x = rng.rand(16, 18)
    y = np.clip(x + rng.randn(16, 18) * 0.1, 0, 1)
    win, dr = 7, 2.0
    c1 = (0.01 * dr) ** 2
    c2 = (0.03 * dr) ** 2
    vals = []
    cov_norm = win * win / (win * win - 1)
    for i in range(16 - win + 1):
        for j in range(18 - win + 1):
            px = x[i:i + win, j:j + win].ravel()
            py = y[i:i + win, j:j + win].ravel()
            ux, uy = px.mean(), py.mean()
            vx = cov_norm * (np.mean(px * px) - ux * ux)
            vy = cov_norm * (np.mean(py * py) - uy * uy)
            vxy = cov_norm * (np.mean(px * py) - ux * uy)
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) /
                        ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    np.testing.assert_allclose(_ssim_single(x, y), np.mean(vals), rtol=1e-8)


class TestDisplayMath:
    """LUT math of the interactive displays (image_display_utils.py) —
    the GUI classes are headless-gated, but every transform they apply is
    testable standalone."""

    def test_gamma_lut_identity_and_monotone(self):
        from rpg_ramnet_tpu.eval.display import gamma_lut, apply_gamma
        lut1 = gamma_lut(1.0)
        np.testing.assert_array_equal(lut1, np.arange(256, dtype=np.uint8))
        for g in (0.5, 2.2):
            lut = gamma_lut(g)
            assert lut[0] == 0 and lut[255] == 255
            assert np.all(np.diff(lut.astype(int)) >= 0)
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = apply_gamma(img, 2.2)
        # gamma>1 with the 1/gamma LUT darkens midtones? inverse convention:
        # the display applies x^(1/gamma) (brightens for gamma>1)
        assert out[8, 0] >= img[8, 0]

    def test_contrast_brightness_clips(self):
        from rpg_ramnet_tpu.eval.display import apply_contrast_brightness
        img = np.full((4, 4), 200, np.uint8)
        out = apply_contrast_brightness(img, contrast=2.0, brightness=10.0)
        assert out.dtype == np.uint8 and np.all(out == 255)
        out = apply_contrast_brightness(img, contrast=0.5, brightness=-50.0)
        assert np.all(out == 50)

    def test_depth_display_modes(self):
        from rpg_ramnet_tpu.eval.display import depth_to_display
        depth = np.linspace(0.1, 0.9, 64).reshape(8, 8).astype(np.float32)
        lin = depth_to_display(depth, "linear")
        inv = depth_to_display(depth, "inverse")
        loginv = depth_to_display(depth, "log_inverse")
        assert lin.dtype == inv.dtype == loginv.dtype == np.uint8
        # nearer (smaller log depth) must display BRIGHTER in inverse modes
        assert inv[0, 0] > inv[-1, -1]
        assert loginv[0, 0] > loginv[-1, -1]
        assert lin[0, 0] < lin[-1, -1]

    # NOTE: constructing ImageDisplay in a headless build can abort inside
    # cv2's C layer (not a catchable Python exception), so the GUI classes
    # stay unconstructed here; only their math is tested.


def test_interactive_display_pipeline_with_mocked_gui(monkeypatch):
    """Full ImageDisplay/DepthDisplay/Trackbar pipeline with the cv2 window
    layer mocked: trackbar positions must drive the LUT chain
    (contrast/brightness then gamma — image_display_utils.py:25-166) and
    DepthDisplay must route through depth_to_display before showing.  Only
    actual window creation needs a physical display; everything else is
    covered here."""
    import sys
    import types
    from rpg_ramnet_tpu.eval import display as D

    shown = {}
    bars = {}

    fake = types.SimpleNamespace()
    fake.error = RuntimeError
    fake.namedWindow = lambda name: None
    fake.createTrackbar = (
        lambda name, win, val, mx, cb: bars.__setitem__((name, win), val))
    fake.getTrackbarPos = lambda name, win: bars[(name, win)]
    fake.imshow = lambda win, img: shown.__setitem__(win, img)
    fake.waitKey = lambda t: None
    monkeypatch.setitem(sys.modules, "cv2", fake)

    disp = D.ImageDisplay("win")
    img = (np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8))
    # defaults: contrast 1.0, brightness 0, gamma 1.0 -> identity chain
    disp.show(img)
    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(shown["win"], u8)

    # crank the trackbars: contrast 2.0, brightness 10, gamma 2.0
    bars[("contrast x10", "win")] = 20
    bars[("brightness", "win")] = 10
    bars[("gamma x10", "win")] = 20
    disp.show(img)
    want = D.apply_gamma(
        D.apply_contrast_brightness(u8, 2.0, 10.0), 2.0)
    np.testing.assert_array_equal(shown["win"], want)

    ddisp = D.DepthDisplay("dwin", mode="log_inverse")
    depth = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    ddisp.show(depth)
    want_d = D.depth_to_display(depth, "log_inverse", 3.70378)
    np.testing.assert_array_equal(shown["dwin"], want_d)
