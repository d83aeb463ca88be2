"""SSIM/PSNR protocol verification (VERDICT r4 missing #1).

The reference's headline metric is skimage ``structural_similarity``
(/root/reference/evaluation/metrics.py:15-22) with data_range=1.0,
multichannel=True (and full=True + 3-channel mask for the masked variant).
skimage is not installed in this image, so refvsr_tpu/eval/metrics.py
reimplements it via scipy.ndimage.uniform_filter.

This test verifies that reimplementation against a SECOND, fully independent
oracle that follows the published skimage algorithm literally: explicit
sliding windows over a symmetric-padded array (scipy's mode="reflect" ==
np.pad mode="symmetric"), sample-covariance normalization N/(N-1), uniform
7x7 window, C1=(K1*L)^2 / C2=(K2*L)^2, and skimage's pad-crop mean. The two
implementations share no filtering code, so agreement to ~1e-10 pins the math.

Golden scalars (hardcoded below) were produced by the naive oracle on fixed
seeded inputs, so a regression in BOTH implementations still fails the test.
"""

from __future__ import annotations

import numpy as np
import pytest

from refvsr_tpu.eval.metrics import psnr, psnr_masked, ssim, ssim_masked


def _naive_ssim_channel(x, y, data_range=1.0, win=7, k1=0.01, k2=0.03):
    """Literal skimage structural_similarity for one 2-D channel, computed
    with explicit windows (no scipy.ndimage). Returns (mssim, full_S_map)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    pad = (win - 1) // 2
    # scipy.ndimage mode="reflect" == (d c b a | a b c d | d c b a) which is
    # numpy's "symmetric"
    xp = np.pad(x, pad, mode="symmetric")
    yp = np.pad(y, pad, mode="symmetric")
    wx = np.lib.stride_tricks.sliding_window_view(xp, (win, win))
    wy = np.lib.stride_tricks.sliding_window_view(yp, (win, win))
    npix = win * win
    cov_norm = npix / (npix - 1.0)
    ux = wx.mean(axis=(-2, -1))
    uy = wy.mean(axis=(-2, -1))
    vx = cov_norm * ((wx * wx).mean(axis=(-2, -1)) - ux * ux)
    vy = cov_norm * ((wy * wy).mean(axis=(-2, -1)) - uy * uy)
    vxy = cov_norm * ((wx * wy).mean(axis=(-2, -1)) - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s[pad:-pad, pad:-pad].mean(), s


def _naive_ssim(img1, img2, data_range=1.0):
    return float(np.mean([
        _naive_ssim_channel(img1[..., c], img2[..., c], data_range)[0]
        for c in range(img1.shape[-1])]))


def _naive_ssim_masked(img1, img2, mask, data_range=1.0):
    s = np.stack([
        _naive_ssim_channel(img1[..., c], img2[..., c], data_range)[1]
        for c in range(img1.shape[-1])], axis=-1)
    return float(np.sum(s * mask) / np.sum(mask))


def _fixtures():
    rng = np.random.default_rng(1234)
    h, w = 33, 47  # odd, non-square: exercises crop + window alignment
    gt = rng.random((h, w, 3))
    # correlated "SR" output: blurredish copy + noise, SSIM in a real range
    sr = np.clip(gt + 0.08 * rng.standard_normal((h, w, 3)), 0.0, 1.0)
    mask = np.ones_like(gt)
    mask[h // 4:h - h // 4, w // 4:w - w // 4] = 0.0  # the FOV ring pattern
    return gt, sr, mask


def test_ssim_matches_independent_oracle():
    gt, sr, _ = _fixtures()
    assert ssim(sr, gt) == pytest.approx(_naive_ssim(sr, gt), abs=1e-10)
    # identical images: SSIM exactly 1
    assert ssim(gt, gt) == pytest.approx(1.0, abs=1e-12)


def test_ssim_masked_matches_independent_oracle():
    gt, sr, mask = _fixtures()
    assert ssim_masked(sr, gt, mask) == pytest.approx(
        _naive_ssim_masked(sr, gt, mask), abs=1e-10)
    # all-ones mask: masked mean == mean over the FULL map (with border
    # windows), which differs from the cropped-mean plain ssim
    ones = np.ones_like(gt)
    assert ssim_masked(sr, gt, ones) == pytest.approx(
        _naive_ssim_masked(sr, gt, ones), abs=1e-10)


def test_ssim_golden_values():
    """Regression pin: values produced by the naive oracle on the fixed
    seed-1234 fixtures. Catches a drift that changes BOTH implementations."""
    gt, sr, mask = _fixtures()
    assert ssim(sr, gt) == pytest.approx(0.9635341642006411, abs=1e-9)
    assert ssim_masked(sr, gt, mask) == pytest.approx(
        0.9634425698896811, abs=1e-9)


def test_psnr_protocol():
    gt, sr, mask = _fixtures()
    mse = np.mean((sr - gt) ** 2)
    assert psnr(sr, gt) == pytest.approx(10 * np.log10(1.0 / mse), abs=1e-10)
    mse_m = np.sum(((sr - gt) ** 2) * mask) / np.sum(mask)
    assert psnr_masked(sr, gt, mask) == pytest.approx(
        10 * np.log10(1.0 / mse_m), abs=1e-10)


def test_ssim_small_image_fallback():
    """Images smaller than 2*pad+1 per axis take the uncropped-mean branch
    (metrics.py:51); the naive oracle's crop would be empty, so just pin
    determinism + range."""
    rng = np.random.default_rng(7)
    a = rng.random((6, 6, 3))
    b = rng.random((6, 6, 3))
    v = ssim(a, b)
    assert -1.0 <= v <= 1.0
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-12)
