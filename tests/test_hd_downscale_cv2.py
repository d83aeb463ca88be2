"""HD-in metric downscale protocol vs cv2 (VERDICT r4 missing #3).

The reference computes 8K-config metrics on the SR frame downscaled by
``cv2.resize(..., fx=1/scale, fy=1/scale, interpolation=cv2.INTER_CUBIC)``
(/root/reference/evaluation/eval_qual_quan.py:86, eval_quan_FOV.py:151).
Our eval uses the torch-table bicubic (host np_resize and the jitted device
path in eval/runner.py:_device_downscale_fn).

For float32 input, cv2's INTER_CUBIC is the SAME resampler: Keys bicubic
kernel with A=-0.75 and pixel-center source mapping src=(dst+0.5)/f-0.5 —
identical to torch ``F.interpolate(mode='bicubic', align_corners=False,
antialias=False)``. These tests pin that equivalence at the eval's actual
geometry (integer 1/4 downscale of 4:1-ish frames), so the reference's SSIM
digits are reproduced exactly rather than "to within resampler drift".
"""

from __future__ import annotations

import cv2
import numpy as np
import pytest


def _cases():
    rng = np.random.default_rng(42)
    # (H, W) pairs: the real protocol is 4320x7680 -> 1080x1920; test a
    # scaled-down same-ratio case plus an odd-sized one (cv2 rounds
    # dsize=(0,0) output dims as round(fx*W))
    return [
        (rng.random((432, 768, 3)).astype(np.float32), 0.25),
        (rng.random((108, 192, 3)).astype(np.float32), 0.25),
        (rng.random((100, 148, 3)).astype(np.float32), 0.25),
    ]


def test_np_resize_matches_cv2_inter_cubic():
    from refvsr_tpu.data.np_ops import np_resize
    for x, f in _cases():
        cv = cv2.resize(x, dsize=(0, 0), fx=f, fy=f,
                        interpolation=cv2.INTER_CUBIC)
        ours = np_resize(x, scale_factor=f, mode="bicubic")
        assert ours.shape == cv.shape
        assert np.abs(cv - ours).max() < 5e-6


def test_device_downscale_matches_cv2_inter_cubic():
    from refvsr_tpu.eval.runner import _device_downscale_fn
    x, f = _cases()[0]
    cv = np.clip(cv2.resize(x, dsize=(0, 0), fx=f, fy=f,
                            interpolation=cv2.INTER_CUBIC), 0.0, 1.0)
    dev = np.asarray(_device_downscale_fn(f)(x[None])[0])
    assert dev.shape == cv.shape
    assert np.abs(cv - dev).max() < 5e-6


def test_metric_delta_is_noise_level():
    """The end metric (PSNR of downscaled-SR vs GT) must agree with the
    cv2-protocol value to far below reporting precision (0.01 dB)."""
    from refvsr_tpu.data.np_ops import np_resize
    from refvsr_tpu.eval.metrics import psnr, ssim
    rng = np.random.default_rng(3)
    hr = rng.random((432, 768, 3)).astype(np.float32)
    gt = rng.random((108, 192, 3)).astype(np.float32)
    cv = np.clip(cv2.resize(hr, dsize=(0, 0), fx=0.25, fy=0.25,
                            interpolation=cv2.INTER_CUBIC), 0, 1)
    ours = np.clip(np_resize(hr, scale_factor=0.25, mode="bicubic"), 0, 1)
    assert psnr(ours, gt) == pytest.approx(psnr(cv, gt), abs=1e-4)
    assert ssim(ours, gt) == pytest.approx(ssim(cv, gt), abs=1e-6)
