"""Misc image-space ops shared across the framework (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space matching torch.nn.PixelShuffle channel ordering
    (channel = c*r*r + dy*r + dx), used by PixelShufflePack
    (/root/reference/mmedit/models/common/upsample.py:8-51).
    x: (N, H, W, C*r*r) -> (N, H*r, W*r, C)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def pixel_shuffle_deconv(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """pixel_shuffle computed as a stride-r transposed conv with a one-hot
    kernel. Identical values; different lowering: the reshape/transpose
    formulation materializes a 6-D intermediate whose (r, r, c) minor dims
    sublane/lane-pad catastrophically when it can't fuse — at the 8K tail
    output (2160, 3840, 12) the padding expansion is 64x, an 11.87 GB
    buffer (chip session r5 bench OOM). The conv-transpose path moves the
    same bytes through the conv machinery's proper tiling. Use for LARGE
    tensors feeding outputs; the plain reshape fuses fine elsewhere."""
    import jax.lax as lax
    n, h, w, crr = x.shape
    c = crr // (r * r)
    # conv_transpose spatially FLIPS the kernel (adjoint of a strided
    # conv): phase (p, q) lands at output offset (r-1-p, r-1-q)
    k = np.zeros((r, r, crr, c), np.float32)
    for p in range(r):
        for q in range(r):
            for cc in range(c):
                k[r - 1 - p, r - 1 - q, cc * r * r + p * r + q, cc] = 1.0
    return lax.conv_transpose(
        x, jnp.asarray(k, x.dtype), (r, r), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def refine_to_multiple(x: jnp.ndarray, val: int) -> jnp.ndarray:
    """Crop trailing rows/cols so H, W are multiples of `val`
    (data_loader/utils.py:235-245 refine_image_pt). Works on (..., H, W, C)."""
    if val <= 1:
        return x
    h, w = x.shape[-3], x.shape[-2]
    return x[..., : h - h % val, : w - w % val, :]


def gaussian_lowpass_kernel() -> np.ndarray:
    """The fixed 3x3 sigma=1 depthwise kernel of models/loss/gaussian.py:20-27
    (scipy.ndimage.gaussian_filter of a delta, truncated at radius 1)."""
    import scipy.ndimage

    n = np.zeros((3, 3))
    n[1, 1] = 1.0
    return scipy.ndimage.gaussian_filter(n, sigma=1).astype(np.float32)


def gaussian_lowpass(x: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3x3 gaussian blur with ReflectionPad2d(2)-then-valid semantics.

    NOTE (reference quirk, reproduced intentionally): gaussian.py pads by 2 but
    convolves with a 3x3 kernel (padding=0), so the output is H+2 x W+2 — the
    L1_lf loss therefore compares blurred images one ring *larger* than the input.
    Both sides of the loss go through the same layer, so the comparison is valid."""
    k = jnp.asarray(gaussian_lowpass_kernel(), x.dtype)
    x = jnp.pad(x, [(0, 0), (2, 2), (2, 2), (0, 0)], mode="reflect")
    # depthwise conv: same 3x3 kernel per channel
    import jax.lax as lax

    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1, feature_group=c
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def clamp01(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)
