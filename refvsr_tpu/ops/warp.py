"""Flow-based backward warping (NHWC) with torch ``grid_sample`` parity.

The reference uses two *different* warpers (a real parity landmine):

1. ``warp()``               /root/reference/models/utils.py:35-43
   Builds a normalized base grid with ``linspace(-1, 1, size)`` (align_corners=True
   style), adds flow scaled by ``2/(size-1)``, then calls ``grid_sample`` with
   ``align_corners=False`` + ``padding_mode='zeros'``.  The net effective source
   pixel is  ``src = (i + f) * S/(S-1) - 0.5``  (S = size along that axis).

2. ``flow_warp()``          /root/reference/mmedit/models/common/flow_warp.py:6-47
   Unnormalized flow, ``align_corners=True`` + ``padding_mode='border'``:
   ``src = i + f`` with clamped taps.  Used inside SPyNet only.

Both are implemented as 4-corner bilinear gathers over the flattened spatial dim —
XLA lowers constant-free dynamic gathers well on TPU; a fused Pallas kernel lives in
refvsr_tpu/ops/pallas/warp_kernel.py for the hot path."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _bilinear_gather(img: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     padding: str) -> jnp.ndarray:
    """img: (N, H, W, C); sx/sy: (N, Ho, Wo) float source coords in pixel space.

    padding='zeros': taps outside the image contribute 0 (grid_sample zeros).
    padding='border': taps are clamped to the border (grid_sample border)."""
    n, h, w, c = img.shape
    compute_dtype = img.dtype if img.dtype in (jnp.float32, jnp.float64) else jnp.float32
    sx = sx.astype(compute_dtype)
    sy = sy.astype(compute_dtype)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        if padding == "border":
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            valid = None
        else:
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
        flat_idx = yc * w + xc                                # (N, Ho, Wo)
        flat = img.reshape(n, h * w, c)
        out = jnp.take_along_axis(
            flat, flat_idx.reshape(n, -1, 1), axis=1
        ).reshape(yi.shape + (c,))
        if valid is not None:
            out = jnp.where(valid[..., None], out, jnp.zeros((), img.dtype))
        return out

    w00 = ((1.0 - ty) * (1.0 - tx))[..., None].astype(img.dtype)
    w01 = ((1.0 - ty) * tx)[..., None].astype(img.dtype)
    w10 = (ty * (1.0 - tx))[..., None].astype(img.dtype)
    w11 = (ty * tx)[..., None].astype(img.dtype)

    return (tap(y0i, x0i) * w00 + tap(y0i, x0i + 1) * w01
            + tap(y0i + 1, x0i) * w10 + tap(y0i + 1, x0i + 1) * w11)


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """RefVSR's propagation warp (models/utils.py:35-43 semantics).

    x: (N, H, W, C); flow: (N, Ho, Wo, 2) pixel-space (fx, fy). The output spatial
    size follows the *flow* (the reference warps low-res features onto a 2x grid at
    RefVSR.py:220,254 this way).  Base grid is linspace(-1,1) over the flow's grid,
    flow is normalized by the *input* half-extent, and the sum is unnormalized with
    align_corners=False against the input extent; zeros padding."""
    n, h, w, _ = x.shape
    ho, wo = flow.shape[1], flow.shape[2]
    gy, gx = np.meshgrid(np.arange(ho, dtype=np.float32),
                         np.arange(wo, dtype=np.float32), indexing="ij")
    # x_norm = -1 + 2*gx/(Wo-1) + 2*fx/(W-1); src_x = ((x_norm + 1) * W - 1) / 2
    fx = flow[..., 0]
    fy = flow[..., 1]
    xn = gx[None] * (2.0 / max(wo - 1, 1)) + fx * (2.0 / max(w - 1, 1)) - 1.0
    yn = gy[None] * (2.0 / max(ho - 1, 1)) + fy * (2.0 / max(h - 1, 1)) - 1.0
    sx = ((xn + 1.0) * w - 1.0) * 0.5
    sy = ((yn + 1.0) * h - 1.0) * 0.5
    return _bilinear_gather(x, sx, sy, padding="zeros")


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, padding: str = "border") -> jnp.ndarray:
    """mmedit flow_warp semantics (align_corners=True): src = i + f, border padding.

    x: (N, H, W, C); flow: (N, H, W, 2) pixel-space (fx, fy)."""
    n, h, w, _ = x.shape
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]
    return _bilinear_gather(x, sx, sy, padding=padding)
