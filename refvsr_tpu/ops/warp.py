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

Performance: the four bilinear corners are fetched with ONE ``lax.gather`` of
2x2xC patches from a zero-ring-padded canvas instead of four row gathers —
6-7x faster on TPU (XLA row-gather throughput is the bottleneck of the whole
streaming step otherwise; measured 325ms -> 48ms for the 2x-grid feature warp
at 4K). The zero ring makes the one-off out-of-range corner reads exact:

  * zeros padding: a corner one step outside the image must contribute 0 —
    the ring provides it; coordinates beyond the ring mean BOTH corners on
    that axis are outside, so the whole sample is masked to 0.
  * border padding: coordinates are pre-clamped into [0, S-1], so the +1
    corner can only land on the ring when its bilinear weight is exactly 0.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np


def gather_bilinear_patches(x: jnp.ndarray, y0i: jnp.ndarray, x0i: jnp.ndarray):
    """Fetch 2x2xC corner patches at integer top-left coords (y0i, x0i).

    x: (N, H, W, C) UNPADDED; y0i/x0i: (N, ...) int32 in [-1, H-1]/[-1, W-1]
    (callers clamp). Returns (N, ..., 2, 2, C).

    Formulation notes (all three alternatives measured on v5e):
      * 4 independent row gathers: slow (XLA row-gather throughput bound).
      * one lax.gather of (2,2,C) slices: fast, but XLA tiles the operand and
        output over the tiny slice dims — 2.7-5.3x padded layouts, ~12 GB of
        HLO temps at 8K.
      * THIS: a pixel-pair canvas (x[w] ++ x[w+1] -> 2C channels) turns each
        corner ROW into one full-minor-dim row gather — TPU's gather fast
        path, clean (row, 2C) layouts, 2 gathers total."""
    n, h, w, c = x.shape
    idx_shape = y0i.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    hp, wp = h + 2, w + 2
    shifted = jnp.pad(xp[:, :, 1:], [(0, 0), (0, 0), (0, 1), (0, 0)])
    pair = jnp.concatenate([xp, shifted], axis=-1)       # (N, Hp, Wp, 2C)
    flat = pair.reshape(n, hp * wp, 2 * c)

    idx_top = ((y0i + 1) * wp + (x0i + 1)).reshape(n, -1, 1)
    top = jnp.take_along_axis(flat, idx_top, axis=1)
    bot = jnp.take_along_axis(flat, idx_top + wp, axis=1)
    patches = jnp.stack([top, bot], axis=2)              # (N, P, 2, 2C)
    return patches.reshape(idx_shape + (2, 2, c))


# output pixels above which the warp runs in row chunks: the patch-gather
# intermediate carries a ~2.7x tiled-layout padding on TPU (bf16[P,2,2,48]),
# which at 8K scale would be a multi-GB HLO temp. Chunking bounds it.
_WARP_CHUNK_PIXELS = 1 << 21


def _bilinear_sample_chunk(x, sx, sy, padding):
    n, h, w, c = x.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)

    patches = gather_bilinear_patches(x, y0i, x0i)

    w00 = ((1.0 - ty) * (1.0 - tx))[..., None].astype(x.dtype)
    w01 = ((1.0 - ty) * tx)[..., None].astype(x.dtype)
    w10 = (ty * (1.0 - tx))[..., None].astype(x.dtype)
    w11 = (ty * tx)[..., None].astype(x.dtype)
    out = (patches[..., 0, 0, :] * w00 + patches[..., 0, 1, :] * w01
           + patches[..., 1, 0, :] * w10 + patches[..., 1, 1, :] * w11)

    if padding == "zeros":
        valid = ((y0 >= -1.0) & (y0 <= h - 1.0)
                 & (x0 >= -1.0) & (x0 <= w - 1.0))
        out = jnp.where(valid[..., None], out, jnp.zeros((), x.dtype))
    return out


def _bilinear_sample(x: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     padding: str) -> jnp.ndarray:
    """x: (N, H, W, C); sx/sy: (N, Ho, Wo) f32 source coords in pixel space."""
    n, h, w, c = x.shape
    ho, wo = sx.shape[1], sx.shape[2]
    sx = sx.astype(jnp.float32)
    sy = sy.astype(jnp.float32)
    if padding == "border":
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)

    if n * ho * wo <= _WARP_CHUNK_PIXELS:
        return _bilinear_sample_chunk(x, sx, sy, padding)

    rows_per = max(1, _WARP_CHUNK_PIXELS // (n * wo))
    num_chunks = -(-ho // rows_per)
    pad_rows = num_chunks * rows_per - ho
    if pad_rows:
        sx = jnp.pad(sx, [(0, 0), (0, pad_rows), (0, 0)])
        sy = jnp.pad(sy, [(0, 0), (0, pad_rows), (0, 0)])
    sx_t = sx.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)
    sy_t = sy.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)

    def step(_, coords):
        cx, cy = coords
        out = _bilinear_sample_chunk(x, cx, cy, padding)
        # flatten: a stacked (..., wo, C) scan output would carry the C->128
        # lane padding (2.67x HBM at C=48); 1-D chunks tile cleanly
        return None, out.reshape(n, rows_per * wo * c)

    _, outs = lax.scan(step, None, (sx_t, sy_t))
    outs = outs.transpose(1, 0, 2).reshape(n, num_chunks * rows_per, wo, c)
    return outs[:, :ho]


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """RefVSR's propagation warp (models/utils.py:35-43 semantics).

    x: (N, H, W, C); flow: (N, Ho, Wo, 2) pixel-space (fx, fy). The output
    spatial size follows the *flow* (the reference warps low-res features onto
    a 2x grid at RefVSR.py:220,254 this way). Base grid is linspace(-1,1) over
    the flow's grid, flow is normalized by the *input* half-extent, and the sum
    is unnormalized with align_corners=False against the input extent; zeros
    padding."""
    n, h, w, _ = x.shape
    ho, wo = flow.shape[1], flow.shape[2]
    gy, gx = np.meshgrid(np.arange(ho, dtype=np.float32),
                         np.arange(wo, dtype=np.float32), indexing="ij")
    # x_norm = -1 + 2*gx/(Wo-1) + 2*fx/(W-1); src_x = ((x_norm + 1) * W - 1) / 2
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xn = gx[None] * (2.0 / max(wo - 1, 1)) + fx * (2.0 / max(w - 1, 1)) - 1.0
    yn = gy[None] * (2.0 / max(ho - 1, 1)) + fy * (2.0 / max(h - 1, 1)) - 1.0
    sx = ((xn + 1.0) * w - 1.0) * 0.5
    sy = ((yn + 1.0) * h - 1.0) * 0.5
    return _bilinear_sample(x, sx, sy, padding="zeros")


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, padding: str = "border") -> jnp.ndarray:
    """mmedit flow_warp semantics (align_corners=True): src = i + f, border
    padding. x: (N, H, W, C); flow: (N, H, W, 2) pixel-space (fx, fy)."""
    n, h, w, _ = x.shape
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    sx = gx[None] + flow[..., 0].astype(jnp.float32)
    sy = gy[None] + flow[..., 1].astype(jnp.float32)
    return _bilinear_sample(x, sx, sy, padding=padding)
