"""Strided-conv lowering that keeps the MXU busy (NHWC).

XLA's TPU lowering of a k x k / stride-s conv with s > 1 is poor for the
shapes this model hits (measured: AlignedConv2d's 5x5/stride-8 'p_conv' took
33 ms at (1088, 1920, 64) on v5e — ~15x over its flop/bandwidth floor).

``blocked_strided_conv`` rewrites it exactly: zero-pad the kernel to a
multiple of s, space-to-depth the input by s (channels become s*s*C), and run
a stride-1 K' x K' conv with K' = ceil(k/s) — for k <= s that is a single
1x1 conv, i.e. one dense [OH*OW, s*s*C] x [s*s*C, O] MXU matmul. The extra
zero-channel FLOPs are negligible next to the lowering win.

Numerically identical to lax.conv (same taps, matmul-reassociated sums).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def blocked_strided_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray | None, stride: int,
                         pad: int) -> jnp.ndarray:
    """x: (N, H, W, C); kernel: (kh, kw, C, O) HWIO; symmetric padding `pad`.
    Output matches torch Conv2d: OH = (H + 2*pad - kh)//stride + 1."""
    n, h, w, c = x.shape
    kh, kw, _, o = kernel.shape
    s = stride
    oh = (h + 2 * pad - kh) // s + 1
    ow = (w + 2 * pad - kw) // s + 1
    kp_h = -(-kh // s)
    kp_w = -(-kw // s)

    # window for output (i, j) covers padded rows [s*i, s*i + kh - 1] —
    # blocks i .. i + kp_h - 1 after the top/left pad of `pad`.
    hp = s * (oh + kp_h - 1)
    wp = s * (ow + kp_w - 1)
    # bottom/right may be negative (input rows beyond the last window start
    # are unused when k <= s): crop instead of pad
    bh, bw = hp - h - pad, wp - w - pad
    if bh < 0:
        x, bh = x[:, :bh], 0
    if bw < 0:
        x, bw = x[:, :, :bw], 0
    xp = jnp.pad(x, [(0, 0), (pad, bh), (pad, bw), (0, 0)])
    xb = xp.reshape(n, oh + kp_h - 1, s, ow + kp_w - 1, s, c)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, oh + kp_h - 1, ow + kp_w - 1, s * s * c)

    # scatter the kernel into block-phase channels: pad to (kp*s, kp*s) then
    # regroup rows as (block a, phase r)
    kpad = jnp.pad(kernel, [(0, kp_h * s - kh), (0, kp_w * s - kw),
                            (0, 0), (0, 0)])
    wk = kpad.reshape(kp_h, s, kp_w, s, c, o).transpose(0, 2, 1, 3, 4, 5)
    wk = wk.reshape(kp_h, kp_w, s * s * c, o)

    out = lax.conv_general_dilated(
        xb, wk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def wide_im2col_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None) -> jnp.ndarray:
    """k x k 'same' stride-1 conv via width-im2col: concat the k horizontally
    shifted copies of x (k*C channels) and run a (k, 1) conv — the MXU dots
    get K = k*C instead of C (SPyNet's 7x7 convs at 8..64 channels run ~37x
    over their FLOP floor with XLA's native lowering; K=7C recovers most of
    the systolic-array K-dim). Numerically identical taps, matmul-
    reassociated sums. Temp cost: a k*C-channel copy of x."""
    n, h, w, c = x.shape
    k = kernel.shape[0]
    p = k // 2
    xp = jnp.pad(x, [(0, 0), (0, 0), (p, p), (0, 0)])
    cols = jnp.concatenate([xp[:, :, i:i + w] for i in range(k)], axis=-1)
    # (k, k, C, O): row tap dy stays spatial; column tap dx becomes the
    # dx-th C-channel block of the (k, 1) kernel
    o = kernel.shape[-1]
    wk = kernel.reshape(k, 1, k * c, o)
    out = lax.conv_general_dilated(
        cols, wk, window_strides=(1, 1),
        padding=((p, p), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


import functools

import numpy as _onp


@functools.lru_cache(maxsize=None)
def _preshuffle_maps(kh: int, kw: int, ci: int, co: int, r: int):
    """Static gather maps turning a (kh, kw, Ci, Co) conv kernel into its
    pre-shuffle equivalent (kh, kw, Ci*r^2, Co*r^2).

    Identity: conv_k(pixel_shuffle(A, r)) == pixel_shuffle(conv_k2(A), r)
    where k2 is the returned rearrangement — each output phase (p, q) of
    each output channel o reads input phase (rho, sigma) of channel c at
    pre-shuffle offset (a, b) iff dy = r*a + rho - p and dx = r*b + sig - q
    land inside the original k-tap window. Requires the taps to fit:
    r*(kh//2) covers the phase-shifted offsets (true for k=3, r=2).

    pixel_shuffle convention (ops/image.py): channel = c*r*r + p*r + q,
    p = row phase."""
    r2 = r * r
    hh, hw = kh // 2, kw // 2
    a = _onp.arange(kh) - hh                      # pre-shuffle row offsets
    b = _onp.arange(kw) - hw
    ci_ix = _onp.arange(ci * r2)
    c, rho, sig = ci_ix // r2, (ci_ix % r2) // r, ci_ix % r
    co_ix = _onp.arange(co * r2)
    o, p, q = co_ix // r2, (co_ix % r2) // r, co_ix % r

    dy = (r * a[:, None, None, None] + rho[None, None, :, None]
          - p[None, None, None, :])              # (kh, 1, ci*r2, co*r2)
    dx = (r * b[None, :, None, None] + sig[None, None, :, None]
          - q[None, None, None, :])              # (1, kw, ci*r2, co*r2)
    my = (dy >= -hh) & (dy <= hh)
    mx = (dx >= -hw) & (dx <= hw)
    dyi = _onp.clip(dy, -hh, hh) + hh
    dxi = _onp.clip(dx, -hw, hw) + hw
    sh = (kh, kw, ci * r2, co * r2)
    return (_onp.broadcast_to(dyi, sh).copy(),
            _onp.broadcast_to(dxi, sh).copy(),
            _onp.broadcast_to(c[None, None, :, None], sh).copy(),
            _onp.broadcast_to(o[None, None, None, :], sh).copy(),
            _onp.broadcast_to(my & mx, sh).copy())


def preshuffle_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias, r: int = 2):
    """Conv-after-pixel_shuffle computed BEFORE the shuffle.

    x: (N, H, W, Ci*r^2) pre-shuffle tensor; kernel: (k, k, Ci, Co);
    returns (N, H, W, Co*r^2) such that
    pixel_shuffle(out, r) == conv_same(pixel_shuffle(x, r), kernel) + bias.

    Why: the reference tail (RefVSR.py:114-118) runs 3x3 convs on the
    r-upscaled grid — at 8K output those are 33 MP x C=48 convs that XLA
    executes at ~4% MXU (chip r5 roofline: tail 11.3x off its HBM bound).
    The transformed conv has r^2-fold channels on 1/r^2 the pixels: the
    same real math at MXU-friendly channel counts, and the r-grid tensor
    is never materialized until the single final shuffle."""
    kh, kw, ci, co = kernel.shape
    dyi, dxi, cc, oo, m = _preshuffle_maps(kh, kw, ci, co, r)
    k2 = kernel[dyi, dxi, cc, oo] * jnp.asarray(m, kernel.dtype)
    out = lax.conv_general_dilated(
        x, k2, window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if bias is not None:
        out = out + jnp.repeat(bias, r * r).astype(x.dtype)
    return out
