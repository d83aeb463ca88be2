#!/usr/bin/env python
"""Prototype + microbench: block-diagonal "banded" bilinear warp.

The quad-canvas warp (ops/warp.py) is row-count bound: one gathered row per
output pixel at ~16-20 ns/row (8.3M rows = ~150 ms for the 1080p-HD-in UP
warp). This prototype exploits flow SMOOTHNESS without giving up exactness:

  1. Tile the output grid (TH x TWO). Within a tile, source coords span
     roughly the tile extent plus the intra-tile flow range.
  2. Per tile, row-gather a source BAND: YB rows x NB col-blocks of XB
     columns, anchored at the tile's min corner coords (block-dynamic, exact
     integer anchors). Rows gathered: ~PIX * YB/(TH*XB) instead of PIX —
     ~4-5x fewer at TH=8, XB=8, YB=12.
  3. Resolve each pixel's 4 bilinear corners from the band with a small
     STATIC select window: out += w[dy,dx] * band[., dy:dy+TH, dx:dx+TWO, .]
     over (YSEL x XSEL) shifted static slices — pure VPU passes, no gather.
  4. Validity is computed exactly per tile (band covered all corners?). A
     `jnp.any(invalid)` cond falls back to the quad path for the whole call —
     rare (needs intra-tile flow range > XSEL-2 px or > YSEL-2 rows).

This file is the measurement harness; if it wins on-chip the formulation
moves into ops/warp.py behind the same _bilinear_sample interface.

Run: python scripts/microbench_banded_warp.py --check   (CPU parity)
     python scripts/microbench_banded_warp.py           (on-chip timings)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- prototype

def banded_sample(x, sy, sx, padding="zeros", th=8, two=128, xb=8,
                  ysel=4, xsel_extra=4, debug_stats=False):
    """Bilinear sample of x (1, H, W, C) at f32 source coords sy/sx
    (1, Ho, Wo), matching ops/warp._bilinear_sample semantics exactly when
    the validity conditions hold (returns (out, ok) — caller is expected to
    lax.cond on ok for the fallback).

    Static knobs: TH x TWO output tile; XB col-block granularity; band is
    YB = th + ysel rows by NB = ceil((two + xb + xsel_extra + xb - 2)/xb)
    col-blocks; select window is YSEL x XSEL with XSEL = xb + xsel_extra.
    """
    n, h, w, c = x.shape
    ho, wo = sy.shape[1], sy.shape[2]
    assert n == 1, "stream path is n=1; vmap if needed"
    dt = x.dtype
    sy = sy.astype(jnp.float32)
    sx = sx.astype(jnp.float32)
    if padding == "border":
        sy = jnp.clip(sy, 0.0, h - 1.0)
        sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ty = (sy - y0)[0]
    tx = (sx - x0)[0]
    # integer anchors in ring coords (ring=1: one-step-outside reads zeros)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)[0] + 1   # (Ho, Wo)
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)[0] + 1

    xsel = xb + xsel_extra
    yb = th + ysel
    nb = -(-(two + xb + xsel - 2) // xb)

    # Generous zero padding makes every anchor a real row/col: ring (1) plus
    # top th rows (a valid point at tile row rr can anchor th-1 rows above
    # its source), bottom yb, left `two` cols (same in x), right to XB
    # alignment with xsel+xb slack. With the diagonal anchors below, band
    # coverage is then guaranteed by construction; only ok_sel (window span)
    # can fail.
    top, left = th + 1, two + 1
    wp_al = -(-(left + w + 1 + two + xb + xsel) // xb) * xb
    hp = top + h + 1 + yb
    xp = jnp.pad(x[0], [(top, hp - top - h), (left, wp_al - left - w),
                        (0, 0)])
    nxb = wp_al // xb
    flat = xp.reshape(hp * nxb, xb * c)
    # shift anchors into padded coords (ring offset already applied above)
    y0r = y0i + (top - 1)
    x0c = x0i + (left - 1)

    # tile grids (pad output to tile multiples)
    ho_p = -(-ho // th) * th
    wo_p = -(-wo // two) * two
    pad_o = [(0, ho_p - ho), (0, wo_p - wo)]
    nty, ntx = ho_p // th, wo_p // two
    ntiles = nty * ntx

    def tiles_of(a, **kw):
        a = jnp.pad(a, pad_o, **kw)
        return (a.reshape(nty, th, ntx, two).transpose(0, 2, 1, 3)
                .reshape(ntiles, th, two))

    if padding == "zeros":
        valid_f = ((y0[0] >= -1.0) & (y0[0] <= h - 1.0)
                   & (x0[0] >= -1.0) & (x0[0] <= w - 1.0))
    else:
        valid_f = jnp.ones((ho, wo), jnp.bool_)
    vmask_t = tiles_of(valid_f.astype(jnp.float32))   # pads to 0 = masked
    live = vmask_t > 0                                # real AND in-image

    y0r_t = tiles_of(y0r)
    x0c_t = tiles_of(x0c)
    ty_t = tiles_of(ty)
    tx_t = tiles_of(tx)

    rr = jax.lax.broadcasted_iota(jnp.int32, (ntiles, th, two), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (ntiles, th, two), 2)

    # diagonal anchors: masked points excluded (a big sentinel keeps them out
    # of the min without branching)
    big = jnp.int32(1 << 28)
    ky = jnp.min(jnp.where(live, y0r_t - rr, big), axis=(1, 2))
    kxd = jnp.min(jnp.where(live, x0c_t - cc, big), axis=(1, 2))
    all_dead = ky == big
    ky = jnp.where(all_dead, 0, jnp.clip(ky, 0, hp - yb))
    kxb = jnp.where(all_dead, 0,
                    jnp.clip(kxd // xb, 0, nxb - nb)).astype(jnp.int32)

    dy = y0r_t - ky[:, None, None] - rr            # in [0, ysel-2] if valid
    dx = x0c_t - (kxb * xb)[:, None, None] - cc    # in [0, xsel-2] if valid
    ok_sel = ((dy >= 0) & (dy <= ysel - 2) & (dx >= 0) & (dx <= xsel - 2))
    ok = jnp.all(ok_sel | ~live)

    # ---- band gather: (ntiles, yb, nb) row ids -> (ntiles, yb, nb*xb, c)
    jj = jnp.arange(yb, dtype=jnp.int32)
    bb = jnp.arange(nb, dtype=jnp.int32)
    rows = ((ky[:, None] + jj[None]) * nxb)[:, :, None] + \
        (kxb[:, None] + bb[None])[:, None, :]                     # (nt, yb, nb)
    band = jnp.take_along_axis(
        flat[None], rows.reshape(1, -1, 1), axis=1, mode="clip")
    band = band.reshape(ntiles, yb, nb * xb, c)

    # ---- static select window
    # clamp dy/dx so padded/invalid points read *something* in-range (their
    # weights don't matter once the caller falls back on ~ok)
    dy_c = jnp.clip(dy, 0, ysel - 2)
    dx_c = jnp.clip(dx, 0, xsel - 2)
    wy1 = ty_t.astype(jnp.float32)
    wx1 = tx_t.astype(jnp.float32)
    vmask = vmask_t

    out = jnp.zeros((ntiles, th, two, c), jnp.float32)
    for oy in range(ysel):
        for ox in range(xsel):
            # weight of window cell (oy, ox) for each point: bilinear weight
            # of corner (oy-dy, ox-dx) when that offset is 0 or 1, else 0
            cy = oy - dy_c
            cx = ox - dx_c
            wgt = (jnp.where(cy == 0, 1.0 - wy1, jnp.where(cy == 1, wy1, 0.0))
                   * jnp.where(cx == 0, 1.0 - wx1,
                               jnp.where(cx == 1, wx1, 0.0)) * vmask)
            sl = lax.slice(band, (0, oy, ox, 0),
                           (ntiles, oy + th, ox + two, c))
            out = out + wgt[..., None] * sl.astype(jnp.float32)

    out = out.astype(dt).reshape(nty, ntx, th, two, c).transpose(0, 2, 1, 3, 4)
    out = out.reshape(1, ho_p, wo_p, c)[:, :ho, :wo]
    if debug_stats:
        return out, ok, {"ok_sel": jnp.mean(ok_sel.astype(jnp.float32)),
                         "dy_max": jnp.max(jnp.where(live, dy, 0)),
                         "dx_max": jnp.max(jnp.where(live, dx, 0))}
    return out, ok


def banded_warp_like(x, flow):
    """warp() coordinate convention (ops/warp.py:175) on the banded sampler."""
    n, h, w, _ = x.shape
    ho, wo = flow.shape[1], flow.shape[2]
    gy, gx = np.meshgrid(np.arange(ho, dtype=np.float32),
                         np.arange(wo, dtype=np.float32), indexing="ij")
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xn = gx[None] * (2.0 / max(wo - 1, 1)) + fx * (2.0 / max(w - 1, 1)) - 1.0
    yn = gy[None] * (2.0 / max(ho - 1, 1)) + fy * (2.0 / max(h - 1, 1)) - 1.0
    sx = ((xn + 1.0) * w - 1.0) * 0.5
    sy = ((yn + 1.0) * h - 1.0) * 0.5
    return banded_sample(x, sy, sx, padding="zeros")


# --------------------------------------------------------------- harness

def _smooth_flow(key, n, h, w, mag=12.0, grad=0.015):
    """A realistic flow: global translation + smooth low-freq field whose
    gradient stays ~grad px/px."""
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n, 1, 1, 2), minval=-mag, maxval=mag)
    coarse = jax.random.uniform(k2, (n, 8, 8, 2), minval=-1.0, maxval=1.0)
    sm = jax.image.resize(coarse, (n, h, w, 2), "bilinear")
    return (base + sm * (grad * min(h, w))).astype(jnp.float32)


def check():
    jax.config.update("jax_platforms", "cpu")
    from refvsr_tpu.ops.warp import warp as ref_warp

    key = jax.random.PRNGKey(0)
    # mag=30 pushes a band of pixels fully/partially out of bounds (zeros
    # masking + ring reads); 41x57 exercises non-tile-aligned output padding
    for (h, w, c, mag) in ((40, 56, 8, 6.0), (64, 96, 16, 20.0),
                           (41, 57, 3, 30.0), (48, 300, 8, 10.0)):
        kx, kf = jax.random.split(jax.random.fold_in(key, h))
        x = jax.random.uniform(kx, (1, h, w, c), jnp.float32)
        flow = _smooth_flow(kf, 1, h, w, mag=mag, grad=0.01)
        want = ref_warp(x, flow)
        got, ok = banded_warp_like(x, flow)
        assert bool(ok), f"validity tripped at {(h, w, mag)}"
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        print(f"parity ok ({h}x{w}x{c}, mag={mag})")

    # violent flow must trip validity, not silently mis-sample
    x = jax.random.uniform(key, (1, 64, 96, 8), jnp.float32)
    wild = jax.random.uniform(key, (1, 64, 96, 2), minval=-40, maxval=40)
    _, ok = banded_warp_like(x, wild)
    assert not bool(ok), "violent flow should invalidate the band"
    print("fallback trip ok")


def bench():
    from refvsr_tpu.ops.warp import warp as ref_warp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def timeit(name, fn, *args, iters=6, warmup=2):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            acc = acc + fn(*args)
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + fn(*args)
        assert float(acc) == float(acc)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1000:9.2f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    shapes = [("UP-warp 1080pHD (2160x3840x48)", 2160, 3840, 48),
              ("feat-warp 1080pHD (1080x1920x49)", 1080, 1920, 49)]
    for name, h, w, c in shapes:
        x = jax.random.uniform(key, (1, h, w, c), jnp.bfloat16)
        flow = _smooth_flow(key, 1, h, w, mag=24.0)

        timeit(f"quad  {name}", jax.jit(
            lambda x, f: jnp.sum(ref_warp(x, f).astype(jnp.float32))), x, flow)
        for xb, th in ((8, 8), (16, 8), (8, 16)):
            fn = jax.jit(functools.partial(
                lambda x, sy, sx, xb, th: jnp.sum(
                    banded_sample(x, sy, sx, xb=xb, th=th)[0]
                    .astype(jnp.float32)), xb=xb, th=th))
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                                 np.arange(w, dtype=np.float32), indexing="ij")
            sy = gy[None] + flow[..., 1]
            sx = gx[None] + flow[..., 0]
            timeit(f"banded xb={xb} th={th} {name}", fn, x, sy, sx)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    a = ap.parse_args()
    if a.check:
        check()
    else:
        bench()
