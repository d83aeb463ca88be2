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

This file is the measurement harness; the formulation WON on-chip (chip
session r3: 361.7 ms banded th=16/xb=8 vs 465.0 ms quad at the 1080p-HD
2x UP-warp) and is now the default inside ops/warp._bilinear_sample. A
Pallas DMA-band variant of the same idea measured 610 ms (per-tile DMA
latency not hidden) and was removed — docs/ROUND3_NOTES.md.

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


# ---------------------------------------------------------------
from refvsr_tpu.ops.warp_banded import banded_sample  # noqa: E402


def banded_warp_like(x, flow):
    """warp() coordinate convention on the banded sampler (shared helper —
    the coordinate math lives once in ops/warp.warp_coords)."""
    from refvsr_tpu.ops.warp import warp_coords
    sx, sy = warp_coords(x.shape[1:3], flow)
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

        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        sy = gy[None] + flow[..., 1]
        sx = gx[None] + flow[..., 0]
        for xb, th in ((8, 8), (16, 8), (8, 16)):
            fn = jax.jit(functools.partial(
                lambda x, sy, sx, xb, th: jnp.sum(
                    banded_sample(x, sy, sx, xb=xb, th=th)[0]
                    .astype(jnp.float32)), xb=xb, th=th))
            timeit(f"banded xb={xb} th={th} {name}", fn, x, sy, sx)

        # cost-model breakdown (xb=8, th=16 fixed): shrink the select window
        # below correctness (ok=False is fine — same compute shape) and read
        # time vs select-pass count; the intercept is gather+layout cost.
        for ysel, xse in ((4, 4), (4, 0), (2, 4), (2, 0)):
            passes = ysel * (8 + xse)
            fn = jax.jit(functools.partial(
                lambda x, sy, sx, ysel, xse: jnp.sum(
                    banded_sample(x, sy, sx, xb=8, th=16, ysel=ysel,
                                  xsel_extra=xse)[0].astype(jnp.float32)),
                ysel=ysel, xse=xse))
            timeit(f"banded sel={ysel}x{8+xse} ({passes}p) {name}",
                   fn, x, sy, sx)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    a = ap.parse_args()
    if a.check:
        check()
    else:
        bench()
