#!/usr/bin/env python
"""Microbench: bilinear corner-gather formulations at the UP-warp shape.

Finding so far (v5e, solo runs): XLA row-gather cost is ROW-COUNT bound
(~21 ns/row at these shapes, independent of row width 48 vs 96 lanes), so
fewer-but-wider gathered rows win. Variants:

  V1 two gathers from the pixel-PAIR canvas (2C lanes)      [round-1 design]
  V2 ONE gather from a pixel-QUAD canvas (4C lanes)
  V3 one lax.gather of (2, 2C) slices from the pair canvas
  V4 four gathers from the unpadded image (C lanes)         [current]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(name, fn, *args, iters=8, warmup=3):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        acc = acc + fn(*args)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + fn(*args)
    assert float(acc) == float(acc)
    print(f"{name:40s} {(time.perf_counter() - t0) / iters * 1000:9.2f} ms",
          flush=True)


def main():
    h, w, c = 1088, 1920, 48
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.uniform(key, (1, h, w, c), dt)
    # random in-bounds corner coords (worst-case scattered)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (1, h, w), 0, h - 1)
    x0 = jax.random.randint(kx, (1, h, w), 0, w - 1)

    def pair_canvas(x):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        sh = jnp.pad(xp[:, :, 1:], [(0, 0), (0, 0), (0, 1), (0, 0)])
        return jnp.concatenate([xp, sh], -1)          # (1, h+2, w+2, 2C)

    @jax.jit
    def v1(x, y0, x0):
        pair = pair_canvas(x)
        wp = w + 2
        flat = pair.reshape(1, -1, 2 * c)
        idx = ((y0 + 1) * wp + (x0 + 1)).reshape(1, -1, 1)
        top = jnp.take_along_axis(flat, idx, axis=1)
        bot = jnp.take_along_axis(flat, idx + wp, axis=1)
        return jnp.sum(top.astype(jnp.float32)) + jnp.sum(
            bot.astype(jnp.float32))
    timeit("V1 pair canvas, 2 gathers (2C rows)", v1, x, y0, x0)

    @jax.jit
    def v2(x, y0, x0):
        pair = pair_canvas(x)
        quad = jnp.concatenate(
            [pair, jnp.pad(pair[:, 1:], [(0, 0), (0, 1), (0, 0), (0, 0)])],
            -1)                                        # (1, h+2, w+2, 4C)
        wp = w + 2
        flat = quad.reshape(1, -1, 4 * c)
        idx = ((y0 + 1) * wp + (x0 + 1)).reshape(1, -1, 1)
        out = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.sum(out.astype(jnp.float32))
    timeit("V2 quad canvas, 1 gather (4C rows)", v2, x, y0, x0)

    @jax.jit
    def v3(x, y0, x0):
        pair = pair_canvas(x)
        wp = w + 2
        flat = pair.reshape((h + 2) * wp, 2 * c)
        starts = ((y0 + 1) * wp + (x0 + 1)).reshape(-1, 1)
        out = lax.gather(
            flat, starts,
            lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                       collapsed_slice_dims=(),
                                       start_index_map=(0,)),
            slice_sizes=(2, 2 * c), mode="clip")
        return jnp.sum(out.astype(jnp.float32))
    timeit("V3 pair canvas, (2,2C) slice gather", v3, x, y0, x0)

    @jax.jit
    def v4(x, y0, x0):
        flat = x.reshape(1, -1, c)
        y1 = jnp.minimum(y0 + 1, h - 1)
        x1 = jnp.minimum(x0 + 1, w - 1)
        s = jnp.zeros((), jnp.float32)
        for yy, xx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1)):
            idx = (yy * w + xx).reshape(1, -1, 1)
            s = s + jnp.sum(
                jnp.take_along_axis(flat, idx, axis=1).astype(jnp.float32))
        return s
    timeit("V4 no canvas, 4 gathers (C rows)", v4, x, y0, x0)

    # V5: quad canvas built once, gather in 2 row-chunks via scan (the
    # affine-gather pattern) — checks the canvas is hoisted out of the scan
    @jax.jit
    def v5(x, y0, x0):
        pair = pair_canvas(x)
        quad = jnp.concatenate(
            [pair, jnp.pad(pair[:, 1:], [(0, 0), (0, 1), (0, 0), (0, 0)])],
            -1)
        wp = w + 2
        flat = quad.reshape(1, -1, 4 * c)
        idx = ((y0 + 1) * wp + (x0 + 1)).reshape(1, 2, -1)

        def step(_, ii):
            o = jnp.take_along_axis(flat, ii[..., None], axis=1)
            return None, jnp.sum(o.astype(jnp.float32))
        _, ss = lax.scan(step, None, idx.transpose(1, 0, 2))
        return jnp.sum(ss)
    timeit("V5 quad canvas, scan-chunked gather", v5, x, y0, x0)


if __name__ == "__main__":
    main()
