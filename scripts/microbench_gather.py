#!/usr/bin/env python
"""Microbench: characterize the TPU row-gather wall that bounds the warp path.

Round-1/2 profiles put the bilinear warps at ~16 ns per gathered row
(take_along_axis of 4C=192-lane quad rows), ~10x over the HBM floor for the
useful bytes. Hypotheses this bench separates:

  H1 layout: a (1, 192)-row slice of a T(8,128)-tiled table touches 8
     sublanes x 2 lane tiles = 4 KB of HBM per 384 useful bytes -> the wall
     is tiling-induced read amplification (iota == random speed).
  H2 op overhead: XLA's gather loop is dispatch-bound (ns/row constant
     across row widths; block-gather of 8 rows per index ~8x faster/byte).
  H3 cache locality: smooth (iota-ish) indices reuse tiles; random indices
     are slower (iota >> random).

Cases (all N=1, table rows R, row width L lanes, bf16, indices int32):
  taa L=192 iota / random / smooth   take_along_axis[(R,192)] per-pixel
  taa L=96 / L=384 / L=768           row-width scaling
  block8                             gather (8,192) blocks via R/8 indices
  dyn_slice_scan                     lax.scan of dynamic_slice (1 row/step)

Run: python scripts/microbench_gather.py [--rows 8294400] [--out 8294400]
(defaults sized to the 2x-grid UP warp at 1080p-HD-in: 2160*3840 outputs)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=6, warmup=2, bytes_useful=None, rows=None):
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
    extra = ""
    if rows:
        extra += f"  {dt/rows*1e9:7.2f} ns/row"
    if bytes_useful:
        extra += f"  {bytes_useful/dt/1e9:7.1f} GB/s useful"
    print(f"{name:26s} {dt*1000:9.2f} ms{extra}")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2160 * 3840)
    p.add_argument("--out", type=int, default=2160 * 3840)
    a = p.parse_args()
    R, O = a.rows, a.out

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx_rand = jax.random.randint(k1, (1, O, 1), 0, R, jnp.int32)
    idx_iota = (jnp.arange(O, dtype=jnp.int32) % R).reshape(1, O, 1)
    # smooth: iota + small per-pixel jitter (what a real flow field looks like)
    idx_smooth = jnp.clip(
        idx_iota + jax.random.randint(k2, (1, O, 1), -64, 64), 0,
        R - 1).astype(jnp.int32)

    def gather(tab, idx):
        return jnp.sum(jnp.take_along_axis(tab, idx, axis=1,
                                           mode="clip").astype(jnp.float32))

    for L in (192,):
        tab = jax.random.uniform(key, (1, R, L), jnp.bfloat16)
        for name, idx in (("iota", idx_iota), ("smooth", idx_smooth),
                          ("random", idx_rand)):
            timeit(f"taa L={L} {name}", jax.jit(gather), tab, idx,
                   rows=O, bytes_useful=O * L * 2)
        del tab

    for L in (96, 384, 768):
        tab = jax.random.uniform(key, (1, R, L), jnp.bfloat16)
        timeit(f"taa L={L} smooth", jax.jit(gather), tab,
               jnp.clip(idx_smooth, 0, R - 1), rows=O,
               bytes_useful=O * L * 2)
        del tab

    # block gather: O/8 indices, each fetching an (8, 192) block ->
    # same useful bytes as taa L=192
    Rb, Ob = R // 8, O // 8
    tab_b = jax.random.uniform(key, (1, Rb, 8 * 192), jnp.bfloat16)
    idx_b = jax.random.randint(k1, (1, Ob, 1), 0, Rb, jnp.int32)

    def gather_b(tab, idx):
        return jnp.sum(jnp.take_along_axis(tab, idx, axis=1,
                                           mode="clip").astype(jnp.float32))
    timeit("block8 random", jax.jit(gather_b), tab_b, idx_b, rows=Ob,
           bytes_useful=O * 192 * 2)
    del tab_b

    # one-row-per-step dynamic-slice scan (lower bound on loop dispatch)
    Os = min(O, 1 << 16)
    tab = jax.random.uniform(key, (R, 192), jnp.bfloat16)
    idx_s = jax.random.randint(k1, (Os,), 0, R, jnp.int32)

    @jax.jit
    def dyn_scan(tab, idx):
        def body(c, i):
            return c + jnp.sum(jax.lax.dynamic_slice_in_dim(
                tab, i, 1, 0).astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), idx)
        return c
    timeit(f"dyn_slice_scan O={Os}", dyn_scan, tab, idx_s, rows=Os)


if __name__ == "__main__":
    main()
