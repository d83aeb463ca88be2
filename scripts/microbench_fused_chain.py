#!/usr/bin/env python
"""Probe: can a Mosaic kernel beat XLA's ~12%-MXU C=48 conv chains?

Design under test (round 2; round 1's per-conv kernel lost to XLA):
  * im2col in VMEM -> one dot per conv with K = 9*C (432): K-folding lifts
    the MXU ceiling from (48/128)^2 = 14% to ~(432/512)*(48/128) = 31%
    (N = C_out = 48 lanes stays the hard cap).
  * fuse G residual blocks (2G convs) per launch, activations resident in
    VMEM between convs — no inter-conv HBM round trips or relayouts.
  * grid over H strips (manual DMA — strips overlap by the 2G-row halo);
    out-of-image rows/cols re-zeroed after every biased conv (the
    models/refvsr._tail_tiled masking scheme), reproducing 'same' zero
    padding exactly. Roll wrap-around only ever touches rows the shrinking
    halo already excludes (margin == n_convs).

Usage:
  python scripts/microbench_fused_chain.py --check          # CPU parity
  python scripts/microbench_fused_chain.py --size 1080x1920 # TPU timing
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cache():
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
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:34s} {dt:9.2f} ms")
    return dt


def xla_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1080x1920")
    p.add_argument("--blocks", type=int, default=5,
                   help="residual blocks per fused launch (group_blocks)")
    p.add_argument("--total_blocks", type=int, default=None,
                   help="total blocks in the chain (default: = --blocks)")
    p.add_argument("--tile", type=int, default=None)
    p.add_argument("--chunk", type=int, default=8)
    a = p.parse_args()
    _cache()
    from refvsr_tpu.ops.pallas.conv_chain import fused_conv_chain
    c = 48
    h, w = (int(v) for v in a.size.split("x"))
    dt = jnp.bfloat16
    n_blocks = a.total_blocks or a.blocks
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, h, w, c), dt)
    L = 2 * n_blocks
    ks = [jax.random.normal(jax.random.PRNGKey(i), (3, 3, c, c), dt) * 0.05
          for i in range(L)]
    bs = [jax.random.normal(jax.random.PRNGKey(100 + i), (c,), dt) * 0.01
          for i in range(L)]
    ops = []
    for i in range(n_blocks):
        ops += [{"act": "relu"}, {"res": True}]

    def xla_chain_val(x, ks, bs):
        cur = x
        for i in range(n_blocks):
            y = jnp.maximum(xla_conv(cur, ks[2 * i], bs[2 * i]), 0.0)
            cur = cur + xla_conv(y, ks[2 * i + 1], bs[2 * i + 1])
        return cur

    @jax.jit
    def xla_chain(x, ks, bs):
        return jnp.sum(xla_chain_val(x, ks, bs).astype(jnp.float32))

    @jax.jit
    def fused(x, ks, bs):
        y = fused_conv_chain(x, ks, bs, ops, group_blocks=a.blocks,
                             tile_h=a.tile, row_chunk=a.chunk)
        return jnp.sum(y.astype(jnp.float32))

    flops = 2 * h * w * 9 * c * c * L
    t_x = timeit(f"XLA chain ({n_blocks} blocks)", xla_chain, x, ks, bs)
    t_f = timeit(f"fused chain ({n_blocks} blk/g{a.blocks})", fused, x, ks, bs)
    for name, t in (("XLA", t_x), ("fused", t_f)):
        print(f"{name}: {flops / (t / 1e3) / 1e12:.1f} TFLOP/s "
              f"({flops / (t / 1e3) / 197e12 * 100:.1f}% MXU)")


if __name__ == "__main__":
    main()
