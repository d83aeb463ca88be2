#!/usr/bin/env python
"""Microbench: SPyNet basic-module conv formulations on the real chip.

Round-2 profile: spynet is 339 ms/frame at 1080p-HD-in (batch-2 pair),
~37x over its MXU FLOP floor — the 7x7 convs at 8/32/64/32/16/2 channels
lower to K=C dots that waste most of both MXU operand dims. Candidates:

  xla       : conv_general_dilated as-is (baseline)
  im2col_w  : width im2col — 7 shifted copies -> (H, W, 7C), then a (7,1)
              conv == 7-row accumulated matmuls with K=7C
  im2col_hw : full im2col via conv_general_dilated_patches -> (HW, 49C)
              @ (49C, Co), row-chunked to bound the patch tensor
  f32       : baseline in f32 (rules out bf16-layout pathology)

Run: python scripts/microbench_spynet.py [--size 1088x1920] [--batch 2]
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

LAYERS = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]


def timeit(name, fn, *args, iters=8, warmup=2):
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


def conv_xla(x, k, b):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return out + b


def conv_im2col_w(x, k, b):
    """Width im2col: x (N,H,W,C) -> (N,H,W,7C) then (7,1) conv."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (3, 3), (0, 0)])
    cols = jnp.concatenate([xp[:, :, i:i + w] for i in range(7)], axis=-1)
    # kernel (7,7,C,Co) -> (7,1,7C,Co): row tap dy reads col-tap block dx
    k2 = k.transpose(0, 1, 2, 3).reshape(7, 7 * c, k.shape[-1])[:, None]
    out = jax.lax.conv_general_dilated(
        cols, k2.reshape(7, 1, 7 * c, k.shape[-1]), (1, 1),
        ((3, 3), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return out + b


def conv_im2col_hw(x, k, b, rows_per=128):
    """Full im2col row-chunked: (rows*W, 49C) @ (49C, Co)."""
    n, h, w, c = x.shape
    co = k.shape[-1]
    kmat = k.reshape(49 * c, co)  # (dy, dx, ci) flat
    xp = jnp.pad(x, [(0, 0), (3, 3), (3, 3), (0, 0)])
    nch = -(-h // rows_per)
    hpad = nch * rows_per - h
    if hpad:
        xp = jnp.pad(xp, [(0, 0), (0, hpad), (0, 0), (0, 0)])

    def chunk(i):
        seg = jax.lax.dynamic_slice_in_dim(xp, i * rows_per, rows_per + 6, 1)
        # (N, rp+6, W+6, C) -> patches (N, rp, W, 49C)
        pats = jnp.concatenate(
            [seg[:, dy:dy + rows_per, dx:dx + w]
             for dy in range(7) for dx in range(7)], axis=-1)
        y = jnp.einsum("nhwk,kc->nhwc", pats.reshape(n, rows_per, w, 49 * c),
                       kmat, preferred_element_type=x.dtype)
        return y

    outs = jax.lax.map(chunk, jnp.arange(nch))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(n, nch * rows_per, w, co)
    return out[:, :h] + b


def basic_module(x, params, conv):
    for i, (ci, co) in enumerate(LAYERS):
        x = conv(x, *params[i])
        if i < 4:
            x = jax.nn.relu(x)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1088x1920")
    p.add_argument("--batch", type=int, default=2)
    a = p.parse_args()
    h, w = (int(v) for v in a.size.split("x"))
    n = a.batch

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.uniform(key, (n, h, w, 8), dt)
    params = []
    for ci, co in LAYERS:
        k = jax.random.normal(key, (7, 7, ci, co), dt) * 0.05
        b = jax.random.normal(key, (co,), dt) * 0.01
        params.append((k, b))

    flops = 2 * n * h * w * 49 * sum(ci * co for ci, co in LAYERS)
    print(f"basic module @ {n}x{h}x{w}: {flops/1e9:.1f} GFLOP "
          f"(floor ~{flops/197e12*1e3:.2f} ms bf16 v5e)")

    # parity check (small shapes, f32)
    xs = jax.random.uniform(key, (1, 64, 96, 8), jnp.float32)
    ps = [(jnp.asarray(k, jnp.float32), jnp.asarray(b, jnp.float32))
          for k, b in params]
    want = basic_module(xs, ps, conv_xla)
    for name, conv in (("im2col_w", conv_im2col_w),
                       ("im2col_hw", conv_im2col_hw)):
        got = basic_module(xs, ps, conv)
        err = float(jnp.max(jnp.abs(got - want)))
        assert err < 1e-3, (name, err)
    print("parity ok")

    for name, conv in (("xla", conv_xla), ("im2col_w", conv_im2col_w),
                       ("im2col_hw", conv_im2col_hw)):
        fn = jax.jit(lambda x, p, conv=conv: jnp.sum(
            basic_module(x, p, conv).astype(jnp.float32)))
        timeit(f"basic module [{name}]", fn, x, params)

    # per-layer breakdown for the baseline
    for i, (ci, co) in enumerate(LAYERS):
        xi = jax.random.uniform(key, (n, h, w, ci), dt)
        for name, conv in (("xla", conv_xla), ("im2col_w", conv_im2col_w)):
            fn = jax.jit(lambda x, k, b, conv=conv: jnp.sum(
                conv(x, k, b).astype(jnp.float32)))
            timeit(f"  layer{i} {ci}->{co} [{name}]", fn, xi, *params[i])

    # f32 baseline
    xf = x.astype(jnp.float32)
    pf = [(k.astype(jnp.float32), b.astype(jnp.float32)) for k, b in params]
    fn = jax.jit(lambda x, p: jnp.sum(
        basic_module(x, p, conv_xla).astype(jnp.float32)))
    timeit("basic module [xla f32]", fn, xf, pf)


if __name__ == "__main__":
    main()
