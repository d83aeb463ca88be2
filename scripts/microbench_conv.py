#!/usr/bin/env python
"""Microbench: 3x3 conv formulations at the resblock shape (544,960,C).

Questions: how far is the C=48 conv from its floor; does lane padding or
fusion explain the gap; is an im2col matmul or width-packed conv faster.
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


def timeit(name, fn, *args, iters=10, warmup=3):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        acc = acc + fn(*args)
    float(acc)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = acc + fn(*args)
    assert float(acc) == float(acc)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1000:9.2f} ms",
          flush=True)


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def main():
    h, w = 544, 960
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    for c in (48, 64, 128):
        x = jax.random.uniform(key, (1, h, w, c), dt)
        k = jax.random.uniform(key, (3, 3, c, c), dt, -0.1, 0.1)

        @jax.jit
        def single(x, k):
            return jnp.sum(conv(x, k).astype(jnp.float32))
        timeit(f"single conv3x3 C={c}", single, x, k)

        @jax.jit
        def resblock(x, k):
            y = jnp.maximum(conv(x, k), 0.0)
            y = conv(y, k)
            return jnp.sum((x + y).astype(jnp.float32))
        timeit(f"resblock (2 convs+relu+add) C={c}", resblock, x, k)

        @jax.jit
        def chain10(x, k):
            def step(xx, _):
                y = jnp.maximum(conv(xx, k), 0.0)
                return xx + conv(y, k), None
            out, _ = lax.scan(step, x, None, length=10)
            return jnp.sum(out.astype(jnp.float32))
        timeit(f"10 resblocks (scan) C={c}", chain10, x, k, iters=4)

    # width-packed variant: (H, W, 48) -> (H, W/2, 96), sparse 3x3 kernel
    c = 48
    x = jax.random.uniform(key, (1, h, w, c), dt)
    k = jax.random.uniform(key, (3, 3, c, c), dt, -0.1, 0.1)
    import numpy as np
    kp = np.zeros((3, 3, 2 * c, 2 * c), np.float32)
    kk = np.asarray(k, np.float32)
    # out[h, w2, p*c+o] = sum_{dy,dx,i} k[dy,dx,i,o] x[h+dy, 2w2+p+dx, i]
    # packed tap (dxp, q) covers original dx = 2*dxp + q - p ... build by phase
    for p in (0, 1):          # output phase
        for dx in (-1, 0, 1):  # original dx
            col = p + dx       # column within/next block: -1..2
            dxp = (col + 2) // 2 - 1   # packed dx: -1, 0, or 1
            q = (col + 2) % 2          # source phase
            kp[:, dxp + 1, q * c:(q + 1) * c, p * c:(p + 1) * c] += \
                kk[:, dx + 1]
    kp = jnp.asarray(kp, dt)

    @jax.jit
    def packed(x, kp):
        xx = x.reshape(1, h, w // 2, 2 * c)
        return jnp.sum(conv(xx, kp).astype(jnp.float32))
    timeit("width-packed conv3x3 (96ch, w/2)", packed, x, kp)

    @jax.jit
    def im2col(x, k):
        patches = lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        km = k.transpose(2, 0, 1, 3).reshape(9 * c, c)  # patches are C-major
        out = jnp.einsum("nhwk,ko->nhwo", patches, km,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out)
    timeit("im2col matmul conv3x3 C=48", im2col, x, k)


if __name__ == "__main__":
    main()
