#!/usr/bin/env python
"""Microbench: small-channel resize formulations on the real chip.

The candidates for ops/resize.py's hot path (C in {1,2,3}, large spatial):
  A. current: per-axis tap gathers on NHWC (take along H, then take along W)
  B. per-channel squeeze: (N,H,W) takes per channel, stack at the end
  C. per-channel dense matmul: Rh @ x @ Rw per channel (MXU)
  D. H-matmul on (N,H,W*C) + swap H/W transpose + matmul + swap back
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from refvsr_tpu.ops.resize import _axis_tables, resize


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
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:44s} {dt:9.2f} ms", flush=True)


def dense_matrix(in_size, out_size, mode, align_corners, coord_scale, dtype):
    idx, w = _axis_tables(in_size, out_size, mode, align_corners,
                          coord_scale)[:2]
    m = np.zeros((out_size, in_size), np.float32)
    for k in range(idx.shape[1]):
        np.add.at(m, (np.arange(out_size), idx[:, k]), w[:, k])
    return jnp.asarray(m, dtype)


def main():
    h, w, c = 1088, 1920, 3
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.bfloat16,):
        x = jax.random.uniform(key, (1, h, w, c), dtype)
        oh, ow = 2 * h, 2 * w
        mh = dense_matrix(h, oh, "bicubic", False, 0.5, dtype)
        mw = dense_matrix(w, ow, "bicubic", False, 0.5, dtype)

        @jax.jit
        def cur(x):
            return jnp.sum(resize(x, scale_factor=2, mode="bicubic",
                                  align_corners=False).astype(jnp.float32))
        timeit(f"A current NHWC taps {dtype.__name__} C={c}", cur, x)

        @jax.jit
        def perchan(x):
            outs = []
            for ci in range(c):
                y = resize(x[..., ci][..., None, :], scale_factor=2,
                           mode="bicubic", align_corners=False)
                # (N,H,1,W)->spatial axes are (-3,-2)=(1,2)... wrong axes;
                # instead treat (N,H,W) with a dummy trailing axis of W:
                outs.append(y)
            return jnp.sum(jnp.stack(outs, -1).astype(jnp.float32))
        # skip B variant: resize() assumes trailing C; C form below covers it

        @jax.jit
        def matmul_pc(x):
            outs = []
            for ci in range(c):
                y = x[..., ci]                       # (N,H,W)
                y = jnp.einsum("oh,nhw->now", mh, y,
                               preferred_element_type=jnp.float32)
                y = y.astype(x.dtype)
                y = jnp.einsum("nhw,wo->nho", y, mw.T,
                               preferred_element_type=jnp.float32)
                outs.append(y.astype(x.dtype))
            return jnp.sum(jnp.stack(outs, -1).astype(jnp.float32))
        timeit(f"C per-channel matmul {dtype.__name__} C={c}", matmul_pc, x)

        @jax.jit
        def matmul_fused(x):
            n = x.shape[0]
            y = x.reshape(n, h, w * c)
            y = jnp.einsum("oh,nhd->nod", mh, y,
                           preferred_element_type=jnp.float32).astype(x.dtype)
            y = y.reshape(n, oh, w, c).transpose(0, 2, 1, 3)   # (N,W,OH,C)
            y = y.reshape(n, w, oh * c)
            y = jnp.einsum("ow,nwd->nod", mw, y,
                           preferred_element_type=jnp.float32).astype(x.dtype)
            y = y.reshape(n, ow, oh, c).transpose(0, 2, 1, 3)
            return jnp.sum(y.astype(jnp.float32))
        timeit(f"D H-matmul+swap {dtype.__name__} C={c}", matmul_fused, x)

        # C=1 variants (conf maps)
        x1 = jax.random.uniform(key, (1, h, w, 1), dtype)

        @jax.jit
        def cur1(x):
            return jnp.sum(resize(x, scale_factor=2, mode="bicubic",
                                  align_corners=False).astype(jnp.float32))
        timeit(f"A current NHWC taps {dtype.__name__} C=1", cur1, x1)

        @jax.jit
        def mat1(x):
            y = x[..., 0]
            y = jnp.einsum("oh,nhw->now", mh, y,
                           preferred_element_type=jnp.float32).astype(x.dtype)
            y = jnp.einsum("nhw,wo->nho", y, mw.T,
                           preferred_element_type=jnp.float32).astype(x.dtype)
            return jnp.sum(y.astype(jnp.float32))
        timeit(f"C squeeze matmul {dtype.__name__} C=1", mat1, x1)

        # mid-channel control: is the matmul path also competitive at C=48?
        x48 = jax.random.uniform(key, (1, h // 2, w // 2, 48), dtype)

        @jax.jit
        def cur48(x):
            return jnp.sum(resize(x, scale_factor=2, mode="bicubic",
                                  align_corners=False).astype(jnp.float32))
        timeit(f"A current NHWC taps {dtype.__name__} C=48 (half)", cur48, x48)


if __name__ == "__main__":
    main()
