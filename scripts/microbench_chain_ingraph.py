#!/usr/bin/env python
"""Minimal repro of the fused conv-chain in-graph regression.

Isolated, the Mosaic chain kernel beats XLA at every shape (e.g. ResList(4)
@1088x1920xC48: 30 ms vs 47 ms). Inside the rap() graph it LOSES ~65 ms.
Bisect: time the chain (a) alone, (b) with one producing conv in the same
jit, (c) with one consuming conv, (d) with both, (e) rap-level2-shaped
subgraph — fused vs XLA for each.

Run: python scripts/microbench_chain_ingraph.py [--size 1088x1920]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import refvsr_tpu.ops.pallas.conv_chain as cc
from refvsr_tpu.models.blocks import Conv2d, ResList, lrelu


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
    print(f"{name:40s} {dt:9.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1088x1920")
    p.add_argument("--mid", type=int, default=48)
    p.add_argument("--blocks", type=int, default=4)
    a = p.parse_args()
    h, w = (int(v) for v in a.size.split("x"))
    mid = a.mid
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    img = lambda *s: jax.random.uniform(key, s, dt)

    chain = ResList(a.blocks, mid)
    params = chain.init(jax.random.PRNGKey(1), img(1, 32, 64, mid))
    pre = Conv2d(mid, 3, name="pre")
    pre_p = pre.init(jax.random.PRNGKey(2), img(1, 32, 64, mid))
    post = Conv2d(mid, 3, name="post")
    post_p = post.init(jax.random.PRNGKey(3), img(1, 32, 64, mid))

    x = img(1, h, w, mid)

    def run_all(tag):
        @jax.jit
        def alone(params, x):
            return jnp.sum(chain.apply(params, x).astype(jnp.float32))

        @jax.jit
        def with_pre(params, pp, x):
            y = lrelu(pre.apply(pp, x), 0.1)
            return jnp.sum(chain.apply(params, y).astype(jnp.float32))

        @jax.jit
        def with_post(params, pp, x):
            y = chain.apply(params, x)
            return jnp.sum(post.apply(pp, y).astype(jnp.float32))

        @jax.jit
        def with_both(params, pp, qp, x):
            y = lrelu(pre.apply(pp, x), 0.1)
            y = chain.apply(params, y)
            return jnp.sum(post.apply(qp, y).astype(jnp.float32))

        @jax.jit
        def raplike(params, pp, qp, x, aligned, alpha):
            # rap level-2 shape: residual-gated input, chain, keep both
            y = lrelu(pre.apply(pp, jnp.concatenate([x, aligned], -1)), 0.1)
            y = x + alpha * y
            y = chain.apply(params, y)
            return (jnp.sum(y.astype(jnp.float32))
                    + jnp.sum(post.apply(qp, y).astype(jnp.float32)))

        t0 = timeit(f"[{tag}] chain alone", alone, params, x)
        timeit(f"[{tag}] pre-conv + chain", with_pre, params, pre_p, x)
        timeit(f"[{tag}] chain + post-conv", with_post, params, post_p, x)
        timeit(f"[{tag}] pre + chain + post", with_both, params, pre_p,
               post_p, x)
        pre2_p = Conv2d(mid, 3, name="pre").init(
            jax.random.PRNGKey(4), img(1, 32, 64, 2 * mid))
        timeit(f"[{tag}] rap-like subgraph", raplike, params, pre2_p, post_p,
               x, img(1, h, w, mid), img(1, h, w, 1))
        return t0

    assert cc.use_fused_chain(x, 2 * a.blocks + 1), "fused gate closed"
    run_all("fused")
    cc.FUSED_CHAINS = False
    jax.clear_caches()
    run_all("xla")


if __name__ == "__main__":
    main()
