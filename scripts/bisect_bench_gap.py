#!/usr/bin/env python
"""Bisect the 5x gap between bench.py (0.086 fps = 11.7 s/step) and
profile_stream.py's FULL stream step (2.1 s) — same graph, same shapes.

Variants of the jitted step, timed identically (chained scalar + one final
device->host sync):
  scalar   : return (sum(out), new_state)            [profiler formulation]
  out      : return (out, new_state, acc)            [bench formulation]
  out_nacc : return (out, new_state)                 [no carried acc donate]
  scalar8  : scalar variant, iters=8                 [iteration-count effect]

Run: python scripts/bisect_bench_gap.py [--size 1080x1920]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1080x1920")
    a = p.parse_args()
    h, w = (int(v) for v in a.size.split("x"))

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
    from refvsr_tpu.utils.precision import cast_floating

    dtype = jnp.bfloat16
    mid, blocks, t = 48, 30, 7
    net = RefVSRNet(scale=4, num_blocks=blocks, mid_channels=mid,
                    matching_ksize=8, flag_HD_in=True)
    key = jax.random.PRNGKey(0)
    si = 64
    lrs_i = jax.random.uniform(key, (1, t, si, si * 2, 3), jnp.float32)
    params = net.init(key, lrs_i, lrs_i,
                      init_stream_state(1, si, si * 2, mid, num_frames=t))
    params = cast_floating(params, dtype)

    lrs = jax.random.uniform(key, (1, t, h, w, 3), dtype)
    refs = jax.random.uniform(key, (1, t, h, w, 3), dtype)

    def fresh_state():
        tt = t - t // 2
        s = init_stream_state(1, h, w, mid, dtype, num_frames=t)
        return s.replace(
            conf_tail=jnp.zeros((1, tt, h, w, 1), dtype),
            index_tail=jnp.zeros((1, tt, (h // 4) * (w // 4)), jnp.int32),
            aligned_tail=jnp.zeros((1, tt, h, w, mid), dtype),
            aligned_up_tail=jnp.zeros((1, tt, 2 * h, 2 * w, mid), dtype),
            tail_base=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step_scalar(params, lrs, refs, state):
        out, ns, _ = net.apply(params, lrs, refs, state,
                               method=RefVSRNet.forward_stream)
        return jnp.sum(out.astype(jnp.float32)), ns

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def step_out(params, lrs, refs, state, acc):
        out, ns, _ = net.apply(params, lrs, refs, state,
                               method=RefVSRNet.forward_stream)
        return out, ns, acc + jnp.mean(out.astype(jnp.float32))

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step_out_nacc(params, lrs, refs, state):
        out, ns, _ = net.apply(params, lrs, refs, state,
                               method=RefVSRNet.forward_stream)
        return out, ns

    def run(name, kind, iters):
        state = fresh_state()
        acc = jnp.zeros((), jnp.float32)
        host = jnp.zeros((), jnp.float32)
        # warmup (compile) — 1 step
        if kind == "scalar":
            s, state = step_scalar(params, lrs, refs, state)
            host = host + s
        elif kind == "out":
            out, state, acc = step_out(params, lrs, refs, state, acc)
            host = host + acc
        else:
            out, state = step_out_nacc(params, lrs, refs, state)
            host = host + jnp.mean(out.astype(jnp.float32))
        assert np.isfinite(float(host))
        host = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            if kind == "scalar":
                s, state = step_scalar(params, lrs, refs, state)
                host = host + s
            elif kind == "out":
                out, state, acc = step_out(params, lrs, refs, state, acc)
                host = host + acc
            else:
                out, state = step_out_nacc(params, lrs, refs, state)
                host = host + jnp.mean(out.astype(jnp.float32))
        assert np.isfinite(float(host))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt*1000:10.1f} ms/step  ({1.0/dt:.4f} fps)")

    run("scalar iters=3", "scalar", 3)
    run("out+acc iters=3", "out", 3)
    run("out-noacc iters=3", "out_nacc", 3)
    run("scalar iters=8", "scalar", 8)
    run("out+acc iters=8", "out", 8)


if __name__ == "__main__":
    main()
