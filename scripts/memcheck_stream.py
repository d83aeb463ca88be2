#!/usr/bin/env python
"""Compile-only HBM accounting of the flagship stream-step graph.

The bench graph (bench.py bench_stream's jitted `step`, donated state) is
.lower().compile()'d on the attached TPU WITHOUT executing, and the
executable's memory_analysis is printed — temps, args, output, aliasing —
so runtime RESOURCE_EXHAUSTED reports can be bisected to a formulation
without burning an execution slot.

Usage:
  python scripts/memcheck_stream.py --size 1080x1920 [--lanes L]
      [--no-banded-warp]
--no-banded-warp disables the banded warp's lax.cond dual-branch graph
(warp._BANDED_MIN_PIXELS) to attribute memory to it. (A --no-banded-affine
knob existed while the banded affine formulation did; that path was deleted
in r4 as a measured loser — see models/matching.py note.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1080x1920")
    p.add_argument("--lanes", type=int, default=0)
    p.add_argument("--blocks", type=int, default=30)
    p.add_argument("--mid", type=int, default=48)
    p.add_argument("--no-banded-warp", action="store_true")
    a = p.parse_args()
    h, w = (int(v) for v in a.size.split("x"))

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from refvsr_tpu.ops import warp as warp_mod
    if a.no_banded_warp:
        warp_mod._BANDED_MIN_PIXELS = 1 << 62

    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state

    dtype = jnp.bfloat16
    t, lanes, mid = 7, a.lanes, a.mid
    net = RefVSRNet(scale=4, num_blocks=a.blocks, mid_channels=mid,
                    matching_ksize=8, flag_HD_in=True, pipeline_lanes=lanes)

    n = 1
    lrs = jax.ShapeDtypeStruct((n, t, h, w, 3), dtype)
    state = init_stream_state(n, h, w, mid, dtype, num_frames=t)
    tt = (t - t // 2) + max(0, lanes - 1)
    state = state.replace(
        conf_tail=jnp.zeros((n, tt, h, w, 1), dtype),
        index_tail=jnp.zeros((n, tt, (h // 4) * (w // 4)), jnp.int32),
        aligned_tail=jnp.zeros((n, tt, h, w, mid), dtype),
        aligned_up_tail=jnp.zeros((n, tt, 2 * h, 2 * w, mid), dtype),
        tail_base=jnp.zeros((), jnp.int32))
    if lanes > 1:
        ext = lanes - 1
        state = state.replace(
            pipe_feat=jnp.zeros((ext * n, h, w, mid), dtype),
            pipe_feat_up=jnp.zeros((ext * n, 2 * h, 2 * w, mid), dtype),
            pipe_conf=jnp.zeros((ext * n, h, w, 1), dtype))
    state_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)

    si = 64
    key = jax.random.PRNGKey(0)
    lrs_i = jax.ShapeDtypeStruct((n, t, si, si * 2, 3), jnp.float32)
    params_sds = jax.eval_shape(
        net.init, key, lrs_i, lrs_i,
        init_stream_state(n, si, si * 2, mid, num_frames=t))
    params_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape,
            dtype if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype),
        params_sds)

    fwd = (RefVSRNet.forward_stream_pipelined if lanes > 1
           else RefVSRNet.forward_stream)

    import functools

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def step(params, lrs, refs, st, acc):
        out, new_state, _ = net.apply(params, lrs, refs, st, method=fwd)
        return out, new_state, acc + jnp.mean(out.astype(jnp.float32))

    acc = jax.ShapeDtypeStruct((), jnp.float32)
    print(f"# lowering+compiling {h}x{w} lanes={lanes} "
          f"banded_warp={not a.no_banded_warp} ...", flush=True)
    compiled = step.lower(params_sds, lrs, lrs, state_sds, acc).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        print("memory_analysis unavailable")
        return
    gb = 1 / 2 ** 30
    print(f"temp      {mem.temp_size_in_bytes * gb:8.2f} GB")
    print(f"arguments {mem.argument_size_in_bytes * gb:8.2f} GB")
    print(f"output    {mem.output_size_in_bytes * gb:8.2f} GB")
    print(f"alias     {mem.alias_size_in_bytes * gb:8.2f} GB")
    print(f"generated {mem.generated_code_size_in_bytes * gb:8.2f} GB")
    total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes - mem.alias_size_in_bytes)
    print(f"TOTAL (temp+args+out-alias) {total * gb:8.2f} GB "
          f"(v5e HBM 15.75 GB)")


if __name__ == "__main__":
    main()
