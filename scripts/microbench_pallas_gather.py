#!/usr/bin/env python
"""Microbench: can Pallas beat XLA's ~16 ns/row gather wall from VMEM?

The bilinear warps (ops/warp.py) are row-count bound: XLA's take_along_axis
costs ~16-20 ns per gathered row from HBM regardless of row width or index
locality (docs/ROUND1_NOTES.md). A banded warp kernel would DMA a source row
band into VMEM and resolve the per-pixel corner fetches there — IF Mosaic can
express an in-VMEM gather meaningfully faster than ~16 ns/row, the UP warp
(8.3M rows at 1080p-HD-in) drops from ~150 ms toward its ~10 ms traffic floor.

Candidates, all gathering P rows from a VMEM-resident (R, L) bf16 table:
  xla_small      XLA take_along_axis on the same small table (locality probe:
                 if a cache-resident table is still 16 ns/row, the wall is
                 issue rate, not HBM latency)
  pl_take        jnp.take(table, idx, axis=0) inside a kernel (does Mosaic
                 have a vectorized gather lowering at all?)
  pl_scalar      fori_loop of one dynamic-slice row copy per step (the
                 guaranteed-to-lower floor: measures loop+dyn-addr issue rate)
  pl_scalar8     8x unrolled variant of pl_scalar
  pl_onehot      onehot(idx) @ table on the MXU (exact; FLOPs = P*R*L, only
                 viable for small R bands, but the MXU is otherwise idle
                 during a warp)

Run: python scripts/microbench_pallas_gather.py [--check] [--sizes ...]
--check runs tiny shapes in interpret mode (works on CPU, validates parity).
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


def timeit(name, fn, *args, iters=6, warmup=2, rows=None):
    try:
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
        extra = f"  {dt/rows*1e9:7.2f} ns/row" if rows else ""
        print(f"{name:24s} {dt*1000:9.3f} ms{extra}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


# ---------------------------------------------------------------- kernels

def _take_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)


def _scalar_kernel(unroll, idx_ref, tab_ref, out_ref):
    p = out_ref.shape[0]

    def body(i, _):
        for u in range(unroll):
            j = i * unroll + u
            out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(idx_ref[j, 0], 1), :]
        return 0

    jax.lax.fori_loop(0, p // unroll, body, 0)


def _onehot_kernel(idx_ref, tab_ref, out_ref):
    r = tab_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (out_ref.shape[0], r), 1)
    oh = (ids == idx_ref[:, :1]).astype(tab_ref.dtype)
    out_ref[:] = jax.lax.dot(oh, tab_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(out_ref.dtype)


def make_pallas_gather(kind: str, p_chunk: int, r: int, l: int,
                       interpret: bool = False):
    """Returns fn(table (R, L) bf16, idx (P, 1) int32) -> (P, L) bf16.
    Grid over P chunks; the table rides along as a whole-block input."""
    if kind == "take":
        kern = _take_kernel
    elif kind == "scalar":
        kern = functools.partial(_scalar_kernel, 1)
    elif kind == "scalar8":
        kern = functools.partial(_scalar_kernel, 8)
    elif kind == "onehot":
        kern = _onehot_kernel
    else:
        raise ValueError(kind)

    # idx lives in SMEM for the scalar kernels (per-row scalar reads), VMEM
    # for the vectorized ones
    idx_space = pltpu.SMEM if kind in ("scalar", "scalar8") else pltpu.VMEM

    def run(tab, idx):
        p = idx.shape[0]
        return pl.pallas_call(
            kern,
            grid=(p // p_chunk,),
            in_specs=[
                pl.BlockSpec((p_chunk, 1), lambda i: (i, 0),
                             memory_space=idx_space),
                pl.BlockSpec((r, l), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((p_chunk, l), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p, l), tab.dtype),
            interpret=interpret,
        )(idx, tab)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode parity check (CPU-safe)")
    ap.add_argument("--rows", type=int, default=2048,
                    help="table rows R (band size)")
    ap.add_argument("--lanes", type=int, default=128)
    ap.add_argument("--points", type=int, default=1 << 20)
    ap.add_argument("--chunk", type=int, default=2048)
    a = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if a.check:
        jax.config.update("jax_platforms", "cpu")
        r, l, p, chunk = 64, 128, 256, 64
        key = jax.random.PRNGKey(0)
        tab = jax.random.uniform(key, (r, l), jnp.float32)
        idx = jax.random.randint(key, (p, 1), 0, r, jnp.int32)
        want = np.asarray(tab)[np.asarray(idx)[:, 0]]
        for kind in ("take", "scalar", "scalar8", "onehot"):
            try:
                got = make_pallas_gather(kind, chunk, r, l, interpret=True)(
                    tab, idx)
                np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
                print(f"{kind:10s} parity ok")
            except Exception as e:
                print(f"{kind:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return

    r, l, p, chunk = a.rows, a.lanes, a.points, a.chunk
    key = jax.random.PRNGKey(0)
    tab = jax.random.uniform(key, (r, l), jnp.bfloat16)
    idx = jax.random.randint(key, (p, 1), 0, r, jnp.int32)

    def xla_small(tab, idx):
        g = jnp.take_along_axis(tab[None], idx[None], axis=1, mode="clip")
        return jnp.sum(g.astype(jnp.float32))

    timeit("xla_small", jax.jit(xla_small), tab, idx, rows=p)

    for kind in ("take", "scalar", "scalar8", "onehot"):
        if kind == "onehot" and r > 4096:
            continue
        fn = make_pallas_gather(kind, chunk, r, l)
        timeit(f"pl_{kind}", jax.jit(lambda t, i, f=fn: jnp.sum(
            f(t, i).astype(jnp.float32))), tab, idx, rows=p)


if __name__ == "__main__":
    main()
