#!/usr/bin/env python
"""Pallas im2col conv experiment (r5): can a VMEM-resident 3x3 conv beat
XLA's ~12%-MXU space-to-batch lowering at the model's C=48 shapes?

Formulation: grid over row-stripes; the kernel DMAs its (R+2)-row halo
window from HBM (manual double-buffered copy — overlapping windows aren't
expressible as Pallas blocks), builds the im2col patch tensor P
(R, W, 9C) via static shifts + lane concat, and contracts P @ Wm (9C, C)
on the MXU. K = 9*48 = 432 (84% of 4 K-tiles), N = 48 (37.5% lane cap)
-> ~31% MXU ceiling = ~1.4 ms/conv at 1080p vs XLA's in-chain ~3.5 ms and
isolated ~9.8 ms. The open question is the P-build cost (misaligned lane
concats are relayouts) — variant B pays 2.67x K-padding for aligned
concats instead. This benchmark decides.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 1080, 1920, 48
CP = 128          # lane-tile padded channels in HBM (DMA lane constraint)
R = 24            # rows per stripe
WP = -(-(W + 2) // 8) * 8  # sublane-padded width of the halo window


def _kernel(concat_k, x_hbm, wm_ref, b_ref, o_ref, buf, sem):
    s = pl.program_id(0)
    ns = pl.num_programs(0)

    def dma(slot, ss):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ss * R, R + 2), :, :], buf.at[slot], sem.at[slot])

    @pl.when(s == 0)
    def _():
        dma(0, 0).start()

    @pl.when(s + 1 < ns)
    def _():
        dma((s + 1) % 2, s + 1).start()

    slot = s % 2
    dma(slot, s).wait()
    xb = buf[slot]          # (R+2, WP, CP)

    if concat_k:            # variant A: K=9C misaligned lane concat
        taps = [lax.slice(xb, (dy, dx, 0), (dy + R, dx + W, C))
                for dy in range(3) for dx in range(3)]
        p = jnp.concatenate(taps, axis=-1)              # (R, W, 9C)
        y = lax.dot_general(p, wm_ref[...],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    else:                   # variant B: 9 aligned K=CP matmuls, accumulate
        y = jnp.zeros((R, W, C), jnp.float32)
        for t in range(9):
            dy, dx = t // 3, t % 3
            sl = lax.slice(xb, (dy, dx, 0), (dy + R, dx + W, CP))
            y = y + lax.dot_general(
                sl, wm_ref[pl.ds(t * CP, CP)],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype) + b_ref[...]


def pallas_conv(x, wm, bias, concat_k=True):
    """x: (H, W, C) unpadded; wm: (9*CK, C) with CK = C (A) or CP (B)."""
    nst = H // R
    xp = jnp.pad(x, [(1, 1 + 0), (1, WP - W - 1), (0, CP - C)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nst,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((wm.shape[0], C), lambda s: (0, 0)),
            pl.BlockSpec((1, 1, C), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, W, C), lambda s: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, R + 2, WP, CP), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, concat_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xp, wm, bias)


def timeit(name, fn, *args, iters=8):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(iters):
            out = fn(*args)
            acc = acc + jnp.sum(out[0, 0].astype(jnp.float32))
        float(acc)
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}")
        return float("nan")
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, C)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, 1, C)) * 0.01, jnp.bfloat16)
    wm_a = k.reshape(9 * C, C)
    wm_b = jnp.pad(k, [(0, 0), (0, 0), (0, CP - C), (0, 0)]).reshape(
        9 * CP, C)

    ref = lax.conv_general_dilated(
        x[None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + bias

    for name, wm, ck in (("A concat-K432", wm_a, True),
                         ("B aligned-9xK128", wm_b, False)):
        try:
            got = jax.jit(functools.partial(pallas_conv, concat_k=ck))(
                x, wm, bias)
            d = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            print(f"variant {name}: parity max|d| vs XLA conv = {d:.4g}")
        except Exception as e:
            print(f"variant {name}: COMPILE/RUN FAILED: "
                  f"{str(e).splitlines()[0][:140]}")
            continue
        timeit(f"pallas conv {name}",
               jax.jit(functools.partial(pallas_conv, concat_k=ck)),
               x, wm, bias)

    @jax.jit
    def xla_conv(x, k, bias):
        return lax.conv_general_dilated(
            x[None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + bias
    timeit("XLA conv 48ch 1080p (isolated)", xla_conv, x, k, bias)


if __name__ == "__main__":
    main()
