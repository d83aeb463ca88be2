"""Chip A/B: Pallas VMEM-select banded warp (ops/pallas/warp_select.py) vs
the XLA banded warp and the quad canvas, at the two streaming warp shapes.

Context (chip session r4): the XLA banded warp's select loop is HBM-bound
at ~5.8 ms/pass x 48 passes + ~85 ms gather intercept = 361.7 ms at the
UP-warp shape; XLA layout tricks (transposed select layout, separable
weights) were a null result because XLA normalizes layouts. The Pallas
kernel keeps band + accumulator in VMEM (24 passes, per-column anchors)
and double-buffers the band DMA off scalar-prefetched anchors.

Usage: python scripts/microbench_pallas_warp.py [--quick]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from refvsr_tpu.ops.warp import _bilinear_sample_quad  # noqa: E402
from refvsr_tpu.ops.warp_banded import banded_sample  # noqa: E402
from refvsr_tpu.ops.pallas.warp_select import (  # noqa: E402
    pallas_banded_ok, pallas_banded_sample)

SHAPES = [
    ("UP 2160x3840x48", 1, 2160, 3840, 48),
    ("feat 1080x1920x49", 1, 1080, 1920, 49),
]


def timeit(name, fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:48s} {dt:9.1f} ms")
    return dt


def bench(quick=False):
    for name, n, h, w, c in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        # smooth flow inside the select budget (same generator family as
        # scripts/microbench_banded_warp.py)
        fy = 2.1 + 0.8 * np.sin(gy / 300.0) + rng.normal(0, .02, (n, h, w))
        fx = -1.4 + 1.5 * np.cos(gx / 500.0) + rng.normal(0, .02, (n, h, w))
        sy = jnp.asarray(gy[None] + fy, jnp.float32)
        sx = jnp.asarray(gx[None] + fx, jnp.float32)

        okp = jax.jit(lambda sy, sx, s=(n, h, w, c): pallas_banded_ok(
            s, sy, sx))(sy, sx)
        print(f"== {name}  pallas_banded_ok={bool(okp)}")

        fnp = jax.jit(lambda x, sy, sx: jnp.sum(
            pallas_banded_sample(x, sy, sx).astype(jnp.float32)))
        timeit("pallas VMEM-select", fnp, x, sy, sx)

        fnok = jax.jit(lambda x, sy, sx, s=(n, h, w, c): pallas_banded_ok(
            s, sy, sx))
        timeit("pallas plan (ok only)", fnok, x, sy, sx)

        if not quick:
            fnb = jax.jit(lambda x, sy, sx: jnp.sum(
                banded_sample(x, sy, sx)[0].astype(jnp.float32)))
            timeit("XLA banded th=16 xb=8", fnb, x, sy, sx)
            fnq = jax.jit(lambda x, sy, sx: jnp.sum(
                _bilinear_sample_quad(x, sx, sy, "zeros")
                .astype(jnp.float32)))
            timeit("quad canvas", fnq, x, sy, sx)

        # parity spot check on chip. NOT bit-exact vs the XLA banded path:
        # Mosaic's fused multiply-adds (and the terminal's
        # --xla_allow_excess_precision) round the bf16 accumulation chain
        # differently than XLA's op-by-op graph — chip session r5 measured
        # a global <=2-ulp spread (max |d| 0.031 on N(0,1) data, sample
        # pairs 1 ulp apart). Both are valid bf16 roundings of identical
        # f32 corner weights, so the contract is <=2 bf16 ulp relative.
        outp = jax.jit(functools.partial(pallas_banded_sample))(x, sy, sx)
        outb, okb = jax.jit(functools.partial(banded_sample))(x, sy, sx)
        a = np.asarray(outp, np.float32)
        b = np.asarray(outb, np.float32)
        # envelope: a bilinear output is a <=1-weighted sum of 4 corners, so
        # rounding-path divergence is bounded by ~2 ulp of the CORNER
        # magnitudes, not of the (possibly cancelled-to-zero) result —
        # atol = 4*eps*max|x|. Cancellation points make pure-rtol checks
        # meaningless (chip r5: max ulp-of-result ratio 936 while max|d|
        # stayed at 2 ulp of max|x|).
        atol = float(4 * 2 ** -8 * np.abs(np.asarray(x, np.float32)).max())
        close = bool(np.allclose(a, b, rtol=4 * 2 ** -8, atol=atol))
        print(f"   chip parity pallas~=banded (<=2 bf16 ulp): {close} "
              f"(max|d|={np.abs(a - b).max():.4g}, banded ok={bool(okb)})")


if __name__ == "__main__":
    bench(quick="--quick" in sys.argv)
