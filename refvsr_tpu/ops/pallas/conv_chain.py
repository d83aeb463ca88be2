"""Fused residual conv-chain Mosaic kernel (NHWC, 3x3, uniform C).

XLA runs the 48-channel 3x3 conv chains of this model at ~8% MXU (round-1/2
profiles: 5.6 ms/conv at 1080p vs a 0.44 ms floor) — the K=N=48 dots its conv
lowering emits waste (128-48)/128 of both MXU operand dimensions, and every
conv round-trips HBM. This kernel keeps a GROUP of convs VMEM-resident and
reformulates each 3x3 conv as a **packed column-fold**:

  * activations live width-PACKED: lanes hold 2 adjacent pixels' channels
    (2C = 96 lanes for C=48). Halves the 128-lane padding waste of VMEM
    C-minor buffers AND doubles the dot's N dim (48 -> 96 of 128 lanes);
  * per row-chunk, the three packed COLUMN taps (j-1, j, j+1) are copied
    into a K-matrix at lane offsets 0 / 128 / 256 — every store is
    128-lane-ALIGNED (an im2col at C=48 lane offsets t*48 spends more VPU
    time on lane rotations than the MXU spends on the dot — measured 92 ms
    vs XLA's 56 ms for 10 convs at 1080p; this design: no rotations);
  * the three ROW taps are three accumulated dots over free leading-dim
    slices of that K-matrix: (rc*W/2, 384) @ (384, 2C) in f32.
    Real-MAC MXU ceiling: per dy-dot each of the 2C output lanes uses
    3 column taps x C of the 384-lane K capacity -> (144/384)*(96/128)
    = 28% at C=48, ~3.5x XLA's measured 8%;
  * weights are zero-structured (3, 3*128, 2C) matrices built host-side
    from the plain (3,3,C,C) HWIO kernel — bit-identical math, the zeros
    just ride along in the systolic array;
  * 2-D grid over (H strips x W tiles); three ping-pong/residual buffers
    + the K scratch stay under ~96 MB of the 128 MB VMEM;
  * 'same' zero-padding semantics are reproduced EXACTLY by re-zeroing
    everything outside the image after every biased conv (the
    models/refvsr._tail_tiled masking scheme); a lane-half iota
    distinguishes the even/odd pixel of each packed column;
  * guard convention: buffer row 0 / rows+1 and the columns flanking the
    strip data are zero guards. Guard-induced corruption propagates one
    row / one PACKED column per conv and stays inside the discarded halo:
    H halo = n_convs rows, W halo hw_p >= n_convs+1 packed columns.

Numerics vs the XLA path: dots accumulate f32 (as the MXU does for XLA convs)
and activations/residual adds round through the input dtype per conv; the
residual add itself is computed in f32 instead of bf16 — tolerance-level
equivalent (golden tests compare with atol).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OFF by default: the kernel wins ISOLATED (1.65-1.71x vs XLA at 1080p, see
# docs/ROUND2_NOTES.md) but loses IN-GRAPH — XLA's layout assignment makes
# in-context conv chains ~35% faster than the isolated baseline, the pallas
# region boundary costs ~16 ms in layout copies (measured: pre+chain+post
# 57.2 ms fused vs 43.8 ms XLA), and the optimization_barrier + opaque
# pallas regions block rematerialization in the full stream graph (HBM
# program footprint 18.9 GB > 15.75 GB -> compile OOM at 1080p-HD-in).
# Kept as an opt-in (REFVSR_FUSED_CHAINS=1) for future shard_map/layout work.
FUSED_CHAINS = os.environ.get("REFVSR_FUSED_CHAINS", "0") == "1"
# bisect/tuning knob: only fuse chains with at least this many convs
_MIN_CONVS = int(os.environ.get("REFVSR_FUSED_MIN_CONVS", "0"))
# in-graph experiment: barrier the chain input so XLA cannot duplicate an
# expensive producer (gather/conv) into each of the nh*nw strip slices
_BARRIER = os.environ.get("REFVSR_FUSED_BARRIER", "1") != "0"

_VMEM_LIMIT = 120 * 1024 * 1024
_LANE = 128
_DC = 8  # buffer column where strip data starts (keeps main stores aligned)


def _blk_stride(c):
    """Lane stride of one packed-column tap block in the K matrix."""
    return -(-2 * c // _LANE) * _LANE


def use_fused_chain(x, num_convs: int) -> bool:
    if not FUSED_CHAINS or num_convs < _MIN_CONVS:
        return False
    try:
        if jax.default_backend() not in ("tpu", "axon") or \
                jax.device_count() != 1:
            return False
    except Exception:
        return False
    from refvsr_tpu.parallel import spatial
    if spatial.active() is not None:
        return False
    n, h, w, c = x.shape
    if n != 1 or c % 8 or c > 64:
        return False
    if h < 8 or w < 16:
        return False
    # a group never holds more convs than 2*group_blocks (default 5 blocks)
    return _plan_tiles(h, w, c, min(num_convs, 10), 8,
                       x.dtype.itemsize) is not None


def _act(y, kind):
    if kind == "relu":
        return jnp.maximum(y, 0.0)
    if kind == "lrelu2":
        return jnp.where(y >= 0.0, y, 0.2 * y)
    if kind == "lrelu1":
        return jnp.where(y >= 0.0, y, 0.1 * y)
    assert kind is None, kind
    return y


def _chain_kernel(x_ref, w_ref, b_ref, o_ref, cur, nxt, blk, cp, *,
                  acts, residuals, tile_h, tw_p, halo, hw_p, h_img, w_img,
                  wop, c, row_chunk):
    """One (H strip, W tile): run the whole conv group on a VMEM-resident
    width-packed activation window. See module docstring for the layout."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = tile_h + 2 * halo
    n_convs = len(acts)
    c2 = 2 * c
    bstr = _blk_stride(c)

    cur[pl.ds(1, rows), pl.ds(_DC, wop)] = x_ref[0, 0]
    zero_row = jnp.zeros((1, wop + 2, c2), cur.dtype)
    zero_col = jnp.zeros((rows + 2, 1, c2), cur.dtype)
    for buf in (cur, nxt, blk):
        buf[pl.ds(0, 1), pl.ds(_DC - 1, wop + 2)] = zero_row
        buf[pl.ds(rows + 1, 1), pl.ds(_DC - 1, wop + 2)] = zero_row
        buf[:, _DC - 1: _DC] = zero_col
        buf[:, _DC + wop: _DC + wop + 1] = zero_col
    # residual base of block 0
    blk[pl.ds(1, rows), pl.ds(_DC, wop)] = cur[pl.ds(1, rows),
                                               pl.ds(_DC, wop)]
    if bstr > c2:  # zero the K-matrix padding lanes once
        for kb in range(3):
            cp[:, :, kb * bstr + c2: (kb + 1) * bstr] = jnp.zeros(
                (row_chunk + 2, wop, bstr - c2), cp.dtype)

    row_g = jax.lax.broadcasted_iota(jnp.int32, (row_chunk, wop, 1), 0)
    pcol_g = jax.lax.broadcasted_iota(jnp.int32, (row_chunk, wop, 1), 1)
    half_g = jax.lax.broadcasted_iota(jnp.int32, (row_chunk, wop, c2),
                                      2) // c
    # org-image column of each (packed col, lane half)
    ocol_g = 2 * (pcol_g + j * tw_p - hw_p) + half_g
    n_chunks = rows // row_chunk

    src, dst = cur, nxt
    for l in range(n_convs):
        bias = b_ref[l]

        def chunk_body(k, _, src=src, dst=dst, l=l, bias=bias):
            r0 = k * row_chunk
            seg = src[pl.ds(r0, row_chunk + 2)]
            for kb in range(3):
                cp[:, :, kb * bstr: kb * bstr + c2] = \
                    seg[:, _DC - 1 + kb: _DC - 1 + kb + wop]
            y = jnp.zeros((row_chunk * wop, c2), jnp.float32)
            for dy in range(3):
                y = y + jax.lax.dot_general(
                    cp[pl.ds(dy, row_chunk)].reshape(row_chunk * wop,
                                                     3 * bstr),
                    w_ref[l, dy],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y = y.reshape(row_chunk, wop, c2) + bias
            rg = row_g + i * tile_h + r0
            in_img = ((rg >= halo) & (rg < halo + h_img)
                      & (ocol_g >= 0) & (ocol_g < w_img))
            y = jnp.where(in_img, y, 0.0)
            y = _act(y, acts[l])
            if residuals[l]:
                y = y + blk[pl.ds(r0 + 1, row_chunk),
                            pl.ds(_DC, wop)].astype(jnp.float32)
            dst[pl.ds(r0 + 1, row_chunk), pl.ds(_DC, wop)] = \
                y.astype(dst.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0, unroll=False)
        if residuals[l]:
            blk[pl.ds(1, rows), pl.ds(_DC, wop)] = dst[pl.ds(1, rows),
                                                       pl.ds(_DC, wop)]
        src, dst = dst, src

    o_ref[:] = src[halo + 1: halo + 1 + tile_h,
                   _DC + hw_p: _DC + hw_p + tw_p]


def _pack_weight(k, dtype):
    """(3,3,C,C) HWIO -> (3, 3*bstr, 2C) packed column-fold matrices.

    W[dy][kb*bstr + hi*C + ci, ho*C + co] = k[dy, kx, ci, co] with
    kx = 2*kb + hi - 1 - ho (the packed-column tap (kb, input half hi)
    seen from output half ho), zero where kx is outside [0, 3)."""
    c = k.shape[2]
    bstr = _blk_stride(c)
    w = jnp.zeros((3, 3 * bstr, 2 * c), dtype)
    for kb in range(3):
        for hi in range(2):
            for ho in range(2):
                kx = 2 * kb + hi - 1 - ho
                if 0 <= kx < 3:
                    w = w.at[:, kb * bstr + hi * c: kb * bstr + (hi + 1) * c,
                             ho * c: (ho + 1) * c].set(
                        k[:, kx].astype(dtype))
    return w


def _plan_tiles(h, w, c, n_convs, row_chunk, itemsize):
    """Pick (tile_h, tw_p, halo, hw_p) — packed-column tile sizes — under
    the VMEM budget, accounting for the 128-lane padding of 2C-minor
    buffers. Minimizes halo+edge-redundant compute for the actual (h, w)."""
    halo = n_convs
    hw_p = -(-(n_convs + 1) // 4) * 4  # packed cols; mult of 4 -> wop % 8 = 0
    w_p = -(-w // 2)  # packed width
    lanes = -(-2 * c // _LANE) * _LANE
    budget = 96 * 1024 * 1024
    kbytes = 3 * _blk_stride(c)  # K-matrix lane count
    best = None
    best_cost = None
    for tw in (512, 384, 256, 192, 128, 96, 64, 32, 16, 8):
        tw = min(tw, -(-w_p // 8) * 8)
        wop = tw + 2 * hw_p
        swp = wop + 16  # _DC guard/pad columns
        per_row_buf = swp * lanes * itemsize
        per_row_in = wop * lanes * itemsize
        per_row_out = tw * lanes * itemsize
        cpb = (row_chunk + 2) * wop * kbytes * itemsize
        avail = budget - cpb
        # 3 buffers of rows+2, 2 pipelined input strips of rows, 2 out tiles
        denom = 3 * per_row_buf + 2 * per_row_in + 2 * per_row_out
        max_th = (avail - (6 * halo + 6) * per_row_buf
                  - 4 * halo * per_row_in) // denom
        max_th = min(int(max_th) // row_chunk * row_chunk, 256)
        th = row_chunk
        while th <= max_th:
            rows = th + 2 * halo
            nh, nw = -(-h // th), -(-w_p // tw)
            cost = nh * nw * (rows * swp + 24 * 128) / float(h * w_p)
            if best_cost is None or cost < best_cost:
                best_cost, best = cost, (th, tw)
            th += row_chunk
    if best is None:
        return None
    tile_h, tw_p = best
    return tile_h, tw_p, halo, hw_p


def _run_group(x, kernels, biases, acts, residuals, row_chunk):
    """x: (H, W, C); one pallas launch for len(kernels) convs."""
    h, w, c = x.shape
    if _BARRIER:
        x = jax.lax.optimization_barrier(x)
    L = len(kernels)
    plan = _plan_tiles(h, w, c, L, row_chunk, x.dtype.itemsize)
    if plan is None:
        return None
    tile_h, tw_p, halo, hw_p = plan
    rows = tile_h + 2 * halo
    if rows % row_chunk:
        add = row_chunk - rows % row_chunk
        tile_h += add
        rows += add
    wop = tw_p + 2 * hw_p
    w_p = -(-w // 2)
    nh = -(-h // tile_h)
    nw = -(-w_p // tw_p)
    hp_need = (nh - 1) * tile_h + rows
    wp_need = ((nw - 1) * tw_p + wop) * 2
    xp = jnp.pad(x, [(halo, hp_need - h - halo),
                     (2 * hw_p, wp_need - w - 2 * hw_p), (0, 0)])
    # width-pack: 2 adjacent pixels -> 2C lanes
    xp = xp.reshape(xp.shape[0], xp.shape[1] // 2, 2 * c)
    # overlapping strips materialized in XLA (manual HBM DMA of non-128
    # lane-aligned slices is unsupported)
    strips = jnp.stack(
        [jnp.stack([jax.lax.dynamic_slice(
            xp, (i * tile_h, j * tw_p, 0), (rows, wop, 2 * c))
            for j in range(nw)]) for i in range(nh)])
    wk = jnp.stack([_pack_weight(k, x.dtype) for k in kernels])
    bs = jnp.stack([jnp.tile(b, 2) for b in biases]).astype(
        jnp.float32).reshape(L, 1, 2 * c)

    kernel = functools.partial(
        _chain_kernel, acts=tuple(acts), residuals=tuple(residuals),
        tile_h=tile_h, tw_p=tw_p, halo=halo, hw_p=hw_p, h_img=h, w_img=w,
        wop=wop, c=c, row_chunk=row_chunk)
    out = pl.pallas_call(
        kernel,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((1, 1, rows, wop, 2 * c),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tw_p, 2 * c),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nh * tile_h, nw * tw_p, 2 * c),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2, wop + 16, 2 * c), x.dtype),
            pltpu.VMEM((rows + 2, wop + 16, 2 * c), x.dtype),
            pltpu.VMEM((rows + 2, wop + 16, 2 * c), x.dtype),
            pltpu.VMEM((row_chunk + 2, wop, 3 * _blk_stride(c)), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(strips, wk, bs)
    # unpack and crop
    out = out.reshape(out.shape[0], out.shape[1] * 2, c)
    return out[: h, : w]


def fused_conv_chain(x, kernels, biases, ops, group_blocks: int = 5,
                     tile_h: int | None = None, row_chunk: int = 8):
    """x: (1, H, W, C). kernels: list of (3,3,C,C) HWIO; ops: per-conv dict
    {"act": None|"relu"|"lrelu1"|"lrelu2", "res": bool} — res=True adds the
    running residual base (the activation entering the current block) and
    starts a new block. Splits into groups of `group_blocks` blocks per
    launch (VMEM residency vs halo-redundancy tradeoff); group boundaries
    always fall right after a res-closing conv. `tile_h` is accepted for
    benchmark plumbing but the 2-D tile plan normally decides itself."""
    del tile_h
    n, h, w, c = x.shape
    assert n == 1

    # split at block boundaries
    groups = []
    cur = []
    for idx, op in enumerate(ops):
        cur.append(idx)
        if op.get("res") and len(cur) >= 2 * group_blocks:
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)

    y = x[0]
    for g in groups:
        r = _run_group(
            y, [kernels[i] for i in g], [biases[i] for i in g],
            [ops[i].get("act") for i in g],
            [bool(ops[i].get("res")) for i in g],
            row_chunk)
        assert r is not None, "use_fused_chain admitted an unplannable shape"
        y = r
    return y[None]
