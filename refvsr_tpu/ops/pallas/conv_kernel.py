"""Pallas TPU kernels: fused 'same'-padded KxK convs (single and resblock).

Why: XLA's TPU conv at this model's shapes pays a ~1.2-3.5 ms fixed cost per
conv op at (544, 960, 48) (relayouts dominate; C=128 does 7x the FLOPs of
C=48 in 1.4x the time). The prop step runs ~110 convs/frame through
resblock-style chains, so conv overhead is ~60% of the streaming step.

Design (v1, no manual DMA):
  * The caller zero-pads rows/cols by the total halo and materializes
    OVERLAPPING row tiles (stride R, height R + 2*halo) — ~1.25x HBM read
    traffic, which is noise next to the per-conv fixed cost it removes.
  * The kernel computes each conv as 9 (or 25) shifted [M, C] x [C, O] MXU
    dots with f32 accumulation, then bias + leaky-relu in VMEM.
  * For the fused resblock (conv-act-conv + res_scale*x), the intermediate
    t1 lives only in VMEM/registers; rows/cols of t1 outside the image are
    re-masked to zero so tile results match the direct 'same' conv exactly
    (relu(b1) pollution at borders — same landmine as refvsr._tail_tiled).
  * Gradients: custom_vjp recomputes with the XLA reference implementation —
    training keeps today's speed, eval gets the fused kernel.

Activation is parameterized by leaky-relu slope: 0.0 = relu, 1.0 = identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(x, slope: float):
    if slope == 1.0:
        return x
    return jnp.where(x >= 0, x, x * slope)


def _conv_strip(slab, kernel, bias, rows_out, cols_out, ksize):
    """Strip conv: slab (rows_out + k - 1, cols_out + k - 1, C) value;
    kernel (k, k, C, O); bias (1, O). Returns f32 (rows_out, cols_out, O).
    NOTE: avoid inserting minor dims on non-32-bit values — Mosaic only
    supports that for 32-bit types (hence the (1, O) bias and f32 masks)."""
    c = slab.shape[-1]
    o = kernel.shape[-1]
    acc = jnp.zeros((rows_out * cols_out, o), jnp.float32)
    for dy in range(ksize):
        for dx in range(ksize):
            xs = slab[dy:dy + rows_out, dx:dx + cols_out, :]
            acc = acc + jax.lax.dot_general(
                xs.reshape(rows_out * cols_out, c), kernel[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return (acc + bias.astype(jnp.float32)).reshape(rows_out, cols_out, o)


# strip heights: phase-1 strips cover rows + 2*halo, phase-2 strips cover
# rows. fori_loop bodies keep the compile unit small — fully unrolled tile
# bodies OOM-kill the chipless compile helper.
_STRIP = 8


def _single_kernel(rows, w, h, ksize, slope, x_ref, k_ref, b_ref, o_ref):
    kernel = k_ref[:]
    bias = b_ref[:]

    def body(s, _):
        r0 = s * _STRIP
        slab = x_ref[0, pl.ds(r0, _STRIP + ksize - 1), :, :]
        out = _conv_strip(slab, kernel, bias, _STRIP, w, ksize)
        o_ref[0, pl.ds(r0, _STRIP)] = _act(out, slope).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows // _STRIP, body, 0)


def _resblock_kernel(rows, w, h, t_tiles, ksize, slope, res_scale,
                     x_ref, k1_ref, b1_ref, k2_ref, b2_ref, o_ref, t1_ref):
    halo = ksize // 2
    i = pl.program_id(0) % t_tiles
    t_rows = rows + 2 * halo
    t_cols = w + 2 * halo
    k1 = k1_ref[:]
    b1 = b1_ref[:]
    k2 = k2_ref[:]
    b2 = b2_ref[:]

    # out-of-image rows/cols of t1 must be zero (conv2's 'same' zero padding;
    # act(b1) would otherwise pollute borders).
    col_g = jax.lax.broadcasted_iota(jnp.int32, (1, t_cols), 1) - halo
    n1 = -(-t_rows // _STRIP)  # t_rows need not divide; tail rows masked

    def body1(s, _):
        r0 = s * _STRIP
        slab = x_ref[0, pl.ds(r0, _STRIP + ksize - 1), :, :]
        t1 = _act(_conv_strip(slab, k1, b1, _STRIP, t_cols, ksize), slope)
        row_g = (jax.lax.broadcasted_iota(jnp.int32, (_STRIP, 1), 0)
                 + i * rows + r0 - halo)
        inside = ((row_g >= 0) & (row_g < h)
                  & (col_g >= 0) & (col_g < w)).astype(jnp.float32)
        t1_ref[pl.ds(r0, _STRIP)] = (t1 * inside[:, :, None]).astype(
            t1_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n1, body1, 0)

    def body2(s, _):
        r0 = s * _STRIP
        slab = t1_ref[pl.ds(r0, _STRIP + ksize - 1), :, :]
        out = _conv_strip(slab, k2, b2, _STRIP, w, ksize)
        res = x_ref[0, pl.ds(r0 + 2 * halo, _STRIP), 2 * halo:2 * halo + w, :]
        o_ref[0, pl.ds(r0, _STRIP)] = (res.astype(jnp.float32)
                                       + out * res_scale).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows // _STRIP, body2, 0)


def _pick_rows(w, c, o, halo_total, itemsize, vmem_budget=72 << 20):
    """Choose the row-tile height (multiple of _STRIP) so src tile + t1
    scratch + out block (plus Mosaic double buffering) fit in VMEM. v5e has
    128 MB physical VMEM (the 16 MB 'scoped' default is raised via
    CompilerParams), and VMEM buffers lane-pad the channel dim to 128
    (C=48 -> 2.67x), so size with padded channels."""
    cp = -(-c // 128) * 128
    op = -(-o // 128) * 128
    for rows in (128, 64, 32, 16, 8):
        src = (rows + 2 * halo_total + 8) * (w + 2 * halo_total) * cp * itemsize
        t1 = (rows + halo_total + 8) * (w + halo_total) * max(cp, op) * itemsize
        out = rows * w * op * itemsize
        if 2 * src + t1 + 2 * out <= vmem_budget:
            return rows
    return 8


def _stack_tiles(x, rows, top_pad, tile_h, col_pad):
    """x: (N, H, W, C) -> ((N, T, tile_h, W + 2*col_pad, C), T): overlapping
    row tiles at stride `rows` over x zero-padded by top_pad above, col_pad
    on both sides, and below as far as the last tile reaches."""
    n, h, w, c = x.shape
    t = -(-h // rows)
    bottom = (t - 1) * rows + tile_h - top_pad - h
    xp = jnp.pad(x, [(0, 0), (top_pad, bottom), (col_pad, col_pad), (0, 0)])
    tiles = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, i * rows, tile_h, 1)
         for i in range(t)], 1)
    return tiles, t


def _xla_single(x, kernel, bias, slope):
    p = kernel.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return _act(out + bias.astype(x.dtype), slope)


def _xla_resblock(x, k1, b1, k2, b2, slope, res_scale):
    t1 = _xla_single(x, k1, b1, slope)
    t2 = _xla_single(t1, k2, b2, 1.0)
    return x + t2 * jnp.asarray(res_scale, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_conv3x3(x, kernel, bias, slope=1.0, interpret=False):
    """'same' KxK conv + bias + leaky-relu(slope). x: (N, H, W, C);
    kernel: (k, k, C, O) HWIO, k odd."""
    return _fused_conv_impl(x, kernel, bias, slope, interpret)


def _fused_conv_impl(x, kernel, bias, slope, interpret):
    n, h, w, c = x.shape
    ksize, _, _, o = kernel.shape
    halo = ksize // 2
    rows = _pick_rows(w, c, o, halo, x.dtype.itemsize)
    tile_h = rows + ksize - 1
    tiles, t = _stack_tiles(x, rows, halo, tile_h, halo)

    kern = functools.partial(_single_kernel, rows, w, h, ksize, slope)
    out = pl.pallas_call(
        kern,
        grid=(n * t,),
        in_specs=[
            pl.BlockSpec((1, tile_h, w + 2 * halo, c),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((ksize, ksize, c, o), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w, o), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n * t, rows, w, o), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tiles.reshape(n * t, tile_h, w + 2 * halo, c), kernel,
      bias.reshape(1, -1))
    return out.reshape(n, t * rows, w, o)[:, :h]


def _fused_conv_fwd(x, kernel, bias, slope, interpret):
    return _fused_conv_impl(x, kernel, bias, slope, interpret), \
        (x, kernel, bias)


def _fused_conv_bwd(slope, interpret, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda x, k, b: _xla_single(x, k, b, slope),
                     x, kernel, bias)
    return vjp(g)


fused_conv3x3.defvjp(_fused_conv_fwd, _fused_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_resblock(x, k1, b1, k2, b2, slope=0.0, res_scale=1.0,
                   interpret=False):
    """x + res_scale * conv2(act(conv1(x))), both convs 'same' KxK.
    slope: leaky-relu slope of the inner activation (0.0 = relu)."""
    return _fused_resblock_impl(x, k1, b1, k2, b2, slope, res_scale,
                                interpret)


def _fused_resblock_impl(x, k1, b1, k2, b2, slope, res_scale, interpret):
    n, h, w, c = x.shape
    ksize = k1.shape[0]
    halo = ksize // 2
    halo_total = 2 * halo
    rows = _pick_rows(w, c, c, halo_total, x.dtype.itemsize)
    # phase-1 strips cover t_rows = rows + 2*halo rounded up to _STRIP; the
    # x tile must feed the last (possibly overhanging) strip
    n1 = -(-(rows + 2 * halo) // _STRIP)
    t1_rows = n1 * _STRIP
    tile_h = t1_rows + ksize - 1
    tiles, t = _stack_tiles(x, rows, halo_total, tile_h, halo_total)

    kern = functools.partial(_resblock_kernel, rows, w, h, t, ksize, slope,
                             res_scale)
    out = pl.pallas_call(
        kern,
        grid=(n * t,),
        in_specs=[
            pl.BlockSpec((1, tile_h, w + 2 * halo_total, c),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((ksize, ksize, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((ksize, ksize, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n * t, rows, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((t1_rows, w + 2 * halo, c), x.dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tiles.reshape(n * t, tile_h, w + 2 * halo_total, c),
      k1, b1.reshape(1, -1), k2, b2.reshape(1, -1))
    return out.reshape(n, t * rows, w, c)[:, :h]


def _fused_resblock_fwd(x, k1, b1, k2, b2, slope, res_scale, interpret):
    return _fused_resblock_impl(x, k1, b1, k2, b2, slope, res_scale,
                                interpret), (x, k1, b1, k2, b2)


def _fused_resblock_bwd(slope, res_scale, interpret, res, g):
    x, k1, b1, k2, b2 = res
    _, vjp = jax.vjp(
        lambda x, k1, b1, k2, b2: _xla_resblock(x, k1, b1, k2, b2, slope,
                                                res_scale),
        x, k1, b1, k2, b2)
    return vjp(g)


fused_resblock.defvjp(_fused_resblock_fwd, _fused_resblock_bwd)


def use_fused_conv(h: int, w: int) -> bool:
    """Gate for routing model convs through the fused kernels.

    CURRENTLY ALWAYS FALSE: measured on v5e, the best strip-mined variant
    reaches ~4 ms/conv at (544, 960, 48) while XLA conv CHAINS already run at
    ~1.2-1.5 ms/conv (the 3.7 ms standalone-conv cost is boundary relayout
    that chains amortize). The K=48/N=48 dot shapes cap MXU utilization at
    ~14% and the (rows*cols, C) reshape relayouts eat the rest; beating XLA
    here needs lane-aligned W tiling + a channel-packed kernel layout —
    kept as groundwork (correct, tested in interpret mode) for a future
    round. See docs/ROUND1_NOTES.md perf table."""
    return False
