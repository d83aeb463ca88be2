"""Pallas TPU kernel: banded bilinear warp (grid_sample zeros-mode parity).

The quad-canvas XLA warp (ops/warp.py) is row-gather bound: one gathered row
per output pixel at ~55 ns/row measured on v5e = 460 ms for the 1080p-HD-in
2x-grid UP warp (8.3M rows), ~50x over the ~10 ms HBM floor. The XLA banded
formulation (ops/warp_banded.py) cuts gathered rows 4.5x but loses the win to
per-select-position sublane-rotation copies (366 ms measured, chip session
r3). This kernel keeps the band in VMEM where the shifted window reads are
register traffic:

  1. Tile the output grid (TH x TW). Per tile, compute integer anchors
     (ky, kx) = min over live pixels of (corner - local offset) — the same
     diagonal-band construction as ops/warp_banded (exactness guard
     included), precomputed in XLA and scalar-prefetched.
  2. DMA the source band  src[ky:ky+YB, :, kx:kx+XWB]  from a
     channel-transposed HBM copy (H, C, W) into VMEM. Channels ride the
     SUBLANE axis and the x-window rides the LANE axis, so a C=48/49 feature
     map pads ~nothing (the NHWC formulations pad C->128 lanes, 2.67x).
     The copy is zero-padded TH rows up and TW cols left so edge tiles with
     up/left flow keep exact negative anchors instead of tripping the guard.
  3. Resolve each pixel's 4 bilinear corners with a static select window:
     acc += wgt[oy,ox] * band[oy:oy+TH, :, ox:ox+TW] over YSEL x XSEL
     shifted VMEM reads — pure VPU passes, zero gathers.
  4. EXACT: the precomputed per-call `ok` flag (intra-tile corner range fits
     the select window) gates a lax.cond fallback to the quad path; weights
     fold the zeros-padding live mask, plus a final live select so NaN
     coords can't poison outputs (NaN * 0 = NaN).

Semantics match ops/warp._bilinear_sample(padding="zeros") on the live
region (same weight arithmetic: f32 weights cast to the source dtype,
accumulation in source dtype). Reference op: grid_sample
align_corners=False zeros (/root/reference/models/utils.py:35-43).
Differentiable via custom_vjp: backward re-derives the quad-path VJP (the
kernel only serves the big inference warps; training patches sit far below
the size gate).
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# select window: tolerates intra-tile corner ranges of (YSEL-2) rows and
# (XSEL-2) cols — same tolerance the XLA banded path shipped with
_TH, _TW = 8, 384
_YSEL, _XSEL = 4, 12
_YB = _TH + _YSEL                      # band rows
# band lane width: the DMA column offset must be PROVABLY 128-aligned
# (Mosaic rejects unaligned lane-dim memref slices), so the slab is fetched
# at the aligned-down anchor and carries up to 127 residual columns, undone
# in VMEM by one dynamic pltpu.roll (32-bit only — hence the f32 band)
_XWB = -(-(_TW + _XSEL - 1 + 128) // 128) * 128


def _corners(sy, sx, h, w):
    """Shared corner math: top-left integer corners (true source coords,
    clamped like the quad path), fractional offsets, zeros-mode live mask."""
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    live = ((y0 >= -1.0) & (y0 <= h - 1.0)
            & (x0 >= -1.0) & (x0 <= w - 1.0))
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
    return y0i, x0i, sy - y0, sx - x0, live


def _kernel(ky_ref, kx_ref, sy_ref, sx_ref, src_ref, out_ref, band, sem,
            *, h, w, c):
    i, j = pl.program_id(0), pl.program_id(1)
    t = i * pl.num_programs(1) + j
    ky, kx = ky_ref[t], kx_ref[t]

    # anchors are true source coords in [-TH..] / [-TW..]; the transposed
    # copy is padded TH up / TW left, so shift into array index space.
    # Lane-dim DMA offsets must be 128-aligned: fetch at the aligned-down
    # column and record the residual for the in-VMEM roll below.
    cx = kx + _TW
    ca = cx // 128 * 128
    res = cx - ca
    dma = pltpu.make_async_copy(
        src_ref.at[pl.ds(ky + _TH, _YB), :, pl.ds(pl.multiple_of(ca, 128),
                                                  _XWB)],
        band, sem)
    dma.start()

    # per-pixel corner math (f32, VPU) overlaps the band DMA
    y0i, x0i, ty, tx, live = _corners(sy_ref[...], sx_ref[...], h, w)
    rr = lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
    cc = lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
    # in [0, YSEL-2]/[0, XSEL-2] when the call-level ok flag admitted us;
    # clamped so dead pixels read *something* in-range (their weight is 0)
    dy = jnp.clip(y0i - ky - rr, 0, _YSEL - 2)
    dx = jnp.clip(x0i - kx - cc, 0, _XSEL - 2)

    lf = live.astype(jnp.float32)
    w00 = (1.0 - ty) * (1.0 - tx) * lf
    w01 = (1.0 - ty) * tx * lf
    w10 = ty * (1.0 - tx) * lf
    w11 = ty * tx * lf

    dma.wait()
    # undo the alignment residual: band lane i now holds source col kx + i
    bd = pltpu.roll(band[...], _XWB - res, 2)

    acc = jnp.zeros((_TH, c, _TW), jnp.float32)
    for oy in range(_YSEL):
        for ox in range(_XSEL):
            wgt = jnp.where((dy == oy) & (dx == ox), w00, 0.0)
            if ox >= 1:
                wgt += jnp.where((dy == oy) & (dx == ox - 1), w01, 0.0)
            if oy >= 1:
                wgt += jnp.where((dy == oy - 1) & (dx == ox), w10, 0.0)
            if oy >= 1 and ox >= 1:
                wgt += jnp.where((dy == oy - 1) & (dx == ox - 1), w11, 0.0)
            acc = acc + (wgt[:, None, :]
                         * bd[oy:oy + _TH, :, ox:ox + _TW])
    # NaN coords give NaN weights and NaN*0 = NaN — hard-zero dead pixels
    # exactly like the quad path's final mask
    dt = out_ref.dtype
    out_ref[...] = jnp.where(live[:, None, :], acc.astype(dt),
                             jnp.zeros((), dt))


def _prep(h, w, sy, sx):
    """Anchors + exactness flag, the diagonal-band construction of
    ops/warp_banded._banded_core (sy/sx: (Ho_p, Wo_p) f32, tile-padded).
    Anchors are TRUE source coords; live pixels bound them to
    ky >= -TH, kx >= -TW (one-step-outside corner minus the max local
    offset), which the padded copy covers — no clamping, so the ok test
    measures the real intra-tile range even at image edges."""
    hop, wop = sy.shape
    nty, ntx = hop // _TH, wop // _TW

    y0i, x0i, _, _, live = _corners(sy, sx, h, w)

    def tiles_of(a):
        return (a.reshape(nty, _TH, ntx, _TW).transpose(0, 2, 1, 3)
                .reshape(nty * ntx, _TH, _TW))

    live_t = tiles_of(live)
    y0_t = tiles_of(y0i)
    x0_t = tiles_of(x0i)
    rr = lax.broadcasted_iota(jnp.int32, y0_t.shape, 1)
    cc = lax.broadcasted_iota(jnp.int32, y0_t.shape, 2)

    big = jnp.int32(1 << 28)
    ky = jnp.min(jnp.where(live_t, y0_t - rr, big), axis=(1, 2))
    kx = jnp.min(jnp.where(live_t, x0_t - cc, big), axis=(1, 2))
    ky = jnp.where(ky == big, 0, ky)     # all-dead tile: any valid slab
    kx = jnp.where(kx == big, 0, kx)

    dy = y0_t - ky[:, None, None] - rr
    dx = x0_t - kx[:, None, None] - cc
    ok = jnp.all(((dy >= 0) & (dy <= _YSEL - 2)
                  & (dx >= 0) & (dx <= _XSEL - 2)) | ~live_t)
    return ky, kx, ok


def _pallas_warp(x, sx, sy, interpret=False):
    """x: (1, H, W, C); sx/sy: (1, Ho, Wo) f32 source coords (pixel space).
    Returns (out (1, Ho, Wo, C) in x.dtype, ok scalar bool). Exact
    (zeros-mode _bilinear_sample parity) when ok; garbage when not —
    callers must lax.cond on ok."""
    n, h, w, c = x.shape
    assert n == 1
    ho, wo = sx.shape[1], sx.shape[2]
    hop = -(-ho // _TH) * _TH
    wop = -(-wo // _TW) * _TW
    # pad coords with a far-outside sentinel: dead pixels (live=False),
    # excluded from anchors, zero output
    sy_p = jnp.pad(sy[0].astype(jnp.float32),
                   [(0, hop - ho), (0, wop - wo)], constant_values=-1e9)
    sx_p = jnp.pad(sx[0].astype(jnp.float32),
                   [(0, hop - ho), (0, wop - wo)], constant_values=-1e9)

    ky, kx, ok = _prep(h, w, sy_p, sx_p)

    # channel-transposed zero-padded source (Hp, C, Wp): TH/TW up/left for
    # negative anchors (incl. the -1 ring), band-slab room down/right.
    # f32: the in-kernel residual roll is 32-bit-only, and f32 accumulation
    # is strictly tighter than the quad path's source-dtype adds.
    xs = jnp.pad(x[0], [(_TH, _YB), (_TW, _XWB), (0, 0)])
    xs_t = xs.transpose(0, 2, 1).astype(jnp.float32)

    nty, ntx = hop // _TH, wop // _TW
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            # index maps receive the scalar-prefetch refs after grid indices
            pl.BlockSpec((_TH, _TW), lambda i, j, ky, kx: (i, j)),
            pl.BlockSpec((_TH, _TW), lambda i, j, ky, kx: (i, j)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_TH, c, _TW),
                               lambda i, j, ky, kx: (i, 0, j)),
        scratch_shapes=[
            pltpu.VMEM((_YB, c, _XWB), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hop, c, wop), x.dtype),
        interpret=interpret,
    )(ky, kx, sy_p, sx_p, xs_t)
    return out_t.transpose(0, 2, 1)[None, :ho, :wo], ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_warp_zeros(x, sx, sy, interpret=False):
    """Banded-Pallas bilinear sample with zeros padding, exact
    _bilinear_sample parity; falls back to the quad path in-graph (lax.cond)
    whenever a tile's corner range exceeds the select window."""
    return _pallas_warp_cond(x, sx, sy, interpret)


def _quad(x, sx, sy):
    from refvsr_tpu.ops.warp import _bilinear_sample_quad
    return _bilinear_sample_quad(x, sx, sy, "zeros")


def _pallas_warp_cond(x, sx, sy, interpret=False):
    fast, ok = _pallas_warp(x, sx, sy, interpret)
    return lax.cond(ok, lambda: fast, lambda: _quad(x, sx, sy))


def _fwd(x, sx, sy, interpret):
    return _pallas_warp_cond(x, sx, sy, interpret), (x, sx, sy)


def _bwd(interpret, res, g):
    # backward through the mathematically-identical quad formulation: the
    # kernel only serves big n=1 inference warps (training patches sit far
    # below ops/warp._BANDED_MIN_PIXELS), so the extra quad forward in the
    # rare differentiated case is an acceptable price for full correctness
    # (incl. coordinate gradients)
    x, sx, sy = res
    _, vjp = jax.vjp(_quad, x, sx, sy)
    return vjp(g)


pallas_warp_zeros.defvjp(_fwd, _bwd)


@functools.lru_cache(maxsize=1)
def use_pallas_warp() -> bool:
    """Mirror of matching._use_pallas_matching: single-TPU-device processes
    get the kernel; CPU tests and GSPMD-sharded meshes use the XLA paths
    (the spatial-sharding ctx is checked upstream in _bilinear_sample)."""
    try:
        return (jax.default_backend() == "tpu"
                and jax.local_device_count() == 1)
    except Exception:
        return False
