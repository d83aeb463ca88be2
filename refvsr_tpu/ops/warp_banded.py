"""Block-diagonal "banded" gather — a row-count-bound-breaking formulation
for bilinear-style sampling (see ops/warp.py for the quad-canvas baseline).

TPU row gathers cost ~16-20 ns per gathered row regardless of row width
(docs/ROUND1_NOTES.md), which makes per-pixel quad-canvas sampling ~8.3M
rows (~150 ms) for the 1080p-HD-in 2x-grid UP warp. Real optical flows and
affine sampling patterns are spatially smooth, so within a small output tile
the source coords cluster:

  1. Tile the output point grid (TH x TWO points).
  2. Per tile, row-gather a source BAND of YB rows x NB col-blocks of XB
     columns from a zero-padded source, anchored at the tile's min corner
     DIAGONAL (min over the tile of y0 - expected_row / x0 - expected_col).
     Anchors are exact integers, block-dynamic per tile. Gathered rows:
     ~PIX * YB/(TH*XB), ~4-5x fewer than per-pixel.
  3. Resolve each point's 2x2 corner block with a static select window:
     out += w[oy,ox] * band[:, oy:oy+TH, ox:ox+TWO] over YSEL x XSEL
     shifted static slices — pure VPU passes, zero gathers.
  4. EXACT, never approximate: per-tile coverage is verified against the
     true corner indices and every entry point returns (out, ok). Callers
     wrap a `lax.cond(ok, ...)` falling back to the quad path, which only
     fires when the intra-tile coord *range* exceeds the select window
     (> XSEL-2 px across a TWO-point tile) — violent motion, not typical
     video.

Entry point: banded_sample — torch-grid_sample-parity bilinear warp
(zeros/border), matching ops/warp._bilinear_sample. Reference:
models/utils.py:35-43. (The affine gather was evaluated for this treatment
too, but its stride-2 source grid halves the row savings while doubling
band traffic — its cheap fix is the quad-canvas threshold instead.)

Tile-size A/B, chip session r3 (1080p-HD 2x UP-warp, 2160x3840x48 bf16,
v5e): th=16/xb=8 361.7 ms, th=8/xb=8 400.2 ms, th=8/xb=16 626.2 ms, quad
465.0 ms — th=16/xb=8 is the default. Larger th amortizes the band over
more points; larger xb inflates the select window (xsel = xb + 4 static
slices per tile).
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp


# padded-band byte budget per scan chunk: bounds the dominant HLO temp.
# The whole-array formulation OOMed at the 1080p-HD 2x UP-warp shape (8100
# tiles -> 12.25G unpadded / 31.76G lane-padded band, chip session r3);
# chunking tiles through lax.scan caps it at ~this budget regardless of
# output size while keeping the machinery (and its parity tests) intact.
_BAND_CHUNK_BYTES = 256 << 20


def _geom(h, w, th, two, xb, ysel, xsel_extra):
    """Static band geometry for an (h, w) source as _banded_core sees it
    (i.e. AFTER banded_sample's ring padding). Shared by the exec path and
    the coordinate-only plan (banded_ok) so the two can never drift."""
    xsel = xb + xsel_extra
    yb = th + ysel
    nb = -(-(two + xb + xsel - 2) // xb)
    top, left = th + 1, two + 1
    wp_al = -(-(left + w + 1 + two + xb + xsel) // xb) * xb
    hp = top + h + 1 + yb
    nxb = wp_al // xb
    return xsel, yb, nb, top, left, wp_al, hp, nxb


def _tiles_of(a, b, nty, ntx, th, two, pad_o):
    """(B, Ho, Wo) -> (B*nty*ntx, th, two) tile-major layout (pads output
    to tile multiples; tiles never straddle batch items)."""
    a = jnp.pad(a, pad_o)
    return (a.reshape(b, nty, th, ntx, two).transpose(0, 1, 3, 2, 4)
            .reshape(b * nty * ntx, th, two))


def _anchors(live_t, y0r_t, x0c_t, rows_total, nxb, th, two, xb, ysel, xsel,
             yb, nb):
    """Per-tile diagonal anchors + select-window offsets. Returns
    (ky, kxb, dy, dx, ok_sel); ok_sel depends ONLY on coordinates, which is
    what makes the plan/exec split exact."""
    nt = live_t.shape[0]
    rr = jax.lax.broadcasted_iota(jnp.int32, (nt, th, two), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (nt, th, two), 2)

    # diagonal anchors: dead points excluded (a big sentinel keeps them
    # out of the min without branching)
    big = jnp.int32(1 << 28)
    ky = jnp.min(jnp.where(live_t, y0r_t - rr, big), axis=(1, 2))
    kxd = jnp.min(jnp.where(live_t, x0c_t - cc, big), axis=(1, 2))
    all_dead = ky == big
    ky = jnp.where(all_dead, 0, jnp.clip(ky, 0, rows_total - yb))
    kxb = jnp.where(all_dead, 0,
                    jnp.clip(kxd // xb, 0, nxb - nb)).astype(jnp.int32)

    dy = y0r_t - ky[:, None, None] - rr          # in [0, ysel-2] if valid
    dx = x0c_t - (kxb * xb)[:, None, None] - cc  # in [0, xsel-2] if valid
    ok_sel = ((dy >= 0) & (dy <= ysel - 2) & (dx >= 0) & (dx <= xsel - 2))
    return ky, kxb, dy, dx, ok_sel


def _banded_core(xs, y0i, x0i, weights, live, th, two, xb, ysel, xsel_extra,
                 debug_stats=False):
    """Shared banded gather machinery.

    xs: (B, H, W, C) source. y0i/x0i: (B, Ho, Wo) int32 top-left corner
    anchors in source coords, guaranteed in [0, H-1] x [0, W-1] (+1 reads
    may exit; they land in zero padding and must carry zero weight).
    weights: 4-tuple of (B, Ho, Wo) f32 corner weights (w00, w01, w10, w11).
    live: (B, Ho, Wo) bool — points excluded from anchor mins AND from
    validity (their outputs are weight-0 garbage).

    Batch folds into the flat row table: batch item b's padded rows live at
    flat rows [b*hp, (b+1)*hp), and the per-tile row anchors carry the b*hp
    offset. A live tile's band stays inside its item by construction
    (anchors are >= top - (th-1) > 0 and <= top + h, and the band depth yb
    fits the bottom padding), so no cross-item reads are possible.

    Returns (out (B, Ho, Wo, C) in xs.dtype, ok scalar bool [, stats])."""
    b, h, w, c = xs.shape
    ho, wo = y0i.shape[1], y0i.shape[2]

    # Generous zero padding makes every anchor a real row/col; with the
    # diagonal anchors, band coverage is then guaranteed by construction and
    # only ok_sel (select-window span) can fail.
    xsel, yb, nb, top, left, wp_al, hp, nxb = _geom(h, w, th, two, xb, ysel,
                                                    xsel_extra)
    xp = jnp.pad(xs, [(0, 0), (top, hp - top - h),
                      (left, wp_al - left - w), (0, 0)])
    flat = xp.reshape(b * hp * nxb, xb * c)
    # row anchors in GLOBAL flat-table coords (+ b*hp per item)
    y0r = y0i + top + (jnp.arange(b, dtype=jnp.int32) * hp)[:, None, None]
    x0c = x0i + left

    # tile grids (pad output to tile multiples); tiles never straddle items
    ho_p = -(-ho // th) * th
    wo_p = -(-wo // two) * two
    pad_o = [(0, 0), (0, ho_p - ho), (0, wo_p - wo)]
    nty, ntx = ho_p // th, wo_p // two
    ntiles = b * nty * ntx

    def tiles_of(a):
        return _tiles_of(a, b, nty, ntx, th, two, pad_o)

    live_t = tiles_of(live.astype(jnp.float32)) > 0    # pads to dead
    y0r_t = tiles_of(y0r)
    x0c_t = tiles_of(x0c)
    w_t = [tiles_of(wi.astype(jnp.float32)) for wi in weights]
    dt = xs.dtype

    def process(live_t, y0r_t, x0c_t, w_t):
        """Band-gather + select-window for a batch of tiles. Returns
        (out (nt, th, two, c), ok_sel (nt, th, two) bool, dy, dx)."""
        nt = live_t.shape[0]
        ky, kxb, dy, dx, ok_sel = _anchors(live_t, y0r_t, x0c_t, b * hp,
                                           nxb, th, two, xb, ysel, xsel, yb,
                                           nb)

        # ---- band gather: (nt, yb, nb) row ids -> (nt, yb, nb*xb, c)
        jj = jnp.arange(yb, dtype=jnp.int32)
        bb = jnp.arange(nb, dtype=jnp.int32)
        rows = ((ky[:, None] + jj[None]) * nxb)[:, :, None] + \
            (kxb[:, None] + bb[None])[:, None, :]             # (nt, yb, nb)
        band = jnp.take_along_axis(
            flat[None], rows.reshape(1, -1, 1), axis=1, mode="clip")
        band = band.reshape(nt, yb, nb * xb, c)

        # ---- static select window: clamp dy/dx so dead points read
        # *something* in-range (their weights are zero). Accumulate in the
        # source dtype — mirrors the quad path's arithmetic (weights cast
        # then dtype adds) and halves the accumulator HBM at the 8K shapes.
        dy_c = jnp.clip(dy, 0, ysel - 2)
        dx_c = jnp.clip(dx, 0, xsel - 2)
        live_f = live_t.astype(jnp.float32)

        out = jnp.zeros((nt, th, two, c), dt)
        for oy in range(ysel):
            for ox in range(xsel):
                cy = oy - dy_c
                cx = ox - dx_c
                wgt = (jnp.where((cy == 0) & (cx == 0), w_t[0], 0.0)
                       + jnp.where((cy == 0) & (cx == 1), w_t[1], 0.0)
                       + jnp.where((cy == 1) & (cx == 0), w_t[2], 0.0)
                       + jnp.where((cy == 1) & (cx == 1), w_t[3], 0.0))
                wgt = (wgt * live_f).astype(dt)
                sl = lax.slice(band, (0, oy, ox, 0),
                               (nt, oy + th, ox + two, c))
                out = out + wgt[..., None] * sl

        # dead points must be EXACT zeros like the quad path's final mask —
        # weight zeroing alone propagates NaN (non-finite coords give NaN
        # weights, and NaN * 0 = NaN)
        out = jnp.where(live_t[..., None], out, jnp.zeros((), dt))
        return out, ok_sel, dy, dx

    # tiles per scan chunk, budgeted on the lane-PADDED band bytes (minor
    # dim c tiles to 128): the chip-session r3 OOM was this temp at 8100
    # tiles resident at once
    lane_pad = -(-c // 128) * 128
    per_tile = yb * (-(-(nb * xb) // 8) * 8) * lane_pad * xs.dtype.itemsize
    chunk = max(1, _BAND_CHUNK_BYTES // per_tile)

    if ntiles <= chunk:
        out, ok_sel, dy, dx = process(live_t, y0r_t, x0c_t, w_t)
        ok = jnp.all(ok_sel | ~live_t)
        stats = {"ok_sel": jnp.mean(ok_sel.astype(jnp.float32)),
                 "dy_max": jnp.max(jnp.where(live_t, dy, 0)),
                 "dx_max": jnp.max(jnp.where(live_t, dx, 0))}
    else:
        nchunks = -(-ntiles // chunk)
        pad_t = nchunks * chunk - ntiles

        def chunked(a):
            if pad_t:  # padded tiles are all-dead -> excluded everywhere
                a = jnp.pad(a, [(0, pad_t)] + [(0, 0)] * (a.ndim - 1))
            return a.reshape((nchunks, chunk) + a.shape[1:])

        xs_in = (chunked(live_t), chunked(y0r_t), chunked(x0c_t),
                 [chunked(wi) for wi in w_t])

        def step(carry, inp):
            lt, yt, xt, wt = inp
            o, ok_sel, dy, dx = process(lt, yt, xt, wt)
            ok_c, n_ok, dy_m, dx_m = carry
            carry = (ok_c & jnp.all(ok_sel | ~lt),
                     n_ok + jnp.sum(ok_sel.astype(jnp.float32)),
                     jnp.maximum(dy_m, jnp.max(jnp.where(lt, dy, 0))),
                     jnp.maximum(dx_m, jnp.max(jnp.where(lt, dx, 0))))
            # flatten FULLY to 1-D: stacked (..., c) scan outputs would carry
            # the c->128 lane padding across the whole output (2.67x HBM at
            # c=48); (K,) chunks stack to (nchunks, K) which tiles cleanly
            return carry, o.reshape(chunk * th * two * c)

        init = (jnp.bool_(True), jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (ok, n_ok, dy_m, dx_m), outs = lax.scan(step, init, xs_in)
        out = outs.reshape(nchunks * chunk, th, two, c)[:ntiles]
        stats = {"ok_sel": n_ok / float(ntiles * th * two),
                 "dy_max": dy_m, "dx_max": dx_m}

    out = out.reshape(b, nty, ntx, th, two, c).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, ho_p, wo_p, c)[:, :ho, :wo]
    if debug_stats:
        return out, ok, stats
    return out, ok


def _coord_prep(sy, sx, h, w, padding):
    """grid_sample-parity coordinate prep shared by banded_sample and the
    banded_ok plan: returns (y0i, x0i, ty, tx, live) with integer anchors in
    RING coords (source ring-padded by 1 so one-step-outside corners read
    exact zeros in zeros mode)."""
    sy = sy.astype(jnp.float32)
    sx = sx.astype(jnp.float32)
    if padding == "border":
        sy = jnp.clip(sy, 0.0, h - 1.0)
        sx = jnp.clip(sx, 0.0, w - 1.0)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ty = sy - y0
    tx = sx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1) + 1
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1) + 1

    if padding == "zeros":
        live = ((y0 >= -1.0) & (y0 <= h - 1.0)
                & (x0 >= -1.0) & (x0 <= w - 1.0))
    else:
        live = jnp.ones(y0.shape, jnp.bool_)
    return y0i, x0i, ty, tx, live


def banded_ok(x_shape, sy, sx, padding="zeros", th=16, two=128, xb=8,
              ysel=4, xsel_extra=4):
    """Coordinate-only validity PLAN: returns exactly the `ok` scalar
    banded_sample would, without touching source data. Callers use it to put
    the band gather INSIDE a lax.cond branch (plan/exec split): peak HBM
    becomes max(banded, fallback) instead of banded-output + branch max, and
    a fallback-bound call skips the wasted gather entirely. Exactness: the
    plan shares _coord_prep/_geom/_anchors with the exec path, and ok_sel
    depends only on coordinates."""
    b, h, w, _ = x_shape
    y0i, x0i, _, _, live = _coord_prep(sy, sx, h, w, padding)
    hr, wr = h + 2, w + 2   # _banded_core sees the ring-padded source
    xsel, yb, nb, top, left, _, hp, nxb = _geom(hr, wr, th, two, xb, ysel,
                                                xsel_extra)
    ho, wo = y0i.shape[1], y0i.shape[2]
    ho_p = -(-ho // th) * th
    wo_p = -(-wo // two) * two
    pad_o = [(0, 0), (0, ho_p - ho), (0, wo_p - wo)]
    nty, ntx = ho_p // th, wo_p // two

    y0r = y0i + top + (jnp.arange(b, dtype=jnp.int32) * hp)[:, None, None]
    x0c = x0i + left
    live_t = _tiles_of(live.astype(jnp.float32), b, nty, ntx, th, two,
                       pad_o) > 0
    y0r_t = _tiles_of(y0r, b, nty, ntx, th, two, pad_o)
    x0c_t = _tiles_of(x0c, b, nty, ntx, th, two, pad_o)
    *_, ok_sel = _anchors(live_t, y0r_t, x0c_t, b * hp, nxb, th, two, xb,
                          ysel, xsel, yb, nb)
    return jnp.all(ok_sel | ~live_t)


def banded_sample(x, sy, sx, padding="zeros", th=16, two=128, xb=8,
                  ysel=4, xsel_extra=4, debug_stats=False):
    """Bilinear sample of x (N, H, W, C) at f32 source coords sy/sx
    (N, Ho, Wo), matching ops/warp._bilinear_sample semantics. Returns
    (out, ok): out is exact when ok is True; callers must fall back when it
    is False (ok is a single scalar over the whole batch). For the
    cond-friendly split, check banded_ok first and call this only in the
    ok branch."""
    n, h, w, c = x.shape
    y0i, x0i, ty, tx, live = _coord_prep(sy, sx, h, w, padding)
    xs = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])

    lm = live.astype(jnp.float32)
    weights = ((1.0 - ty) * (1.0 - tx) * lm, (1.0 - ty) * tx * lm,
               ty * (1.0 - tx) * lm, ty * tx * lm)

    return _banded_core(xs, y0i, x0i, weights, live, th, two, xb, ysel,
                        xsel_extra, debug_stats)
