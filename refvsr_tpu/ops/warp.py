"""Flow-based backward warping (NHWC) with torch ``grid_sample`` parity.

The reference uses two *different* warpers (a real parity landmine):

1. ``warp()``               /root/reference/models/utils.py:35-43
   Builds a normalized base grid with ``linspace(-1, 1, size)`` (align_corners=True
   style), adds flow scaled by ``2/(size-1)``, then calls ``grid_sample`` with
   ``align_corners=False`` + ``padding_mode='zeros'``.  The net effective source
   pixel is  ``src = (i + f) * S/(S-1) - 0.5``  (S = size along that axis).

2. ``flow_warp()``          /root/reference/mmedit/models/common/flow_warp.py:6-47
   Unnormalized flow, ``align_corners=True`` + ``padding_mode='border'``:
   ``src = i + f`` with clamped taps.  Used inside SPyNet only.

Performance: XLA row-gather cost on TPU is ROW-COUNT bound (~20 ns/row at
these shapes, nearly independent of row width — each random row read costs
whole (16,128) lane-tiles regardless), so the winning formulation packs ALL
FOUR bilinear corners into one fat row: a pixel-QUAD canvas
(x[h,w] ++ x[h,w+1] ++ x[h+1,w] ++ x[h+1,w+1] -> 4C lanes) + ONE
``take_along_axis`` row gather. Measured at the 2x-grid feature-warp shape
(2.1M pixels, C=48, bf16, v5e): quad 42 ms, pair-canvas 2-gather 57 ms,
canvas-free 4-gather 298 ms, lax.gather of (2,2C) slices 3273 ms (tiny-slice
layout padding). The quad canvas costs 4x the source in HBM, so above
``_QUAD_CANVAS_BYTES`` we drop to the pair canvas (2 gathers, 2x memory).
The threshold admits the 1080p-HD-in 2x-grid UP warp's 3.2 GB quad canvas:
round-2 profiling showed the pair fallback costing 441 ms there (double
gathers + worse layout) vs ~150 ms expected on the quad path — worth the
transient HBM on a 16 GB chip.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

_QUAD_CANVAS_BYTES = 3584 << 20
# banded warp (ops/warp_banded.py): DEFAULT for large zeros-mode n=1 warps.
# Exact — falls back to the quad path via lax.cond when a tile's flow range
# exceeds the static select window. Chip session r3 (v5e, bf16): 1080p-HD
# 2x UP-warp (2160x3840x48) banded 361.7 ms vs quad 465.0 ms (-22%);
# feat-warp (1080x1920x49) banded(th=16) ~102 ms vs quad ~108 ms. A Pallas
# DMA-band kernel of the same formulation was built and measured slower
# (610 ms; per-tile DMA latency not hidden) and removed — docs/ROUND3_NOTES.
# Below the pixel threshold the banded tiling overhead isn't worth it.
_BANDED_MIN_PIXELS = 1 << 18


def _shift_left(x, axis):
    """x shifted one step along axis, zero-filled at the end."""
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, 1)
    return jnp.pad(lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), pads)


def build_corner_canvas(x: jnp.ndarray, ring: bool,
                        max_quad_bytes: int | None = None):
    """Precompute the gather table for 4-corner bilinear fetches.

    x: (N, H, W, C). ring=True adds a one-pixel zero ring (grid_sample-style:
    anchors may lie in [-1, H-1]/[-1, W-1] and one-step-outside corners read
    exact zeros). Build this ONCE outside any chunk loop — round 1 measured
    180 ms/call when the canvas was rebuilt inside every scan chunk.

    Returns an opaque tuple for gather_corners."""
    n, h, w, c = x.shape
    if ring:
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    else:
        xp = x
    hp, wp = xp.shape[1], xp.shape[2]
    budget = _QUAD_CANVAS_BYTES if max_quad_bytes is None else max_quad_bytes
    # Budget the canvas at its REAL HBM cost, not the unpadded byte count:
    # the minor (lane) dim tiles to multiples of 128, so 4C=192 lanes at C=48
    # pads 1.33x; and XLA materializes the (n, hp*wp, 4C) gather operand as a
    # layout-change copy of the concat, so the canvas is resident TWICE while
    # the copy runs. Round-2 postmortem (BENCH_r02 -> .bench_fail log): the
    # unpadded estimate said 3.19 GB for the 1080p-HD 2x UP warp; the chip's
    # allocation report showed 3.97 GB (padding) + 3.96 GB (reshape copy) and
    # the stream graph OOMed at 16.39/15.75 GB.
    def _real_cost(lanes):
        lanes_pad = -(-lanes // 128) * 128
        return 2 * n * hp * wp * lanes_pad * xp.dtype.itemsize

    quad_ok = _real_cost(4 * c) <= budget
    pair = jnp.concatenate([xp, _shift_left(xp, 2)], -1)          # 2C
    if quad_ok:
        quad = jnp.concatenate([pair, _shift_left(pair, 1)], -1)  # 4C
        flat = quad.reshape(n, hp * wp, 4 * c)
    else:
        flat = pair.reshape(n, hp * wp, 2 * c)
    return (flat, quad_ok, wp, c, 1 if ring else 0)


def gather_corners(canvas, y0i: jnp.ndarray, x0i: jnp.ndarray):
    """Fetch the 4 bilinear corners anchored at integer (y0i, x0i) from a
    prebuilt canvas. Returns (v00, v01, v10, v11), each (N, ..., C): values
    at (y0, x0), (y0, x0+1), (y0+1, x0), (y0+1, x0+1)."""
    flat, quad_ok, wp, c, ring_off = canvas
    n = flat.shape[0]
    idx_shape = y0i.shape
    idx = ((y0i + ring_off) * wp + (x0i + ring_off)).reshape(n, -1, 1)
    if quad_ok:
        rows = jnp.take_along_axis(flat, idx, axis=1)
        rows = rows.reshape(idx_shape + (4, c))
        return (rows[..., 0, :], rows[..., 1, :],
                rows[..., 2, :], rows[..., 3, :])
    # pair-canvas fallback: `idx + wp` walks one canvas row below the anchor,
    # which exits the table when a ring=False caller anchors at the last row
    # (the clamped-corner case affine_bilinear_gather relies on). OOB mode
    # 'fill' would return NaN and NaN*0-weight poisons the output, so clip:
    # the re-read bottom corners carry exactly-zero weight at the clamp.
    top = jnp.take_along_axis(flat, idx, axis=1, mode="clip").reshape(
        idx_shape + (2, c))
    bot = jnp.take_along_axis(flat, idx + wp, axis=1, mode="clip").reshape(
        idx_shape + (2, c))
    return (top[..., 0, :], top[..., 1, :], bot[..., 0, :], bot[..., 1, :])


# output pixels above which the warp runs in row chunks (bounds the gathered
# corner temps at 8K scale to ~chunk * 4C elements).
_WARP_CHUNK_PIXELS = 1 << 21


def _bilinear_sample_chunk(canvas, h, w, dt, sx, sy, padding):
    """canvas: prebuilt ring corner canvas; sx/sy: (N, ...) f32 coords."""
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    # zeros mode: the ring supplies exact zeros for one-step-outside corners;
    # anchors beyond [-1, S-1] mean both corners on that axis are outside and
    # the whole sample is masked below. border mode: coords pre-clamped, so
    # the +1 corner only exits the image with weight exactly 0.
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)

    v00, v01, v10, v11 = gather_corners(canvas, y0i, x0i)

    w00 = ((1.0 - ty) * (1.0 - tx))[..., None].astype(dt)
    w01 = ((1.0 - ty) * tx)[..., None].astype(dt)
    w10 = (ty * (1.0 - tx))[..., None].astype(dt)
    w11 = (ty * tx)[..., None].astype(dt)
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11

    if padding == "zeros":
        valid = ((y0 >= -1.0) & (y0 <= h - 1.0)
                 & (x0 >= -1.0) & (x0 <= w - 1.0))
        out = jnp.where(valid[..., None], out, jnp.zeros((), dt))
    return out


# Pallas VMEM-select warp kernel dispatch (ops/pallas/warp_select.py).
# TPU-only: the kernel needs Mosaic (CPU tests exercise it via interpret
# mode in tests/test_pallas_warp_select.py, but interpret is far too slow
# for model-sized warps, so the CPU backend keeps the XLA banded path).
# ON: chip session r5 recorded a successful compile + run + parity
# envelope for the current kernel (scripts/microbench_pallas_warp.py on
# v5e: UP-shape 152.9 ms vs 360.8 XLA banded, feat-shape 41.7 vs 102.3;
# outputs within 2 bf16 ulp of the XLA path — see warp_select.py docstring
# for why bit-exactness doesn't hold on chip). The ADVICE r4 gate
# (default-off until a chip run is on record) is satisfied.
_PALLAS_WARP = True


def _use_pallas_warp():
    # ADVICE r4: this machine's tunneled TPU registers as the experimental
    # 'axon' platform — jax.default_backend() returns "axon", not "tpu", so
    # a =="tpu" gate silently disables the kernel on the exact device it
    # targets (and benches the XLA banded path while appearing to test the
    # Pallas one). Match the platform *family* instead.
    import jax
    if not _PALLAS_WARP:
        return False
    if jax.default_backend() in ("tpu", "axon"):
        return True
    try:
        d = jax.devices()[0]
        return d.platform in ("tpu", "axon") or "TPU" in str(
            getattr(d, "device_kind", ""))
    except Exception:
        return False


# batched warps above this OUTPUT byte size process items one at a time
# (lax.map): warp cost is row-count bound (~linear in batch), so splitting
# loses nothing, while the whole-array formulations' temps (quad canvas in
# the cond fallback branch, banded output copies) scale with batch and OOM —
# the pipelined stream's batch-2 UP-warp hit 23.4 GB via the batch-2 quad
# canvas (4x bf16[2,2162,3842,48] at 2.7x layout padding).
_BATCH_SPLIT_BYTES = 512 << 20


def _bilinear_sample(x: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                     padding: str) -> jnp.ndarray:
    """x: (N, H, W, C); sx/sy: (N, Ho, Wo) f32 source coords in pixel space."""
    # under an active spatial-sharding ctx (multi-chip 8K stream) the gather
    # runs shard-local with a ppermute halo exchange instead of letting GSPMD
    # all-gather the canvas (see parallel/spatial.py)
    from refvsr_tpu.parallel import spatial as _spatial
    out = _spatial.maybe_sharded_sample(x, sx, sy, padding)
    if out is not None:
        return out
    n = x.shape[0]
    out_bytes = (n * sx.shape[1] * sx.shape[2] * x.shape[-1]
                 * x.dtype.itemsize)
    if n > 1 and out_bytes >= _BATCH_SPLIT_BYTES:
        def one(args):
            xi, sxi, syi = args
            return _bilinear_sample(xi[None], sxi[None], syi[None],
                                    padding)[0]
        return lax.map(one, (x, sx, sy))
    if (padding == "zeros"
            and x.shape[0] * sx.shape[1] * sx.shape[2] >= _BANDED_MIN_PIXELS):
        from refvsr_tpu.ops.warp_banded import banded_ok, banded_sample
        # plan/exec split: banded validity depends only on coordinates, so
        # compute it in a cheap pre-pass and run the heavy band gather
        # INSIDE the cond branch — peak HBM is max(banded, fallback) instead
        # of banded-output + branch max, and a fallback-bound call skips the
        # wasted gather (r4; the pre-split layout OOMed the 1080p-HD stream
        # step at 16.02/15.75 GB, memcheck_stream).
        #
        # exactness guard: banded formulations only cover tiles whose flow
        # range fits their static select window; anything else falls back
        # whole-call. The last fallback is the CANVAS-FREE sampler: XLA
        # buffer assignment reserves max-over-branches, so a quad/pair-canvas
        # fallback would keep its multi-GB canvas in the graph's peak even
        # when never taken. Lean is ~3x slower but only runs on violent flow.
        def _lean():
            return _bilinear_sample_lean(x, sx, sy, padding)

        def _xla_banded():
            okb = banded_ok(x.shape, sy, sx, padding=padding)
            return lax.cond(
                okb, lambda: banded_sample(x, sy, sx, padding=padding)[0],
                _lean)

        if _use_pallas_warp():
            # Pallas VMEM-select kernel: band + accumulator live in VMEM, so
            # HBM sees the band once and the output once (the XLA banded
            # path re-reads band + accumulator through HBM on every select
            # pass).
            #
            # The fallback is the LEAN sampler directly — the XLA banded
            # middle branch is deliberately NOT chained in: XLA buffer
            # assignment reserves max-over-branches, and the banded band
            # block is ~3.96 GB at the UP-warp shape (chip r5 memcheck: the
            # lanes=2 stream graph held FOUR of them -> 19.4 GB compile
            # OOM). The pallas plan covers the overwhelming majority of
            # real flows (2 px/16 rows, 4 px/128 cols guaranteed spread);
            # the rare violent-flow tile pays lean's ~3x, which beats
            # carrying 4 GB of dead reserve in every graph.
            #
            # GRADIENT-SHAPE ASSUMPTION (ADVICE r4): the kernel's custom VJP
            # pulls back through the canvas-free lean sampler (~3x a banded
            # backward). Training never reaches this branch at the reference
            # recipes — the largest train-time warp is the patch-64 2x UP
            # warp, 128*128*B pixels < _BANDED_MIN_PIXELS for B<=16 — so the
            # slow pullback only ever runs on eval-sized grad probes. If a
            # future recipe trains at >=2^18-pixel warps, bench the pullback
            # first or route it through banded_sample when its plan is ok.
            from refvsr_tpu.ops.pallas.warp_select import (
                pallas_banded_ok, pallas_banded_sample)
            okp = pallas_banded_ok(x.shape, sy, sx, padding=padding)
            return lax.cond(
                okp,
                lambda: pallas_banded_sample(x, sy, sx, padding=padding),
                _lean)
        return _xla_banded()
    return _bilinear_sample_quad(x, sx, sy, padding)


def _bilinear_sample_lean(x: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                          padding: str) -> jnp.ndarray:
    """Canvas-free exact sampler: four separate row gathers per chunk with
    per-corner zeros masking (grid_sample semantics). ~4x the gathered rows
    of the quad path but ZERO resident canvas — the cond-fallback memory
    profile. Chunked like the quad path to bound corner temps."""
    n, h, w, c = x.shape
    ho, wo = sx.shape[1], sx.shape[2]
    sx = sx.astype(jnp.float32)
    sy = sy.astype(jnp.float32)
    if padding == "border":
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)
    flat = x.reshape(n, h * w, c)
    dt = x.dtype

    def sample_chunk(cx, cy):
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        tx = cx - x0
        ty = cy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(yi, xi):
            idx = (jnp.clip(yi, 0, h - 1) * w
                   + jnp.clip(xi, 0, w - 1)).reshape(n, -1, 1)
            v = jnp.take_along_axis(flat, idx, axis=1).reshape(
                yi.shape + (c,))
            if padding == "zeros":
                inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
                v = jnp.where(inside[..., None], v, jnp.zeros((), dt))
            return v

        out = (corner(y0i, x0i) * ((1 - ty) * (1 - tx))[..., None].astype(dt)
               + corner(y0i, x0i + 1) * ((1 - ty) * tx)[..., None].astype(dt)
               + corner(y0i + 1, x0i) * (ty * (1 - tx))[..., None].astype(dt)
               + corner(y0i + 1, x0i + 1) * (ty * tx)[..., None].astype(dt))
        if padding == "zeros":
            # non-finite coords give NaN *weights*, which the per-corner
            # value masking can't catch (NaN * 0 = NaN) — mask the output
            # like the quad/banded paths (torch grid_sample yields 0 there)
            valid = ((y0 >= -1.0) & (y0 <= h - 1.0)
                     & (x0 >= -1.0) & (x0 <= w - 1.0))
            out = jnp.where(valid[..., None], out, jnp.zeros((), dt))
        return out

    if n * ho * wo <= _WARP_CHUNK_PIXELS:
        return sample_chunk(sx, sy)

    rows_per = max(1, _WARP_CHUNK_PIXELS // (n * wo))
    num_chunks = -(-ho // rows_per)
    pad_rows = num_chunks * rows_per - ho
    if pad_rows:
        sx = jnp.pad(sx, [(0, 0), (0, pad_rows), (0, 0)])
        sy = jnp.pad(sy, [(0, 0), (0, pad_rows), (0, 0)])
    sx_t = sx.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)
    sy_t = sy.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)

    def step(_, coords):
        cx, cy = coords
        # fully-flattened 1-D chunks: see _bilinear_sample_quad's scan note
        return None, sample_chunk(cx, cy).reshape(n * rows_per * wo * c)

    _, outs = lax.scan(step, None, (sx_t, sy_t))
    outs = outs.reshape(num_chunks, n, rows_per, wo, c)
    outs = outs.transpose(1, 0, 2, 3, 4).reshape(n, num_chunks * rows_per,
                                                 wo, c)
    return outs[:, :ho]


def _bilinear_sample_quad(x: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                          padding: str) -> jnp.ndarray:
    """Quad-canvas row-gather formulation (one gathered row per output
    pixel; see module docstring)."""
    n, h, w, c = x.shape
    ho, wo = sx.shape[1], sx.shape[2]
    sx = sx.astype(jnp.float32)
    sy = sy.astype(jnp.float32)
    if padding == "border":
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)

    canvas = build_corner_canvas(x, ring=True)
    if n * ho * wo <= _WARP_CHUNK_PIXELS:
        return _bilinear_sample_chunk(canvas, h, w, x.dtype, sx, sy, padding)

    rows_per = max(1, _WARP_CHUNK_PIXELS // (n * wo))
    num_chunks = -(-ho // rows_per)
    pad_rows = num_chunks * rows_per - ho
    if pad_rows:
        sx = jnp.pad(sx, [(0, 0), (0, pad_rows), (0, 0)])
        sy = jnp.pad(sy, [(0, 0), (0, pad_rows), (0, 0)])
    sx_t = sx.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)
    sy_t = sy.reshape(n, num_chunks, rows_per, wo).transpose(1, 0, 2, 3)

    def step(_, coords):
        cx, cy = coords
        out = _bilinear_sample_chunk(canvas, h, w, x.dtype, cx, cy, padding)
        # flatten FULLY to 1-D: a stacked (..., wo, C) scan output would carry
        # the C->128 lane padding (2.67x HBM at C=48), and a (n=1, K) chunk
        # would pad the size-1 second-minor sublane dim 2x (the 1.5 GB
        # AllocateBuffer in the round-2 1080p OOM report) — (K,) chunks stack
        # to (chunks, K) which tiles cleanly
        return None, out.reshape(n * rows_per * wo * c)

    _, outs = lax.scan(step, None, (sx_t, sy_t))
    outs = outs.reshape(num_chunks, n, rows_per, wo, c)
    outs = outs.transpose(1, 0, 2, 3, 4).reshape(n, num_chunks * rows_per,
                                                 wo, c)
    return outs[:, :ho]


def warp_coords(in_hw, flow):
    """Source pixel coords (sx, sy) of RefVSR's propagation warp
    (models/utils.py:35-43): base grid linspace(-1,1) over the FLOW's grid,
    flow normalized by the INPUT half-extent, unnormalized
    align_corners=False against the input extent. Single source of truth —
    the banded-warp bench and parity tests use it too."""
    h, w = in_hw
    ho, wo = flow.shape[1], flow.shape[2]
    gy, gx = np.meshgrid(np.arange(ho, dtype=np.float32),
                         np.arange(wo, dtype=np.float32), indexing="ij")
    # x_norm = -1 + 2*gx/(Wo-1) + 2*fx/(W-1); src_x = ((x_norm + 1) * W - 1) / 2
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xn = gx[None] * (2.0 / max(wo - 1, 1)) + fx * (2.0 / max(w - 1, 1)) - 1.0
    yn = gy[None] * (2.0 / max(ho - 1, 1)) + fy * (2.0 / max(h - 1, 1)) - 1.0
    sx = ((xn + 1.0) * w - 1.0) * 0.5
    sy = ((yn + 1.0) * h - 1.0) * 0.5
    return sx, sy


def warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """RefVSR's propagation warp (models/utils.py:35-43 semantics).

    x: (N, H, W, C); flow: (N, Ho, Wo, 2) pixel-space (fx, fy). The output
    spatial size follows the *flow* (the reference warps low-res features onto
    a 2x grid at RefVSR.py:220,254 this way); zeros padding."""
    sx, sy = warp_coords(x.shape[1:3], flow)
    return _bilinear_sample(x, sx, sy, padding="zeros")


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, padding: str = "border") -> jnp.ndarray:
    """mmedit flow_warp semantics (align_corners=True): src = i + f, border
    padding. x: (N, H, W, C); flow: (N, H, W, 2) pixel-space (fx, fy)."""
    n, h, w, _ = x.shape
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    sx = gx[None] + flow[..., 0].astype(jnp.float32)
    sy = gy[None] + flow[..., 1].astype(jnp.float32)
    return _bilinear_sample(x, sx, sy, padding=padding)
