"""Halo-bounded spatial (H-axis) sharding for the 8K streaming path.

Round-1 HLO inspection (docs/ROUND1_NOTES.md) showed GSPMD handling convs
well under H-sharding (collective-permute halo exchanges) but ALL-GATHERING
every warp/affine gather canvas — multi-GB per frame over ICI at 8K, because
arbitrary gather indices defeat the partitioner. This module makes the gather
paths shard-local:

  * ``sharded_bilinear_sample`` — the two grid_sample-style warps
    (ops/warp.py) with an explicit ``jax.lax.ppermute`` halo exchange of
    ``halo`` rows per neighbor. Row reads beyond the halo CLAMP to the halo
    edge (border-extend). Exactness bound: outputs are bit-identical to the
    unsharded warp whenever every sampled source row lies within ``halo``
    rows of the output shard (|flow_y| <= halo - 2 in source pixels); SPyNet
    flows on RealMCVSR are far below the default.
  * ``sharded_affine_gather`` — AlignedConv2d's clamped-corner patch sampler
    (models/matching.py:affine_bilinear_gather). Tap offsets are *strictly*
    bounded: |rot| <= sqrt(2) * (ks/2 + 0.5) * 3 (affine clip, alignment.py
    semantics) + (ks-1)/2 + 0.5 anchor offset, so with the default halo the
    sharded result is parity-EXACT, not approximate.
  * ``sharded_argmax_matmul`` — the matching argmax with the lr rows sharded
    and the (small) ref patch table replicated; each shard runs the Pallas
    streaming-argmax kernel (TPU) or the XLA scan (CPU tests) locally,
    lifting round 1's ``device_count()==1`` Pallas gate.

Activation is explicit and trace-scoped: wrap the *construction* (tracing) of
a jitted step in ``with spatial_sharding(mesh, halo):``. The ops consult the
context at trace time only; programs traced without the context are
unaffected. Used by __graft_entry__'s spatial dryrun and the multi-chip
serving path."""

from __future__ import annotations

from contextlib import contextmanager
from typing import NamedTuple, Optional

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map


class SpatialCtx(NamedTuple):
    mesh: object
    halo: int = 32


_CTX: Optional[SpatialCtx] = None


@contextmanager
def spatial_sharding(mesh, halo: int = 32):
    """Trace-scoped activation of shard-local gathers (see module docstring).

    The ops consult this context at TRACE time, which jax's cross-wrapper
    jit/lowering caches know nothing about — a function traced outside the
    ctx would be silently reused inside it (and vice versa). Entering/exiting
    therefore drops the in-memory trace caches; the persistent XLA compile
    cache is keyed on the HLO itself and is unaffected."""
    global _CTX
    prev = _CTX
    _CTX = SpatialCtx(mesh, halo)
    jax.clear_caches()
    try:
        yield _CTX
    finally:
        _CTX = prev
        jax.clear_caches()


def active() -> Optional[SpatialCtx]:
    """The current spatial ctx, or None. Only 'real' (spatial axis > 1)
    contexts are reported."""
    if _CTX is not None and _CTX.mesh.shape.get("spatial", 1) > 1:
        return _CTX
    return None


def _shardable(n_rows: int, s: int, halo: int) -> bool:
    return n_rows % s == 0 and n_rows // s >= halo


def halo_exchange_rows(x_l, halo: int, s: int, axis_name: str = "spatial"):
    """x_l: (N, Hs, W, C) local shard -> (N, Hs + 2*halo, W, C) extended with
    neighbor rows; zero-filled beyond the global edges (matches the zero ring
    of grid_sample 'zeros' padding)."""
    # shard i's bottom halo = shard i+1's top rows; shard i's top halo =
    # shard i-1's bottom rows. ppermute leaves non-receivers at zero.
    bot = lax.ppermute(x_l[:, :halo], axis_name,
                       [(i, i - 1) for i in range(1, s)])
    top = lax.ppermute(x_l[:, -halo:], axis_name,
                       [(i, i + 1) for i in range(s - 1)])
    return jnp.concatenate([top, x_l, bot], axis=1)


# ---------------------------------------------------------------------------
# warp (grid_sample semantics) — see ops/warp.py for the canvas formulation
# ---------------------------------------------------------------------------

def sharded_bilinear_sample(x, sx, sy, padding: str, ctx: SpatialCtx):
    """Shard-local counterpart of ops.warp._bilinear_sample.

    x: (N, H, W, C) H-sharded over ctx.mesh's 'spatial' axis; sx/sy:
    (N, Ho, Wo) global source coords, Ho-sharded. Requires H and Ho divisible
    by the axis size with H//s >= halo (caller guards via `_shardable`)."""
    from refvsr_tpu.ops.warp import build_corner_canvas, gather_corners

    mesh, halo = ctx.mesh, ctx.halo
    s = mesh.shape["spatial"]
    n, h, w, c = x.shape
    hs = h // s
    dt = x.dtype

    def local(x_l, sx_l, sy_l):
        idx = lax.axis_index("spatial")
        off = idx * hs - halo        # global row of extended local row 0
        xe = halo_exchange_rows(x_l, halo, s)
        canvas = build_corner_canvas(xe, ring=True)

        sx_f = sx_l.astype(jnp.float32)
        sy_f = sy_l.astype(jnp.float32)
        if padding == "border":
            sx_f = jnp.clip(sx_f, 0.0, w - 1.0)
            sy_f = jnp.clip(sy_f, 0.0, h - 1.0)
        x0 = jnp.floor(sx_f)
        y0 = jnp.floor(sy_f)
        tx = sx_f - x0
        ty = sy_f - y0
        x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
        # global clamp first (grid_sample semantics), then localize. The ring
        # row below the extended bottom supplies zeros only at the true global
        # edge; interior shards clamp into the halo instead (lo=0) so a
        # beyond-halo read border-extends rather than reading a bogus zero.
        y0g = jnp.clip(y0.astype(jnp.int32), -1, h - 1)
        lo = jnp.where(idx == 0, -1, 0)
        y0l = jnp.clip(y0g - off, lo, hs + 2 * halo - 1)

        v00, v01, v10, v11 = gather_corners(canvas, y0l, x0i)
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

    spec_x = P(None, "spatial", None, None)
    spec_c = P(None, "spatial", None)
    f = shard_map(local, mesh=mesh, in_specs=(spec_x, spec_c, spec_c),
                  out_specs=P(None, "spatial", None, None), check_vma=False)
    return f(x, sx, sy)


def maybe_sharded_sample(x, sx, sy, padding: str):
    """Route to the sharded sampler when a spatial ctx is active and the
    shapes divide cleanly; returns None otherwise (caller falls back)."""
    ctx = active()
    if ctx is None:
        return None
    s = ctx.mesh.shape["spatial"]
    if not (_shardable(x.shape[1], s, ctx.halo)
            and sx.shape[1] % s == 0):
        return None
    return sharded_bilinear_sample(x, sx, sy, padding, ctx)


# ---------------------------------------------------------------------------
# AlignedConv2d's clamped-corner affine gather
# ---------------------------------------------------------------------------

def sharded_affine_fold(x, pad: int, p_row, p_col, ks: int, min_halo: int,
                        ctx: SpatialCtx):
    """Shard-local AlignedConv2d affine sampler + fold, H-sharded output.

    x: (N, Hx, Wx, C) UNpadded canvas, H-sharded; p_row/p_col: (N, gh, gw,
    ks*ks) f32 REPLICATED coords into the reflection-padded canvas (Hp = Hx
    + 2*pad; the affine grid is small — 270x480x64 f32 = 33 MB at 8K — so
    replication is the cheap side). Every call site has Hx == gh*ks
    (kernel == stride), so the folded output (N, gh*ks, gw*ks, C) shares x's
    sharding. Grid rows rarely divide the shard count: each shard computes a
    PADDED chunk of ceil(gh/s) grid rows and an edge exchange re-shards the
    fold to even rows (same machinery as sharded_patch_warp). Parity-exact
    while every tap stays within `min_halo` rows of its grid anchor —
    statically true for AlignedConv2d's clipped affine params."""
    from refvsr_tpu.ops.warp import build_corner_canvas, gather_corners

    mesh = ctx.mesh
    s = mesh.shape["spatial"]
    n, hx, wx, c = x.shape
    hp, wp = hx + 2 * pad, wx + 2 * pad
    gh, gw = p_row.shape[1], p_row.shape[2]
    hs = hx // s
    gh_loc = -(-gh // s)
    d = gh_loc * ks - hs                  # per-shard output-row surplus
    halo = d * s + min_halo + pad
    gh_pad = gh_loc * s
    if gh_pad != gh:
        # padded grid rows read clamped in-range coords (value 1.0 -> real
        # canvas rows, garbage but finite); the re-shard crop discards them
        cfg = [(0, 0), (0, gh_pad - gh), (0, 0), (0, 0)]
        p_row = jnp.pad(p_row, cfg, constant_values=1.0)
        p_col = jnp.pad(p_col, cfg, constant_values=1.0)
    dt = x.dtype

    def local(x_l, pr_full, pc_full):
        from refvsr_tpu.models.matching import _affine_corner_weights
        k = lax.axis_index("spatial")
        # W pad (reflect) is fully local; H halos exchanged on the W-padded
        # rows, then the global reflect rows are patched in at static slots.
        xw = jnp.pad(x_l, [(0, 0), (0, 0), (pad, pad), (0, 0)],
                     mode="reflect")
        xe = halo_exchange_rows(xw, halo, s)
        # extended row e holds padded-canvas row off+e, off = k*hs+pad-halo
        off = k * hs + pad - halo
        # shard 0: padded row j (j < pad) = reflect x[pad-j]; extended slot
        # = j - off = halo - pad + j (static)
        for j in range(pad):
            src = xw[:, pad - j]
            slot = halo - pad + j
            xe = xe.at[:, slot].set(jnp.where(k == 0, src, xe[:, slot]))
        # last shard: padded row hx+pad+j = reflect x[hx-2-j]; extended slot
        # = (hx+pad+j) - off = hs + halo + j (static)
        for j in range(pad):
            src = xw[:, hs - 2 - j]
            slot = hs + halo + j
            xe = xe.at[:, slot].set(jnp.where(k == s - 1, src, xe[:, slot]))

        canvas = build_corner_canvas(xe, ring=False)

        # my chunk's grid rows, sliced from the replicated coords
        pr = lax.dynamic_slice_in_dim(pr_full, k * gh_loc, gh_loc, axis=1)
        pc = lax.dynamic_slice_in_dim(pc_full, k * gh_loc, gh_loc, axis=1)
        ltr, ltc, w00, w01, w10, w11 = _affine_corner_weights(hp, wp, pr, pc)
        ltr_l = jnp.clip(ltr - off, 0, hs + 2 * halo - 1)
        v00, v01, v10, v11 = gather_corners(canvas, ltr_l, ltc)
        out = (v00 * w00[..., None].astype(dt)
               + v01 * w01[..., None].astype(dt)
               + v10 * w10[..., None].astype(dt)
               + v11 * w11[..., None].astype(dt))

        # fold (alignment.py:172-178) on the padded chunk, then re-shard
        out = out.reshape(n, gh_loc, gw, ks, ks, c).transpose(0, 1, 3, 2, 4,
                                                              5)
        out = out.reshape(n, gh_loc * ks, gw * ks, c)
        return _reshard_chunks_to_rows(out, d, k, hs, s)

    spec4 = P(None, "spatial", None, None)
    f = shard_map(local, mesh=mesh, in_specs=(spec4, P(), P()),
                  out_specs=spec4, check_vma=False)
    return f(x, p_row, p_col)


def maybe_sharded_affine_fold(x, pad: int, p_row, p_col, ks: int,
                              min_halo: int):
    """Route AlignedConv2d's gather+fold to the shard-local path when a
    spatial ctx is active and the geometry fits; None otherwise."""
    ctx = active()
    if ctx is None:
        return None
    s = ctx.mesh.shape["spatial"]
    n, hx, wx, c = x.shape
    gh, gw = p_row.shape[1], p_row.shape[2]
    if hx != gh * ks or wx != gw * ks or hx % s:
        return None
    hs = hx // s
    d = (-(-gh // s)) * ks - hs
    if d * s + min_halo + pad > hs:
        return None
    return sharded_affine_fold(x, pad, p_row, p_col, ks, min_halo, ctx)


# ---------------------------------------------------------------------------
# AlignedAttention's patch warp (unfold -> index gather -> fold)
# ---------------------------------------------------------------------------

def _reshard_chunks_to_rows(img, d_rows: int, k, hs: int, s: int):
    """img: (N, rows_loc, W, C) in PADDED-chunk layout (chunk k holds global
    rows [rows_loc*k, rows_loc*(k+1)), rows_loc = hs + d_rows). Returns the
    even hs-row shard layout (global rows [hs*k, hs*(k+1))): chunk k's rows
    start d_rows*k rows BEFORE it, pulled from the previous shard's bottom
    edge. d_rows*s rows of exchange, exact."""
    if d_rows == 0:
        return img
    hr = d_rows * s
    ext = halo_exchange_rows(img, hr, s)
    return lax.dynamic_slice_in_dim(ext, hr - d_rows * k, hs, axis=1)


def sharded_patch_warp(value, index_map, ks: int, out_hw, ctx: SpatialCtx):
    """Shard-local unfold -> global-index patch gather -> fold, H-sharded.

    The reference semantics (attention.py:118-144 via ops/patches.py): value
    (N, Hv, Wv, C) is cut into a (ghv, gwv) = (Hv/ks, Wv/ks) grid of
    non-overlapping ks x ks patches; output patch p (on the (gho, gwo) =
    (Ho/ks, Wo/ks) OUTPUT grid) = table row index_map[p]; the fold is a pure
    reshape. The index map is a GLOBAL argmax, so output shards read
    arbitrary table rows — under GSPMD that replicates the frame-sized patch
    table (a 1-2 GB all-gather at 8K, scripts/debug_8k_allgather.py). Here
    the table stays sharded and ROTATES around the ring (s ppermute steps);
    each shard accumulates the rows it owns the indices for. Peak memory is
    two table chunks instead of the whole table; ICI traffic equals the
    one-shot all-gather's.

    Geometry: source and output grids are independent (HD-in aa2 reads a
    1080-row value onto a 2160-row canvas). Grid rows rarely divide the
    shard count, so both sides use chunks PADDED to ceil(g/s) grid rows: the
    source side absorbs the drift between image shards and patch-aligned
    chunks with a bottom halo exchange (value H is pre-padded by the caller
    when H itself doesn't divide s), and the output side re-shards the
    folded chunks back to even Ho/s rows with an edge exchange. Exact for
    any index map."""
    mesh = ctx.mesh
    s = mesh.shape["spatial"]
    n, hv, wv, c = value.shape
    ho, wo = out_hw
    ghv, gwv = hv // ks, wv // ks
    gho, gwo = ho // ks, wo // ks
    hs_v, hs_o = hv // s, ho // s
    ghv_loc = -(-ghv // s)
    gho_loc = -(-gho // s)
    lv_chunk = ghv_loc * gwv
    lo_chunk = gho_loc * gwo
    lo_real = gho * gwo
    # source side: chunk k starts AT or BELOW the local shard start
    # (dv*k >= 0) and ends at most halo_v rows past the local end, so only a
    # BOTTOM halo of exactly halo_v rows is ever read (ctx.halo is
    # irrelevant here — and may exceed hs, which halo_exchange_rows can't
    # serve)
    halo_v = ghv_loc * s * ks - hv
    dv = ghv_loc * ks - hs_v             # per-shard source-row surplus
    do = gho_loc * ks - hs_o             # per-shard output-row surplus
    dt = value.dtype

    def local(v_l, idx_l):
        k = lax.axis_index("spatial")

        # ---- build my patch-aligned table chunk from local rows + halo
        xe = halo_exchange_rows(v_l, halo_v, s) if halo_v else v_l
        # chunk k's source rows start at ghv_loc*ks*k; extended row 0 is
        # global row hs_v*k - halo_v
        off = dv * k + halo_v
        band = lax.dynamic_slice_in_dim(xe, off, ghv_loc * ks, axis=1)
        tbl = band.reshape(n, ghv_loc, ks, gwv, ks, c)
        tbl = tbl.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, lv_chunk, ks * ks * c)

        # ---- my output indices, in the padded-aligned output layout: the
        # index map is tiny (L int32), so one small all-gather + slice
        idx_full = lax.all_gather(idx_l, "spatial", axis=1, tiled=True)
        idx_full = jnp.pad(idx_full, [(0, 0), (0, s * lo_chunk - lo_real)])
        idx_my = lax.dynamic_slice_in_dim(idx_full, k * lo_chunk, lo_chunk,
                                          axis=1)
        # owner chunk + in-chunk row of each wanted table entry
        owner = (idx_my // gwv) // ghv_loc
        loc = idx_my - owner * lv_chunk

        # ---- ring rotation: at step t I hold chunk (k + t) % s
        def step(t, carry):
            tbl_t, out = carry
            src = (k + t) % s
            sel = owner == src
            g = jnp.take_along_axis(
                tbl_t, jnp.clip(loc, 0, lv_chunk - 1)[..., None], axis=1)
            out = out + jnp.where(sel[..., None], g, jnp.zeros((), dt))
            tbl_t = lax.ppermute(tbl_t, "spatial",
                                 [(i, (i - 1) % s) for i in range(s)])
            return tbl_t, out

        out0 = jnp.zeros((n, lo_chunk, ks * ks * c), dt)
        # the last rotation's ppermute is wasted but keeps the loop uniform
        _, out_tbl = lax.fori_loop(0, s, step, (tbl, out0))

        # ---- fold my chunk back to image rows (padded-aligned layout)
        img = out_tbl.reshape(n, gho_loc, gwo, ks, ks, c)
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, gho_loc * ks, wo, c)
        return _reshard_chunks_to_rows(img, do, k, hs_o, s)

    spec_v = P(None, "spatial", None, None)
    f = shard_map(local, mesh=mesh, in_specs=(spec_v, P(None, "spatial")),
                  out_specs=spec_v, check_vma=False)
    return f(value, index_map)


def maybe_sharded_patch_warp(value, index_map, kernel: int, stride: int,
                             out_hw):
    """Route AlignedAttention's unfold/gather/fold to the ring-sharded path
    when a spatial ctx is active and the call matches the shardable geometry
    (non-overlapping kernel==stride, 'same' pad a no-op, rows divide);
    returns None otherwise. Value H that doesn't divide the shard count is
    zero-padded up front (appended patch-grid rows are never indexed)."""
    ctx = active()
    if ctx is None:
        return None
    s = ctx.mesh.shape["spatial"]
    n, hv, wv, c = value.shape
    ho, wo = out_hw
    if kernel != stride or hv % kernel or wv % kernel:
        return None
    if ho % kernel or wo % kernel or ho % s or index_map.shape[1] % s:
        return None
    if hv % s:
        # pad H to a multiple of lcm(kernel, s): appended rows form garbage
        # patches BEYOND the real grid (flat index >= ghv*gwv) which the
        # index map can never reference
        step = kernel * s // np.gcd(kernel, s)
        hv_p = -(-hv // step) * step
        if (hv_p - hv) > hv // s:
            return None
        value = jnp.pad(value, [(0, 0), (0, hv_p - hv), (0, 0), (0, 0)])
        hv = hv_p
    hs_v, hs_o = hv // s, ho // s
    if (-(-(hv // kernel) // s)) * s * kernel - hv > hs_v:
        return None   # source drift must fit a single-neighbor exchange
    if ((-(-(ho // kernel) // s)) * kernel - hs_o) * s > hs_o:
        return None   # output re-shard drift likewise
    return sharded_patch_warp(value, index_map, kernel, out_hw, ctx)


# ---------------------------------------------------------------------------
# AlignedConv2d's strided affine-head conv (stride may exceed the kernel,
# which GSPMD's windowed-op partitioner refuses — it all-gathered the 1 GB
# canvas-sized input at 8K geometry)
# ---------------------------------------------------------------------------

def sharded_strided_conv_small(x, kernel, bias, stride: int, pad: int,
                               ctx: SpatialCtx):
    """k x k / stride-s conv with H-sharded input and REPLICATED output.

    For AlignedConv2d's p_conv_0 (alignment.py:19 semantics: torch Conv2d,
    zero 'same'-ish padding `pad`): the output lives on the small affine
    grid (H/stride rows — 270x480x32 at 8K), so replicating it costs a ~16 MB
    all-gather while keeping the canvas-sized input fully sharded. Output
    grid rows are chunked to ceil(gh/s) per shard; a halo exchange covers
    both the conv receptive field and the chunk/shard drift."""
    mesh = ctx.mesh
    s = mesh.shape["spatial"]
    n, h, w, c = x.shape
    kh = kernel.shape[0]
    gh = (h + 2 * pad - kh) // stride + 1
    gw = (w + 2 * pad - kh) // stride + 1
    hs = h // s
    gh_loc = -(-gh // s)
    d_rows = gh_loc * stride - hs
    # band for chunk k: unpadded source rows [stride*gh_loc*k - pad,
    # ... + (gh_loc-1)*stride + kh)
    band_rows = (gh_loc - 1) * stride + kh
    halo = max(pad, stride * gh_loc * s - h + kh - stride - pad)
    dt = x.dtype

    def local(x_l):
        k = lax.axis_index("spatial")
        xe = halo_exchange_rows(x_l, halo, s)   # zero fill == conv zero pad
        off = d_rows * k + halo - pad
        band = lax.dynamic_slice_in_dim(xe, off, band_rows, axis=1)
        band = jnp.pad(band, [(0, 0), (0, 0), (pad, pad), (0, 0)])
        out = lax.conv_general_dilated(
            band, kernel.astype(dt), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)
        if bias is not None:
            out = out + bias.astype(dt)
        full = lax.all_gather(out, "spatial", axis=1, tiled=True)
        return full[:, :gh]

    f = shard_map(local, mesh=mesh, in_specs=(P(None, "spatial", None, None),),
                  out_specs=P(), check_vma=False)
    return f(x)


def maybe_sharded_strided_conv_small(x, kernel, bias, stride: int, pad: int):
    ctx = active()
    if ctx is None:
        return None
    s = ctx.mesh.shape["spatial"]
    n, h, w, c = x.shape
    if h % s:
        return None
    hs = h // s
    kh = kernel.shape[0]
    gh = (h + 2 * pad - kh) // stride + 1
    gh_loc = -(-gh // s)
    halo = max(pad, stride * gh_loc * s - h + kh - stride - pad)
    if halo > hs or (gh_loc - 1) * stride + kh > hs + 2 * halo:
        return None
    return sharded_strided_conv_small(x, kernel, bias, stride, pad, ctx)


# ---------------------------------------------------------------------------
# matching argmax
# ---------------------------------------------------------------------------

def sharded_argmax_matmul(ref_p, lr_p, ctx: SpatialCtx, use_pallas: bool):
    """max/argmax over ref patches with lr rows sharded over 'spatial'.

    ref_p: (N, L_ref, D) replicated (small — 16ch match features); lr_p:
    (N, L_lr, D) with L_lr H-major, sharded. The argmax over ref positions is
    global by design, so the ref table rides one small all-gather while the
    L_lr-sized work and outputs stay sharded."""
    mesh = ctx.mesh

    def local(ref_l, lr_l):
        if use_pallas:
            from refvsr_tpu.ops.pallas.matching_kernel import \
                pallas_argmax_matmul
            return pallas_argmax_matmul(ref_l, lr_l)
        from refvsr_tpu.models.matching import tiled_argmax_matmul
        return tiled_argmax_matmul(ref_l, lr_l)

    f = shard_map(local, mesh=mesh,
                  in_specs=(P(), P(None, "spatial", None)),
                  out_specs=(P(None, "spatial"), P(None, "spatial")),
                  check_vma=False)
    return f(ref_p, lr_p)


def maybe_sharded_argmax(ref_p, lr_p, use_pallas: bool):
    ctx = active()
    if ctx is None:
        return None
    s = ctx.mesh.shape["spatial"]
    if lr_p.shape[1] % s:
        return None
    return sharded_argmax_matmul(ref_p, lr_p, ctx, use_pallas)
