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

def sharded_affine_gather(x, pad: int, p_row, p_col, ctx: SpatialCtx):
    """Shard-local counterpart of models.matching.affine_bilinear_gather over
    the reflection-padded canvas, H-sharded. x: (N, Hx, Wx, C) UNpadded;
    p_row/p_col: (N, gh, gw, ntaps) coords into the *padded* canvas
    (Hp = Hx + 2*pad). gh sharded. Parity-exact while every tap stays within
    `halo` rows of its anchor block (statically true for AlignedConv2d's
    bounded affine taps with the default halo)."""
    from refvsr_tpu.ops.warp import build_corner_canvas, gather_corners

    mesh, halo = ctx.mesh, ctx.halo
    s = mesh.shape["spatial"]
    n, hx, wx, c = x.shape
    hp, wp = hx + 2 * pad, wx + 2 * pad
    hs = hx // s
    dt = x.dtype

    def local(x_l, pr, pc):
        idx = lax.axis_index("spatial")
        # W pad (reflect) is fully local; H halos exchanged on the W-padded
        # rows, then the global reflect rows are patched in at static slots.
        xw = jnp.pad(x_l, [(0, 0), (0, 0), (pad, pad), (0, 0)],
                     mode="reflect")
        xe = halo_exchange_rows(xw, halo, s)
        # extended row e holds padded-canvas row off+e, off = idx*hs+pad-halo
        off = idx * hs + pad - halo
        # shard 0: padded row j (j < pad) = reflect x[pad-j]; extended slot
        # = j - off = halo - pad + j (static)
        for j in range(pad):
            src = xw[:, pad - j]
            slot = halo - pad + j
            xe = xe.at[:, slot].set(
                jnp.where(idx == 0, src, xe[:, slot]))
        # last shard: padded row hx+pad+j = reflect x[hx-2-j]; extended slot
        # = (hx+pad+j) - off = hs + halo + j (static)
        for j in range(pad):
            src = xw[:, hs - 2 - j]
            slot = hs + halo + j
            xe = xe.at[:, slot].set(
                jnp.where(idx == s - 1, src, xe[:, slot]))

        canvas = build_corner_canvas(xe, ring=False)

        lt_row = jnp.floor(pr)
        lt_col = jnp.floor(pc)
        rb_row, rb_col = lt_row + 1, lt_col + 1
        lt_row_c = jnp.clip(lt_row, 0, hp - 1)
        lt_col_c = jnp.clip(lt_col, 0, wp - 1)
        rb_row_c = jnp.clip(rb_row, 0, hp - 1)
        rb_col_c = jnp.clip(rb_col, 0, wp - 1)
        p_row_c = jnp.clip(pr, 0, hp - 1)
        p_col_c = jnp.clip(pc, 0, wp - 1)

        g_lt = (1 + (lt_row_c - p_row_c)) * (1 + (lt_col_c - p_col_c))
        g_rb = (1 - (rb_row_c - p_row_c)) * (1 - (rb_col_c - p_col_c))
        g_lb = (1 + (lt_row_c - p_row_c)) * (1 - (rb_col_c - p_col_c))
        g_rt = (1 - (rb_row_c - p_row_c)) * (1 + (lt_col_c - p_col_c))
        cx = (rb_col_c == lt_col_c).astype(g_lt.dtype)
        cy = (rb_row_c == lt_row_c).astype(g_lt.dtype)
        w00 = g_lt + cx * g_lb + cy * g_rt + cx * cy * g_rb
        w01 = (1 - cx) * (g_lb + cy * g_rb)
        w10 = (1 - cy) * (g_rt + cx * g_rb)
        w11 = (1 - cx) * (1 - cy) * g_rb

        ltr_l = jnp.clip(lt_row_c.astype(jnp.int32) - off, 0,
                         hs + 2 * halo - 1)
        v00, v01, v10, v11 = gather_corners(
            canvas, ltr_l, lt_col_c.astype(jnp.int32))
        return (v00 * w00[..., None].astype(dt)
                + v01 * w01[..., None].astype(dt)
                + v10 * w10[..., None].astype(dt)
                + v11 * w11[..., None].astype(dt))

    spec4 = P(None, "spatial", None, None)
    f = shard_map(local, mesh=mesh, in_specs=(spec4, spec4, spec4),
                  out_specs=P(None, "spatial", None, None, None),
                  check_vma=False)
    return f(x, p_row, p_col)


def maybe_sharded_affine_gather(x, pad: int, p_row, p_col,
                                min_halo: int = 0):
    """min_halo: the caller's static tap-displacement bound — the effective
    halo is raised to it so the affine path stays parity-exact regardless of
    the configured ctx.halo."""
    ctx = active()
    if ctx is None:
        return None
    halo = max(ctx.halo, min_halo)
    ctx = SpatialCtx(ctx.mesh, halo)
    s = ctx.mesh.shape["spatial"]
    if not (_shardable(x.shape[1], s, halo) and p_row.shape[1] % s == 0):
        return None
    return sharded_affine_gather(x, pad, p_row, p_col, ctx)


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
