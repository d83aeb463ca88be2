"""Pallas TPU kernel: streaming cosine-similarity max/argmax (the matching
hot spot, SURVEY.md §7 hard part (b)).

Computes, for each LR patch vector, the max and argmax over all reference
patch vectors of their dot product — i.e. row-wise max of ref_p @ lr_p^T —
flash-attention-style: the (L_ref x L_lr) similarity matrix is produced tile
by tile on the MXU and reduced in VMEM; it never exists in HBM. The XLA scan
fallback (matching.py:tiled_argmax_matmul) keeps a (2, L_lr) carry in HBM per
tile step; this kernel keeps the running (max, argmax) resident in VMEM
across the ref-tile grid dimension.

Grid: (B, n_lr_tiles, n_ref_tiles), ref innermost so the output block for a
given (batch, lr-tile) stays in VMEM while ref tiles stream through."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(l_ref_total, tile_ref, lr_block, ref_block, val_out, idx_out):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        val_out[:] = jnp.full_like(val_out, -jnp.inf)
        idx_out[:] = jnp.zeros_like(idx_out)

    # (TL, D) x (D, TR) on the MXU, f32 accumulate
    sim = jax.lax.dot_general(
        lr_block[0], ref_block[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TL, TR)

    # mask padded ref rows
    col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + j * tile_ref
    sim = jnp.where(col_ids < l_ref_total, sim, -jnp.inf)

    tile_max = jnp.max(sim, axis=1, keepdims=True)               # (TL, 1)
    tile_arg = (jnp.argmax(sim, axis=1).astype(jnp.int32)
                + j * tile_ref)[:, None]                          # (TL, 1)

    best = val_out[0]
    upd = tile_max > best
    val_out[0] = jnp.where(upd, tile_max, best)
    idx_out[0] = jnp.where(upd, tile_arg, idx_out[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_argmax_matmul(ref_p, lr_p, tile_lr: int = 256, tile_ref: int = 512,
                         interpret: bool = False):
    """ref_p: (B, L_ref, D); lr_p: (B, L_lr, D) — both L2-normalized.
    Returns (conf (B, L_lr) f32, index (B, L_lr) int32).

    Differentiable: conf = max_r <ref_p[r], lr_p>, so the cotangent flows to
    the argmax row only — d lr_p = g * ref_p[idx] (gather), d ref_p =
    scatter-add of g * lr_p at idx (first-occurrence argmax matches torch.max
    tie behavior, so gradients match the dense reference too)."""
    return _pallas_argmax_impl(ref_p, lr_p, tile_lr, tile_ref, interpret)


@functools.partial(jax.jit, static_argnames=("tile_lr", "tile_ref",
                                             "interpret"))
def _pallas_argmax_impl(ref_p, lr_p, tile_lr: int = 256, tile_ref: int = 512,
                        interpret: bool = False):
    """D is zero-padded to a lane multiple (zero columns don't change dots);
    L_lr is zero-padded to tile_lr (extra rows discarded); L_ref is padded to
    tile_ref and masked inside the kernel."""
    b, l_ref, d = ref_p.shape
    l_lr = lr_p.shape[1]

    d_pad = -d % 128
    lr_pad = -l_lr % tile_lr
    ref_pad = -l_ref % tile_ref
    if d_pad:
        ref_p = jnp.pad(ref_p, [(0, 0), (0, 0), (0, d_pad)])
        lr_p = jnp.pad(lr_p, [(0, 0), (0, 0), (0, d_pad)])
    if lr_pad:
        lr_p = jnp.pad(lr_p, [(0, 0), (0, lr_pad), (0, 0)])
    if ref_pad:
        ref_p = jnp.pad(ref_p, [(0, 0), (0, ref_pad), (0, 0)])

    n_lr = lr_p.shape[1] // tile_lr
    n_ref = ref_p.shape[1] // tile_ref

    grid = (b, n_lr, n_ref)
    kernel = functools.partial(_kernel, l_ref, tile_ref)
    val, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_lr, lr_p.shape[2]),
                         lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, tile_ref, ref_p.shape[2]),
                         lambda bi, i, j: (bi, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_lr, 1), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, tile_lr, 1), lambda bi, i, j: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lr_p.shape[1], 1), jnp.float32),
            jax.ShapeDtypeStruct((b, lr_p.shape[1], 1), jnp.int32),
        ],
        interpret=interpret,
    )(lr_p, ref_p)
    return val[:, :l_lr, 0], idx[:, :l_lr, 0]


def _pallas_argmax_fwd(ref_p, lr_p, tile_lr, tile_ref, interpret):
    conf, idx = _pallas_argmax_impl(ref_p, lr_p, tile_lr, tile_ref, interpret)
    return (conf, idx), (ref_p, lr_p, idx)


def _pallas_argmax_bwd(tile_lr, tile_ref, interpret, res, g):
    ref_p, lr_p, idx = res
    g_conf = g[0].astype(jnp.float32)           # idx cotangent is float0
    sel = jnp.take_along_axis(ref_p, idx[..., None], axis=1)
    d_lr = (g_conf[..., None] * sel.astype(jnp.float32)).astype(lr_p.dtype)
    contrib = g_conf[..., None] * lr_p.astype(jnp.float32)
    d_ref = jnp.zeros(ref_p.shape, jnp.float32)
    d_ref = jax.vmap(lambda dr, i, c: dr.at[i].add(c))(d_ref, idx, contrib)
    return d_ref.astype(ref_p.dtype), d_lr


pallas_argmax_matmul.defvjp(_pallas_argmax_fwd, _pallas_argmax_bwd)
