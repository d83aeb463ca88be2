"""Cross-camera feature matching + aligned attention (the RAP front-end), NHWC.

Reference: /root/reference/models/archs/RefVSR_/attention.py (FeatureMatching,
AlignedAttention) and alignment.py (AlignedConv2d). TPU-first redesign notes:

  * The dense HrWr x HW cosine-similarity matrix (attention.py:91) is never
    materialized. We run a `lax.scan` over reference-patch tiles with a running
    (max, argmax) carry — each tile is an MXU matmul [tile, D] @ [D, L_lr].
    At 270p eval the torch version materializes a ~17 GB f32 matrix; the tiled
    version is O(tile * L_lr).
  * Every fold in RefVSR has kernel == stride (see ops/patches.py docstring),
    so reassembly is a reshape, not scatter-add.
  * AlignedConv2d's per-pixel affine patch sampling is expressed as one fused
    gather over the reflection-padded canvas.

Reference-quirk faithfully kept: AlignedConv2d._set_lr (alignment.py:33-36)
*intends* to scale gradients by 0.1 but the hook builds generator expressions it
never consumes and returns None — a no-op in torch. We therefore do NOT scale
gradients either."""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.models.blocks import BasicBlock, Conv2d, ResBlock, vgg_normalize, lrelu
from refvsr_tpu.models.vgg import VGGFeatures
from refvsr_tpu.ops.patches import extract_patches, fold_non_overlapping, gather_patches
from refvsr_tpu.ops.resize import resize, avg_pool_2x2


# AlignedConv2d affine gather: quad-canvas above this budget. A/B'd on v5e
# at 1080p-HD-in (chip session r3, docs/ROUND3_NOTES.md): raising to 3584 MB
# left the cached prop step at 351/1060 ms — identical to the default — so
# the stride-2 source grid's pair path is not the bottleneck and the
# threshold stays fixed here (knob closed per VERDICT r2 #2/#5).
_AFFINE_QUAD_BYTES = 1536 << 20
# AlignedConv2d head: row-tile above this many pixels (see _head_tiled)
_HEAD_TILE_PIXELS = 1 << 22
# affine gather: chunk the gathered corner temps above this many elements
_AFFINE_CHUNK_ELEMS = 2 << 20
# NOTE: a banded-gather formulation of the affine sampler (dense-grid tap
# layout through ops/warp_banded._banded_core) was built in r3 and DELETED in
# r4 after chip measurement: compute_aligned at 1080p-HD ran 1332 ms banded
# vs 852 ms on the per-tap canvas path (the tap layout defeats the band
# locality the flow warp enjoys), and its lax.cond dual graph inflated the
# stream step's peak HBM (docs/ROUND4_NOTES.md).


def _l2_normalize(x, axis, eps=1e-12):
    """torch F.normalize: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _use_pallas_matching() -> bool:
    """Pallas streaming-argmax kernel on a single TPU device (2.5x the XLA
    scan at HD scale); the XLA path covers CPU tests and multi-device meshes
    (pallas_call inside GSPMD-sharded programs needs shard_map plumbing)."""
    try:
        return jax.default_backend() in ("tpu", "axon") and \
            jax.device_count() == 1
    except Exception:
        return False


def tiled_argmax_matmul(ref_p, lr_p, tile: int | None = None):
    """max/argmax over ref patches of (ref_p @ lr_p^T) without materializing it.

    ref_p: (N, L_ref, D) L2-normalized; lr_p: (N, L_lr, D) L2-normalized.
    Returns (conf (N, L_lr), index (N, L_lr) int32). First-occurrence argmax
    (strict > update), matching torch.max tie behavior on CPU."""
    n, l_ref, d = ref_p.shape
    l_lr = lr_p.shape[1]
    if tile is None:
        # keep each f32 sim tile under ~256 MB (HBM headroom at 8K scale)
        budget = (256 << 20) // (4 * max(n * l_lr, 1))
        tile = max(256, min(4096, budget))
    tile = min(tile, l_ref)
    num_tiles = -(-l_ref // tile)
    pad = num_tiles * tile - l_ref
    if pad:
        ref_p = jnp.concatenate(
            [ref_p, jnp.full((n, pad, d), 0.0, ref_p.dtype)], axis=1)
    ref_tiles = ref_p.reshape(n, num_tiles, tile, d).transpose(1, 0, 2, 3)
    # validity mask for padded rows (sim of a zero row is 0 which could beat
    # negative true sims — force padded rows to -inf)
    row_ids = np.arange(num_tiles * tile).reshape(num_tiles, tile)
    valid = jnp.asarray(row_ids < l_ref)

    def step(carry, inputs):
        best_val, best_idx = carry
        tile_rows, tile_valid, offset = inputs
        sim = jnp.einsum("nrd,nld->nrl", tile_rows, lr_p,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(tile_valid[None, :, None], sim, -jnp.inf)
        tile_max = jnp.max(sim, axis=1)
        tile_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + offset
        upd = tile_max > best_val
        return (jnp.where(upd, tile_max, best_val),
                jnp.where(upd, tile_arg, best_idx)), None

    init = (jnp.full((n, l_lr), -jnp.inf, jnp.float32),
            jnp.zeros((n, l_lr), jnp.int32))
    offsets = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    (conf, idx), _ = jax.lax.scan(step, init, (ref_tiles, valid, offsets))
    return conf.astype(lr_p.dtype), idx


class FeatureMatching(nn.Module):
    """VGG-prefix cosine patch matching -> (confidence map, hard index map).

    attention.py:14-100. scale==4 uses vgg19 features[:4] (64ch tap), scale==2
    or HD-in uses features[:7] (128ch tap); 1x1 'match0' conv to 16ch."""
    scale: int = 4
    flag_HD_in: bool = False
    ksize: int = 3
    stride: int = 1

    @property
    def vgg_range(self):
        if self.flag_HD_in:
            return 7
        return 4 if self.scale == 4 else 7

    def setup(self):
        self.feature_extract = VGGFeatures(max_index=self.vgg_range,
                                           name="feature_extract")
        self.match0 = BasicBlock(16, kernel_size=1, act_slope=0.2, name="match0")

    def _feat(self, img):
        f, _ = self.feature_extract(img)
        return self.match0(f)

    def __call__(self, lr, ref, ref_downsample: bool = True):
        """lr: (N,h,w,3); ref: (N,hr,wr,3). Returns conf (N,h,w,1), index (N,h*w)."""
        h, w = lr.shape[1], lr.shape[2]
        lr = vgg_normalize(lr)
        ref = vgg_normalize(ref)
        if self.flag_HD_in:
            sf = 1.0 / (self.scale // 2)
            lr = resize(lr, scale_factor=sf, mode="nearest")
            ref = resize(ref, scale_factor=sf, mode="nearest")

        lr_f = self._feat(lr)
        lr_p = extract_patches(lr_f, self.ksize, self.stride, padding="same")

        ref_down = avg_pool_2x2(ref) if ref_downsample else ref
        ref_f = self._feat(ref_down)
        ref_p = extract_patches(ref_f, self.ksize, self.stride, padding="same")

        ref_p = _l2_normalize(ref_p, axis=2)
        lr_p = _l2_normalize(lr_p, axis=2)
        from refvsr_tpu.parallel.spatial import maybe_sharded_argmax
        on_tpu = jax.default_backend() in ("tpu", "axon")
        sharded = maybe_sharded_argmax(ref_p, lr_p, use_pallas=on_tpu)
        if sharded is not None:
            conf, index = sharded
            conf = conf.astype(lr_p.dtype)
        elif _use_pallas_matching():
            from refvsr_tpu.ops.pallas.matching_kernel import \
                pallas_argmax_matmul
            conf, index = pallas_argmax_matmul(ref_p, lr_p)
            conf = conf.astype(lr_p.dtype)
        else:
            conf, index = tiled_argmax_matmul(ref_p, lr_p)

        h_c, w_c = lr_f.shape[1], lr_f.shape[2]
        conf = conf.reshape(-1, h_c, w_c, 1)
        if h != h_c:
            conf = resize(conf, scale_factor=h / h_c, mode="bicubic",
                          align_corners=False)
            conf = jnp.clip(conf, 0.0, 1.0)
        return conf, index



def _affine_corner_weights(hp, wp, p_row, p_col):
    """Clamped-corner anchors + collapse-routed quad weights of the
    reference's affine bilinear sampling (alignment.py:62-89): corners q are
    clamped into the canvas independently of the weights, so when the lt
    corner sits on the last row/col the rb corner re-reads the SAME row/col
    — a deliberate boundary double-count. Gathering each corner at its OWN
    clamped coordinate reproduces this exactly (the collapsed rb gather
    lands on the clamped lt pixel): when the independent clamp makes rb land
    ON lt, the rb/lb/rt weight is routed to the corner actually read.
    Verified against all 4 cases. Returns (lt_row_c, lt_col_c int32,
    w00, w01, w10, w11)."""
    lt_row = jnp.floor(p_row)
    lt_col = jnp.floor(p_col)
    rb_row, rb_col = lt_row + 1, lt_col + 1
    lt_row_c = jnp.clip(lt_row, 0, hp - 1)
    lt_col_c = jnp.clip(lt_col, 0, wp - 1)
    rb_row_c = jnp.clip(rb_row, 0, hp - 1)
    rb_col_c = jnp.clip(rb_col, 0, wp - 1)
    p_row_c = jnp.clip(p_row, 0, hp - 1)
    p_col_c = jnp.clip(p_col, 0, wp - 1)

    # bilinear weights with *clamped* corners and coords (alignment.py:74-77)
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
    return (lt_row_c.astype(jnp.int32), lt_col_c.astype(jnp.int32),
            w00, w01, w10, w11)


def affine_bilinear_gather_banded_rows(xp, p_row, p_col, stride, halo,
                                       num_chunks=8):
    """Grid-row-chunked affine gather: one band of the canvas per chunk.

    Tap displacements are CELL-LOCAL (|rot| <= sqrt(2)*(ks/2+0.5)*3 + the
    sub-block span — the same bound the spatial-sharding path relies on,
    AlignedConv2d.__call__ min_halo), so a chunk of grid rows only reads a
    (G*stride + 2*halo)-row band. The band's QUAD corner canvas fits the
    budget where the global canvas cannot (r5: the global gather ran the
    PAIR path at 471 ms — 2 gathered rows/tap; per-band quad halves that).

    Clamp semantics are preserved exactly: band-relative corner clamping
    equals global clamping because chunk 0's band starts at row 0, the last
    band ends at hp-1, and middle-chunk taps cannot reach either global
    edge (the halo bound keeps them >= band start and < band end).

    xp: (N, Hp, Wp, C); p_row/p_col: (N, gh, gw, ntaps) canvas coords."""
    n, hp, wp, c = xp.shape
    gh, gw, ntaps = p_row.shape[1:]
    g = -(-gh // num_chunks)
    band_h = g * stride + 2 * halo + 2
    if band_h >= hp or num_chunks <= 1:
        return affine_bilinear_gather(xp, p_row, p_col)
    ghp = num_chunks * g

    starts = np.clip(np.arange(num_chunks) * g * stride - halo, 0,
                     hp - band_h).astype(np.int32)
    starts = jnp.asarray(starts)

    def prep(a):
        if ghp != gh:
            a = jnp.pad(a, [(0, 0), (0, ghp - gh), (0, 0), (0, 0)])
        return a.reshape(n, num_chunks, g, gw, ntaps).transpose(1, 0, 2, 3,
                                                                4)

    pr = prep(p_row)
    pc = prep(p_col)

    def step(_, xs):
        start, prc, pcc = xs
        band = jax.lax.dynamic_slice_in_dim(xp, start, band_h, axis=1)
        rel = prc - start.astype(prc.dtype)
        o = affine_bilinear_gather(band, rel, pcc)
        return None, o.reshape(n * g * gw * ntaps * c)

    _, outs = jax.lax.scan(step, None, (starts, pr, pc))
    outs = outs.reshape(num_chunks, n, g, gw, ntaps, c)
    outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(n, ghp, gw, ntaps, c)
    return outs[:, :gh]


def affine_bilinear_gather(xp, p_row, p_col):
    """Per-tap quad/pair-canvas affine sampler (the general-layout baseline
    and the banded path's fallback; see _affine_corner_weights for the
    clamped-corner semantics).

    ONE quad-canvas row gather per tap (see ops/warp.py — row-count bound),
    anchored at the clamped lt corner. The canvas is built once, OUTSIDE the
    chunk scan (round 1 rebuilt it per chunk: 180 ms -> ~50 ms at the
    544x960 2x-grid shapes).

    xp: (N, Hp, Wp, C) already-padded canvas; p_row/p_col: (N, ...) f32."""
    from refvsr_tpu.ops.warp import build_corner_canvas, gather_corners

    n, hp, wp, c = xp.shape
    lt_row_i, lt_col_i, w00, w01, w10, w11 = _affine_corner_weights(
        hp, wp, p_row, p_col)

    # quad threshold knob (REFVSR_AFFINE_QUAD_MB): with the stream-path RAP
    # cache this gather runs once per frame. The quad halves the gathered
    # rows vs the pair fallback but costs a 3.2 GB transient at 1080p-HD-in
    # next to the per-step UP-warp quad — A/B on-chip before raising the
    # default (HBM headroom vs the measured 454 ms pair-path cost).
    canvas = build_corner_canvas(xp, ring=False,
                                 max_quad_bytes=_AFFINE_QUAD_BYTES)
    dt = xp.dtype

    def weighted(ltr, ltc, w00, w01, w10, w11):
        v00, v01, v10, v11 = gather_corners(canvas, ltr, ltc)
        return (v00 * w00[..., None].astype(dt)
                + v01 * w01[..., None].astype(dt)
                + v10 * w10[..., None].astype(dt)
                + v11 * w11[..., None].astype(dt))

    args = (lt_row_i, lt_col_i, w00, w01, w10, w11)

    idx_shape = p_row.shape
    total = int(np.prod(idx_shape[1:]))
    # bound the gathered corner temps; 2M rows -> the 544x960-scale call runs
    # unchunked (each chunk pays ~15 ms fixed gather cost on top of ~10 ns/row)
    chunk_elems = _AFFINE_CHUNK_ELEMS
    if n * total <= chunk_elems:
        return weighted(*args).reshape(idx_shape + (c,))

    per = max(1, chunk_elems // n)
    num_chunks = -(-total // per)
    pad = num_chunks * per - total

    def prep(a):
        a = a.reshape(n, total)
        if pad:
            a = jnp.pad(a, [(0, 0), (0, pad)])
        return a.reshape(n, num_chunks, per).transpose(1, 0, 2)

    stacked = tuple(prep(a) for a in args)

    def step(_, xs):
        # flatten FULLY to 1-D: (n=1, K) chunks would pad the size-1
        # second-minor sublane dim 2x — a 768 MB AllocateBuffer in the
        # round-2 1080p OOM report; (K,) chunks stack to (chunks, K) which
        # tiles cleanly
        return None, weighted(*xs).reshape(n * per * c)

    _, outs = jax.lax.scan(step, None, stacked)  # (K, n*per*C)
    outs = outs.reshape(num_chunks, n, per, c).transpose(1, 0, 2, 3)
    outs = outs.reshape(n, num_chunks * per, c)
    return outs[:, :total].reshape(idx_shape + (c,))


class AlignedConv2d(nn.Module):
    """Per-pixel affine (scale_x, scale_y, rotation<=±60°) patch resampler
    (alignment.py:10-178). modulation is False in all reference configs."""
    kernel_size: int
    stride: int
    padding: int = 1

    def setup(self):
        # head: conv5x5(3->32), lrelu, ResBlock(32), lrelu     (alignment.py:18)
        # in_features=3 enables the params-only declare path the row-tiled
        # head uses (identical param tree either way)
        self.conv1_0 = Conv2d(32, kernel_size=5, in_features=3,
                              name="conv1_0")
        self.conv1_res = ResBlock(32, name="conv1_res")
        # head2: conv5x5(64->32, stride), lrelu, ResBlock, lrelu, conv1x1(32->3)
        # in_features=64 (r+q concat) enables the params-only declare the
        # shard-local strided conv uses under spatial sharding
        self.p_conv_0 = Conv2d(32, kernel_size=5, stride=self.stride,
                               in_features=64, name="p_conv_0")
        self.p_conv_res = ResBlock(32, name="p_conv_res")
        self.p_conv_out = Conv2d(3, kernel_size=1, name="p_conv_out")

    def _head(self, img):
        # under spatial sharding the tiled path is both unnecessary (per-shard
        # rows are 1/s of the canvas, so the big-buffer motivation vanishes)
        # and harmful: its stack-of-dynamic-slices layout defeats GSPMD
        # propagation — ~1 GB f32 all-gathers at the 8K geometry
        # (scripts/debug_8k_allgather.py, r4). GSPMD handles the direct convs
        # with collective-permute halo exchanges.
        from refvsr_tpu.parallel.spatial import active as _spatial_active
        if (_spatial_active() is None and
                img.shape[0] * img.shape[1] * img.shape[2]
                >= _HEAD_TILE_PIXELS):
            tiled = self._head_tiled(img)
            if tiled is not None:
                return tiled
        x = lrelu(self.conv1_0(img), 0.2)
        x = lrelu(self.conv1_res(x), 0.2)
        return x

    def _head_tiled(self, img):
        """Row-tiled head for big canvases. At the 1080p-HD 2x canvas
        (2160x3840) XLA lays the 32-channel head intermediates out with the
        channel dim minor, padding each 507 MB buffer 4x to 1.98 GB — four
        of them were live at once in the round-3 OOM report. Same tiling +
        mask discipline as RefVSRNet._tail_tiled: out-of-image halo rows are
        re-zeroed after every biased op so tile edges see exactly the 'same'
        zero padding the direct path sees. Receptive field = conv5 (2 rows)
        + 2x conv3 (1 each) = 4 rows = halo. Verified == direct in tests."""
        n, h, w, _ = img.shape
        halo = 4
        num_chunks = next((k for k in (8, 6, 4, 2, 1)
                           if h % k == 0 and h // k >= halo), 1)
        if num_chunks == 1:
            return None
        chunk = h // num_chunks
        padded = jnp.pad(img, [(0, 0), (halo, halo), (0, 0), (0, 0)])
        tiles = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(padded, i * chunk,
                                          chunk + 2 * halo, axis=1)
             for i in range(num_chunks)], 0)
        tile_rows = chunk + 2 * halo
        masks = np.zeros((num_chunks, tile_rows), np.float32)
        for i in range(num_chunks):
            g = i * chunk - halo + np.arange(tile_rows)
            masks[i] = ((g >= 0) & (g < h)).astype(np.float32)
        masks = jnp.asarray(masks, img.dtype)

        def conv(x, kb, k):
            kernel, bias = kb
            p = k // 2
            out = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            return out + bias.astype(x.dtype)

        def step(mdl, carry, xs):
            tile, m = xs
            m = m[None, :, None, None]
            kb0 = mdl.conv1_0(None)           # params-only declare
            kb1, kb2 = mdl.conv1_res(None)
            y = lrelu(conv(tile, kb0, 5), 0.2) * m
            r = lrelu(conv(y, kb1, 3), 0.2) * m
            r = conv(r, kb2, 3) * m           # ResBlock: c2(lrelu(c1)) + x
            y = lrelu(r + y, 0.2) * m
            return carry, y[:, halo: halo + chunk]

        _, outs = nn.scan(step, variable_broadcast="params",
                          split_rngs={"params": False})(self, None,
                                                        (tiles, masks))
        outs = outs.transpose(1, 0, 2, 3, 4)
        return outs.reshape(n, h, w, outs.shape[-1])

    def __call__(self, x, query, ref):
        """x: warped canvas (N, Hx, Wx, C); query: lr (N, Hx/2, Wx/2, 3);
        ref: warped ref image (N, Hx, Wx, 3). Returns (N, h*ks, w*ks, C) where
        (h, w) is the stride-decimated grid (== Hx/stride)."""
        ks = self.kernel_size
        ntaps = ks * ks

        query = resize(query, scale_factor=2, mode="bicubic", align_corners=False)
        q = self._head(query)
        r = self._head(ref)

        a = jnp.concatenate([r, q], axis=-1)
        # under spatial sharding the stride-s conv runs shard-local: its
        # stride can exceed its kernel (aa2: stride 8 > k 5), which GSPMD's
        # windowed-op partitioner refuses — it all-gathered the 1 GB
        # canvas-sized input at 8K geometry. The output is affine-grid-sized
        # (small), so it comes back replicated and the grid math below stays
        # global.
        from refvsr_tpu.parallel.spatial import (
            active as _spatial_active, maybe_sharded_strided_conv_small)
        pc = None
        if self.stride > 1 and _spatial_active() is not None:
            kb, bb = self.p_conv_0(None)
            pc = maybe_sharded_strided_conv_small(a, kb, bb, self.stride,
                                                  pad=2)
        if pc is None:
            pc = self.p_conv_0(a)
        a = lrelu(pc, 0.2)
        a = lrelu(self.p_conv_res(a), 0.2)
        affine = self.p_conv_out(a) + 1.0          # (N, h, w, 3)
        affine = jnp.clip(affine, -3.0, 3.0)

        n, h, w, _ = affine.shape
        # ALL coordinate math in f32 (reference alignment.py keeps p_0/p_n
        # f32 under autocast too): bf16 coords at canvas scale quantize to
        # 8-16 px steps (7 mantissa bits; ulp(2048)=16), which would scatter
        # the taps — the per-pixel affine is sub-pixel work
        affine = affine.astype(jnp.float32)
        # constant tap offsets (alignment.py:102-107): rows/cols at ±(j+0.5)
        half = (ks - 1) // 2
        taps_1d = np.arange(-half - 0.5, half + 0.6, 1.0)
        pn_row, pn_col = np.meshgrid(taps_1d, taps_1d, indexing="ij")
        pn_row = jnp.asarray(pn_row.reshape(-1), jnp.float32)   # (ntaps,)
        pn_col = jnp.asarray(pn_col.reshape(-1), jnp.float32)
        # anchors (alignment.py:109-117): 1 + i*stride
        p0_row = jnp.asarray(
            1.0 + np.arange(h) * self.stride,
            jnp.float32)[None, :, None, None]
        p0_col = jnp.asarray(
            1.0 + np.arange(w) * self.stride,
            jnp.float32)[None, None, :, None]

        s_row = affine[..., 0:1]
        s_col = affine[..., 1:2]
        theta = (affine[..., 2:3] - 1.0) * 1.0472
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        rx = pn_row[None, None, None, :] * s_row    # (N, h, w, ntaps)
        ry = pn_col[None, None, None, :] * s_col
        # p @ [[cos, sin], [-sin, cos]]  (alignment.py:141-144)
        rot_row = rx * cos_t - ry * sin_t
        rot_col = rx * sin_t + ry * cos_t
        center = half + 0.5
        p_row = rot_row + center + p0_row           # (N, h, w, ntaps)
        p_col = rot_col + center + p0_col

        # reflection pad the canvas (alignment.py:16,53-54)
        pad = self.padding
        # static tap-displacement bound: |rot| <= sqrt(2)*(ks/2+0.5)*3
        # (affine clipped to [-3,3]) plus the sub-block anchor span
        min_halo = int(np.ceil(1.4143 * (ks / 2 + 0.5) * 3.0)) + self.stride
        from refvsr_tpu.parallel.spatial import maybe_sharded_affine_fold
        folded = maybe_sharded_affine_fold(x, pad, p_row, p_col, ks,
                                           min_halo=min_halo)
        if folded is not None:
            return folded

        c = x.shape[-1]
        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                     mode="reflect")
        # NOTE r5: a grid-row-banded variant with per-band QUAD canvases
        # (affine_bilinear_gather_banded_rows) was built on the theory that
        # halving gathered rows beats the global pair path — measured on
        # chip it REGRESSED compute_aligned 852 -> 1238 ms (the per-chunk
        # canvas rebuilds + scan overhead swamp the row saving, the same
        # failure mode as r3's banded-affine). Kept parity-tested but NOT
        # dispatched; the knob is closed twice over.
        o = affine_bilinear_gather(xp, p_row, p_col)
        # (N, h, w, ks, ks, C) -> (N, h*ks, w*ks, C)  (alignment.py:172-178)
        o = o.reshape(n, h, w, ks, ks, c).transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(n, h * ks, w * ks, c)


class AlignedAttention(nn.Module):
    """Index-map driven patch warp + optional affine alignment
    (attention.py:102-159). kernel == stride == scale in every RefVSR use, so
    the fold is a pure reshape."""
    scale: int
    align: bool
    k_vsize: int = 1
    stride: int = 1

    def setup(self):
        if self.align:
            self.align_conv = AlignedConv2d(
                kernel_size=self.scale * self.k_vsize,
                stride=self.scale, name="align")

    def __call__(self, lr, ref, index_map, value, return_fm: bool = False):
        """lr: (N,h,w,3) output-defining grid; ref: image for affine estimation;
        value: features/image to warp. Output spatial size = (2h, 2w)."""
        h, w = lr.shape[1], lr.shape[2]
        kernel = self.scale * self.k_vsize
        s = self.stride * self.scale

        from refvsr_tpu.parallel.spatial import maybe_sharded_patch_warp

        def patch_warp(v):
            # under an active spatial ctx the frame-sized patch table stays
            # sharded and rotates around the ring (parallel/spatial.py)
            # instead of GSPMD replicating it to serve the global index map
            out = maybe_sharded_patch_warp(v, index_map, kernel, s,
                                           (h * 2, w * 2))
            if out is not None:
                return out
            unfolded = extract_patches(v, kernel, s, padding="same")
            warped = gather_patches(unfolded, index_map)
            return fold_non_overlapping(warped, (h * 2, w * 2), kernel,
                                        v.shape[-1])

        warped_features = patch_warp(value)
        if return_fm or not self.align:
            return warped_features

        warped_ref = patch_warp(ref)
        return self.align_conv(warped_features, lr, warped_ref)
