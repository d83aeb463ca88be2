"""RefVSR core network — TPU-native (flax + lax.scan), NHWC.

Reference: /root/reference/models/archs/RefVSR.py:14-360. Key redesigns vs the
torch original (behavior preserved, implementation TPU-first):

  * The module-attribute recurrent cache (forward_*_prev, RefVSR.py:96-99,279-283)
    becomes an explicit `StreamState` pytree threaded through calls — jit-safe,
    shardable, checkpointable.
  * The per-frame Python loops over SPyNet / feature matching (RefVSR.py:179-204)
    are batched over time (one big MXU batch instead of t small launches).
  * The backward/forward propagation loops (RefVSR.py:214-283) are `nn.scan`s
    with broadcast parameters — one compiled step regardless of window length.
  * Three entry points = three static graphs (no retraces):
      - forward_train:  full window, gradients, state saved at step 0
      - forward_first:  full window, state saved at the center step
      - forward_stream: center-frame-only fast path (RefVSR.py:173-176,246-247)

  Reference quirk kept bit-for-bit: the *intra-window* forward branch warps the
  low-res `feat_prop` onto the 2x grid for feat_prop_UP (RefVSR.py:254 uses
  `feat_prop`, unlike the backward branch's line 220 which warps feat_prop_UP);
  the cross-window continue path warps the saved UP tensor (RefVSR.py:259).

Branch reset (`reset_branch`, RefVSR.py:167-170,291-295) is host-side policy and
lives in the streaming runner (refvsr_tpu/eval/stream.py), not in the jitted
graph."""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from refvsr_tpu.models.blocks import (
    BasicBlock, Conv2d, PixelShufflePack, ResidualBlocksWithInputConv, ResList,
    lrelu)
from refvsr_tpu.models.matching import AlignedAttention, FeatureMatching
from refvsr_tpu.models.spynet import SPyNet
from refvsr_tpu.ops.resize import resize
from refvsr_tpu.ops.warp import warp


@flax.struct.dataclass
class StreamState:
    """Cross-window recurrent state (replaces RefVSR.py:96-99 module attrs).

    flows_fwd/flows_bwd cache the window's SPyNet flows: consecutive streamed
    windows advance by exactly one frame, so window_{i+1}'s pairs are
    window_i's pairs shifted by one plus ONE new pair — identical values at
    1/(t-1) the SPyNet cost. The shift property also holds at clip edges
    because frame indices are clamped to the same bounds on both windows
    (datasets.py:233-234).

    conf_tail/index_tail cache feature-matching results for the tail frames
    (center..t-1 — the only frames the streaming path matches,
    RefVSR.py:198-202) by the same shift property: one fresh matching per
    streamed frame instead of t-t//2. None (e.g. a state built by
    init_stream_state for training or the dryrun) => forward_stream matches
    all tail frames fresh.

    aligned_tail/aligned_up_tail cache the carry-INDEPENDENT half of the RAP
    step for the tail frames: encode_ref + aa1 + aa2 (incl. the affine
    gather) depend only on (lr, ref, index) of a frame, all of which are
    identical every time the backward branch revisits it across overlapping
    windows. Round-2 profile at 1080p HD-in: these are 834 ms of the 1888 ms
    prop step — caching runs them once per streamed frame instead of
    t//2 + 1 times. Exact (no approximation); ~1 GB/frame of HBM at 1080p.

    The two aligned caches are RING buffers: logical tail frame i lives at
    slot (tail_base + i) % TT along axis 1, and forward_stream advances the
    window by overwriting the expired slot in place (dynamic_update_slice
    aliases the donated buffer) instead of a shift-concat — the concat copies
    the full ~3.7 GB cache every frame and its temps were the largest HLO
    allocations in the 8K stream graph. tail_base None = natural order
    (base 0) for states warmed by hand (bench/profilers). conf_tail /
    index_tail are small and stay logically ordered (plain shift).

    pipe_feat/pipe_feat_up/pipe_conf carry the PIPELINED stream's in-flight
    backward chains (lanes 0..L-2 stacked along batch; see
    forward_stream_pipelined). None for the plain per-window stream.
    With pipelining the two aligned rings and conf/index tails hold
    B + L - 1 frames instead of B (the in-flight chains reach L-1 frames
    further back)."""
    feat_prop: jnp.ndarray       # (N, h, w, C)
    feat_prop_up: jnp.ndarray    # (N, 2h, 2w, C)
    conf_prop: jnp.ndarray       # (N, h, w, 1)
    flow: jnp.ndarray            # (N, h, w, 2)
    flows_fwd: jnp.ndarray       # (N, T-1, h, w, 2)
    flows_bwd: jnp.ndarray       # (N, T-1, h, w, 2)
    conf_tail: jnp.ndarray | None = None   # (N, TT, h, w, 1)
    index_tail: jnp.ndarray | None = None  # (N, TT, L) int32
    aligned_tail: jnp.ndarray | None = None     # (N, TT, h, w, C) ring
    aligned_up_tail: jnp.ndarray | None = None  # (N, TT, 2h, 2w, C) ring
    tail_base: jnp.ndarray | None = None        # () int32 ring base
    pipe_feat: jnp.ndarray | None = None      # ((L-1)*N, h, w, C)
    pipe_feat_up: jnp.ndarray | None = None   # ((L-1)*N, 2h, 2w, C)
    pipe_conf: jnp.ndarray | None = None      # ((L-1)*N, h, w, 1)


def init_stream_state(n: int, h: int, w: int, mid_channels: int,
                      dtype=jnp.float32, num_frames: int = 7) -> StreamState:
    return StreamState(
        feat_prop=jnp.zeros((n, h, w, mid_channels), dtype),
        feat_prop_up=jnp.zeros((n, 2 * h, 2 * w, mid_channels), dtype),
        conf_prop=jnp.zeros((n, h, w, 1), dtype),
        flow=jnp.zeros((n, h, w, 2), dtype),
        flows_fwd=jnp.zeros((n, num_frames - 1, h, w, 2), dtype),
        flows_bwd=jnp.zeros((n, num_frames - 1, h, w, 2), dtype),
    )


def _up2(x):
    return resize(x, scale_factor=2, mode="bicubic", align_corners=False)


def _up2_clamp(x):
    return jnp.clip(_up2(x), 0.0, 1.0)


def _flow_up2(flow):
    """2x-upscale a flow field for warping UP features (RefVSR.py:220,254)."""
    return resize(flow, scale_factor=2, mode="bilinear", align_corners=True) * 2.0


class RefVSRNet(nn.Module):
    """The 'RefVSR' architecture ('Ours' family). config_RefVSR_MFID.py:41-47.

    pipeline_lanes L > 1 enables PIPELINED streaming (forward_stream_prime /
    forward_stream_pipelined): the B = T - T//2 backward-chain steps of each
    output frame are spread over L consecutive dispatches (P = B/L steps
    per dispatch), so one dispatch advances L independent chains as ONE
    batch-L prop step sequence instead of B sequential batch-1 steps.
    Outputs are IDENTICAL to forward_stream (the chains consume the same
    frames/flows/conf/aligned values, just batched); they emerge L-1
    dispatches late. TPU rationale: the prop step is fixed-overhead-bound
    (round-1 measurement: C=128 convs cost only 1.4x C=48), so batching
    lanes is strongly sublinear. Costs: the aligned rings and conf/index
    tails grow to B+L-1 frames and L-1 lane carries persist in HBM."""
    scale: int = 4
    num_blocks: int = 30
    mid_channels: int = 48
    matching_ksize: int = 2
    flag_HD_in: bool = False
    zero_flow: bool = False  # EVAL.is_gradio path (RefVSR.py:183-191)
    pipeline_lanes: int = 0  # 0/1 = plain streaming

    def setup(self):
        mid = self.mid_channels
        self.flow_net = SPyNet(name="FlowNet")
        self.feature_match = FeatureMatching(
            scale=self.scale, flag_HD_in=self.flag_HD_in, name="feature_match")
        aa1_scale = self.matching_ksize // 2
        self.aa1 = AlignedAttention(scale=aa1_scale, align=aa1_scale > 1,
                                    name="aa1")
        self.aa2 = AlignedAttention(scale=self.matching_ksize, align=True,
                                    name="aa2")

        self.ref_encoder1_0 = BasicBlock(mid, 3, name="ref_encoder1_0")
        self.ref_encoder1_1 = BasicBlock(mid, 3, name="ref_encoder1_1")
        self.res1 = ResList(4, mid, name="res1")
        self.ref_encoder2_0 = BasicBlock(mid, 3, stride=2, name="ref_encoder2_0")
        self.ref_encoder2_1 = BasicBlock(mid, 3, name="ref_encoder2_1")
        self.res2 = ResList(4, mid, name="res2")

        def fusion_pair(name, feat0=16):
            # torch names <name>.0/.1; '_seq' avoids clashing with the separate
            # feat_fusion2_1 module (RefVSR.py:56,72)
            return (BasicBlock(feat0, 3, name=f"{name}_seq0"),
                    BasicBlock(mid, 3, name=f"{name}_seq1"))

        self.conf_fusion = fusion_pair("conf_fusion")
        self.conf_fusion2 = fusion_pair("conf_fusion2")
        self.conf_fusion_BWFW = fusion_pair("conf_fusion_BWFW")
        self.feat_fusion = fusion_pair("feat_fusion", feat0=mid)
        self.feat_fusion2 = fusion_pair("feat_fusion2", feat0=mid)
        self.feat_fusion_BWFW = fusion_pair("feat_fusion_BWFW", feat0=mid)
        self.feat_fusion2_1 = BasicBlock(mid, 3, name="feat_fusion2_1")

        self.feat_decoder = ResList(8, mid, name="feat_decoder")
        self.feat_decoder2 = ResList(4, mid, name="feat_decoder2")
        self.feat_decoder_BWFW = ResList(4, mid, name="feat_decoder_BWFW")

        self.backward_resblocks = ResidualBlocksWithInputConv(
            mid, self.num_blocks, name="backward_resblocks")
        self.forward_resblocks = ResidualBlocksWithInputConv(
            mid, self.num_blocks, name="forward_resblocks")

        self.fusion_UP = Conv2d(mid, kernel_size=1, name="fusion_UP")
        self.upsample1 = PixelShufflePack(mid, 2, name="upsample1")
        if self.scale == 4:
            self.upsample2 = PixelShufflePack(mid, 2, name="upsample2")
        # in_features: enables the params-only mode (x=None) the pre-shuffle
        # tail uses to fetch raw kernels for preshuffle_conv
        self.conv_hr = Conv2d(mid, 3, in_features=mid, name="conv_hr")
        self.conv_last = Conv2d(3, 3, in_features=mid, name="conv_last")

    # ---------------- sub-computations ----------------

    def _seq2(self, pair, x):
        # each BasicBlock applies its own LeakyReLU(0.2)
        return pair[1](pair[0](x))

    def compute_flows(self, lrs):
        """lrs: (N, T, H, W, 3) -> (forward_flows, backward_flows) each
        (N, T-1, H, W, 2). Batched over time for small frames (one big MXU
        batch instead of the reference's per-pair loop, RefVSR.py:179-193);
        for large frames the 2*(T-1) pairs run as an nn.scan instead — the
        batched SPyNet pyramid costs ~P * H*W * 64ch of HBM, which at HD input
        is >5 GB per activation and breaks the compile."""
        n, t, h, w, c = lrs.shape
        if self.zero_flow:
            z = jnp.zeros((n, t - 1, h, w, 2), lrs.dtype)
            return z, z
        nxt = lrs[:, 1:].reshape(n * (t - 1), h, w, c)
        prv = lrs[:, :-1].reshape(n * (t - 1), h, w, c)
        # forward_flows[j] = Flow(ref=lr_{j+1}, supp=lr_j)  (RefVSR.py:184)
        # backward_flows[j] = Flow(ref=lr_j, supp=lr_{j+1}) (RefVSR.py:189)
        ref_all = jnp.concatenate([nxt, prv], 0)
        supp_all = jnp.concatenate([prv, nxt], 0)
        if h * w * ref_all.shape[0] <= 2 ** 21 * 6:  # ~12.6M pixel-pairs
            both = self.flow_net(ref_all, supp_all)
        else:
            def step(mdl, carry, x):
                return carry, mdl.flow_net(x["r"][None], x["s"][None])[0]

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False})
            _, both = scan(self, None, {"r": ref_all, "s": supp_all})
        both = jax.lax.stop_gradient(both)  # SPyNet frozen + no_grad (RefVSR.py:28,179)
        fwd = both[: n * (t - 1)].reshape(n, t - 1, h, w, 2)
        bwd = both[n * (t - 1):].reshape(n, t - 1, h, w, 2)
        return fwd, bwd

    def compute_matching(self, lrs, refs):
        """Batched per-frame matching (RefVSR.py:196-204).
        lrs: (N, T, h, w, 3); refs: (N, T, hr, wr, 3).
        Returns conf (N, T, h, w, 1), index (N, T, h*w) int32."""
        n, t = lrs.shape[:2]
        lr_b = lrs.reshape((n * t,) + lrs.shape[2:])
        ref_b = refs.reshape((n * t,) + refs.shape[2:])
        conf, index = self.feature_match(lr_b, ref_b)
        conf = conf.reshape((n, t) + conf.shape[1:])
        index = index.reshape((n, t) + index.shape[1:])
        return conf, index

    def encode_ref(self, ref):
        """ref_feat = res1(enc1(ref)); ref_feat_down = res2(enc2(ref_feat))
        (RefVSR.py:233-234). ref: (N, hr, wr, 3). Computed INSIDE the
        propagation step (not batched over time) so the scan's stacked inputs
        carry 3-channel images instead of mid_channels features — at 8K the
        stacked features would cost multiple GB of HBM."""
        f = self.res1(self.ref_encoder1_1(self.ref_encoder1_0(ref)))
        fd = self.res2(self.ref_encoder2_1(self.ref_encoder2_0(f)))
        return f, fd

    def compute_aligned(self, lr, ref, index):
        """The carry-independent half of RAP: encode the ref and align it at
        both levels by the hard index map (RefVSR.py:123-144's aa1/aa2 calls
        + the encode at :233-234). Depends only on (lr, ref, index) — in the
        streaming path these are identical every time overlapping windows
        revisit a frame, so the results are cached in StreamState."""
        lr_down = jnp.clip(resize(lr, scale_factor=0.5, mode="bicubic",
                                  align_corners=False), 0.0, 1.0)
        ref_feat, ref_feat_down = self.encode_ref(ref)
        aligned = self.aa1(lr_down, ref, index, ref_feat_down)
        aligned_up = self.aa2(lr, ref, index, ref_feat)
        return aligned, aligned_up

    def compute_aligned_batched(self, lrs, refs, indices):
        """compute_aligned over a (N, T, ...) window, batched as N*T."""
        n, t = lrs.shape[:2]
        a, au = self.compute_aligned(
            lrs.reshape((n * t,) + lrs.shape[2:]),
            refs.reshape((n * t,) + refs.shape[2:]),
            indices.reshape((n * t,) + indices.shape[2:]))
        return (a.reshape((n, t) + a.shape[1:]),
                au.reshape((n, t) + au.shape[1:]))

    def compute_aligned_scan(self, lrs, refs, indices):
        """compute_aligned over a (N, T, ...) window via nn.scan — one frame
        in flight (the batched variant's transients are ~N*T quad canvases,
        too much HBM at 8K scale; outputs still stack to the cache shape)."""
        def step(mdl, carry, x):
            return carry, mdl.compute_aligned(x["lr"], x["ref"], x["index"])

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        xs = {"lr": jnp.moveaxis(lrs, 1, 0), "ref": jnp.moveaxis(refs, 1, 0),
              "index": jnp.moveaxis(indices, 1, 0)}
        _, (a, au) = scan(self, None, xs)
        return jnp.moveaxis(a, 0, 1), jnp.moveaxis(au, 0, 1)

    def rap(self, conf, conf_prop, feat_prop, feat_prop_up, aligned,
            aligned_up):
        """2-level Reference Alignment and Propagation (RefVSR.py:123-149),
        the carry-dependent half; `aligned`/`aligned_up` come from
        compute_aligned (fresh or cached)."""
        # level 1
        cat_features = jnp.concatenate([feat_prop, aligned], -1)
        alpha = self._seq2(self.conf_fusion,
                           jnp.concatenate([conf_prop, conf], -1))
        feat_prop = feat_prop + alpha * self._seq2(self.feat_fusion, cat_features)
        feat_prop = self.feat_decoder(feat_prop)

        # level 2
        feat_prop_up = self.feat_fusion2_1(jnp.concatenate(
            [feat_prop_up, self.upsample1(feat_prop)], -1))
        cat_features = jnp.concatenate([feat_prop_up, aligned_up], -1)
        conf_prop_up = _up2_clamp(conf_prop)
        conf_up = _up2_clamp(conf)
        alpha = self._seq2(self.conf_fusion2,
                           jnp.concatenate([conf_prop_up, conf_up], -1))
        feat_prop_up = feat_prop_up + alpha * self._seq2(self.feat_fusion2,
                                                         cat_features)
        feat_prop_up = self.feat_decoder2(feat_prop_up)

        conf_prop = jnp.maximum(conf_prop, conf)
        return feat_prop, feat_prop_up, conf_prop

    def _prop_step(self, branch: str, warp_up_from_low: bool, carry, x):
        """One propagation step: warp -> aggregate -> RAP (RefVSR.py:214-276).

        warp_up_from_low=True reproduces the forward branch's intra-window
        behavior of warping the low-res feat_prop onto the 2x grid
        (RefVSR.py:254); False warps the UP tensor itself (RefVSR.py:220,259)."""
        feat_prop, feat_prop_up, conf_prop = carry
        flow2 = _flow_up2(x["flow"])
        # conf_prop rides the feature warp (same flow/grid): a standalone
        # 1-channel warp is ~10x the cost of the 48-channel one on TPU
        mid = feat_prop.shape[-1]
        packed = warp(jnp.concatenate([feat_prop, conf_prop], -1), x["flow"])
        feat_prop, conf_prop = packed[..., :mid], packed[..., mid:]
        # quirk detail (caught by tests/test_full_net_parity.py): the
        # reference reassigns feat_prop at RefVSR.py:252 BEFORE line 254 reads
        # it, so the low-res UP source is the already-warped feat_prop — a
        # double warp, not the pre-warp carry
        up_src = feat_prop if warp_up_from_low else feat_prop_up
        feat_prop_up = warp(up_src, flow2)

        resblocks = (self.backward_resblocks if branch == "backward"
                     else self.forward_resblocks)
        feat_prop = resblocks(jnp.concatenate([x["lr"], feat_prop], -1))
        if "aligned" in x:   # streaming path: cached carry-independent half
            aligned, aligned_up = x["aligned"], x["aligned_up"]
        else:
            aligned, aligned_up = self.compute_aligned(x["lr"], x["ref"],
                                                       x["index"])
        feat_prop, feat_prop_up, conf_prop = self.rap(
            x["conf"], conf_prop, feat_prop, feat_prop_up, aligned,
            aligned_up)
        return (feat_prop, feat_prop_up, conf_prop), None

    def _scan_branch(self, branch, warp_up_from_low, carry, xs):
        def step(mdl, c, x):
            return mdl._prop_step(branch, warp_up_from_low, c, x)
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        carry, _ = scan(self, carry, xs)
        return carry

    def _tail(self, out):
        """upsample2 -> conv_hr -> conv_last (RefVSR.py:114-118)."""
        if self.scale == 4:
            out = lrelu(self.upsample2(out), 0.1)
        out = lrelu(self.conv_hr(out), 0.1)
        return self.conv_last(out)

    _TAIL_TILE_THRESHOLD = 4 << 20  # pixels; ~2160x3840 features and above

    def _tail_tiled(self, out):
        """Row-tiled tail for 8K outputs: at (2160, 3840, 48) the direct tail
        holds ~6 GB of activations (conv_hr/conv_last at 4320x7680x48) — more
        than half a v5e's HBM. Process row chunks with a 4-row halo (receptive
        field of conv3 -> pixel_shuffle(2) -> conv3 -> conv3 is 2 input rows;
        4 gives margin) and crop; zero-padded halos at the image border match
        'same' conv semantics exactly. Verified == direct in tests."""
        n, h, w, c = out.shape
        halo = 4
        num_chunks = next((k for k in (8, 6, 4, 2, 1) if h % k == 0), 1)
        if num_chunks == 1:
            return self._tail(out)
        chunk = h // num_chunks
        padded = jnp.pad(out, [(0, 0), (halo, halo), (0, 0), (0, 0)])
        tiles = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(padded, i * chunk, chunk + 2 * halo,
                                          axis=1)
             for i in range(num_chunks)], 0)  # (K, N, chunk+8, w, c)

        up = 2 if self.scale == 4 else 1
        # per-tile masks of rows that lie INSIDE the image (in up-space):
        # edge tiles must re-zero the out-of-image halo after every biased op,
        # or the next conv sees bias-polluted rows where the direct path's
        # 'same' padding sees hard zeros.
        import numpy as onp
        tile_rows = up * (chunk + 2 * halo)
        masks = onp.zeros((num_chunks, tile_rows), onp.float32)
        for i in range(num_chunks):
            g = up * (i * chunk - halo) + onp.arange(tile_rows)
            masks[i] = ((g >= 0) & (g < up * h)).astype(onp.float32)
        masks = jnp.asarray(masks, out.dtype)

        def step(mdl, carry, xs):
            tile, m = xs
            m = m[None, :, None, None]
            y = tile
            if mdl.scale == 4:
                y = lrelu(mdl.upsample2(y), 0.1) * m
            y = lrelu(mdl.conv_hr(y), 0.1) * m
            y = mdl.conv_last(y)
            return carry, y[:, up * halo: up * (halo + chunk)]

        _, outs = nn.scan(step, variable_broadcast="params",
                          split_rngs={"params": False})(self, None,
                                                        (tiles, masks))
        # (K, N, up*chunk, up*w, 3) -> (N, up*h, up*w, 3)
        outs = outs.transpose(1, 0, 2, 3, 4)
        return outs.reshape(n, up * h, up * w, 3)

    def _tail_preshuffle_tiled(self, out):
        """Row-tiled PRE-SHUFFLE tail for scale-4 8K outputs.

        All three tail ops run on the 2x grid: upsample2's conv (48->192,
        shuffle deferred), then conv_hr and conv_last as preshuffle_conv
        (ops/conv.py — exact kernel rearrangements, 192->192 and 192->12),
        with ONE pixel shuffle at the very end. Same math as
        _tail(: upsample2 -> lrelu -> conv_hr -> lrelu -> conv_last) since
        lrelu commutes with depth-to-space; verified vs the direct tail in
        tests/test_refvsr_net.py. Why: the 4x-grid (33 MP) C=48 convs run
        at ~4% MXU (r5 roofline: tail 335 ms, 11.3x off bound); the
        transformed convs see 4x channels on 1/4 the pixels, and no 4x-grid
        tensor ever exists until the final (reshape-only) shuffle."""
        from refvsr_tpu.ops.conv import preshuffle_conv
        from refvsr_tpu.ops.image import pixel_shuffle_deconv as pixel_shuffle
        n, h, w, _ = out.shape
        k_hr, b_hr = self.conv_hr(None)
        k_last, b_last = self.conv_last(None)
        k_hr = k_hr.astype(out.dtype)
        k_last = k_last.astype(out.dtype)

        halo = 4  # 3 chained 3x3 convs -> 3-row receptive field, +1 margin
        num_chunks = next((k for k in (8, 6, 4, 2, 1) if h % k == 0), 1)
        chunk = h // num_chunks

        def stage(y, mask):
            a = lrelu(self.upsample2(y, shuffle=False), 0.1) * mask
            a = lrelu(preshuffle_conv(a, k_hr, b_hr, 2), 0.1) * mask
            return preshuffle_conv(a, k_last, b_last, 2)

        if num_chunks == 1:
            res = stage(out, jnp.ones((), out.dtype))
            return pixel_shuffle(res, 2)

        padded = jnp.pad(out, [(0, 0), (halo, halo), (0, 0), (0, 0)])
        tiles = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(padded, i * chunk,
                                          chunk + 2 * halo, axis=1)
             for i in range(num_chunks)], 0)

        # rows of each tile that lie inside the image: edge tiles must
        # re-zero the out-of-image halo after every biased op (same-conv
        # zero-pad semantics), exactly like _tail_tiled — but on the SAME
        # grid (no up-factor bookkeeping)
        import numpy as onp
        tile_rows = chunk + 2 * halo
        masks = onp.zeros((num_chunks, tile_rows), onp.float32)
        for i in range(num_chunks):
            g = i * chunk - halo + onp.arange(tile_rows)
            masks[i] = ((g >= 0) & (g < h)).astype(onp.float32)
        masks = jnp.asarray(masks, out.dtype)

        def step(mdl, carry, xs):
            tile, m = xs
            y = stage(tile, m[None, :, None, None])
            return carry, y[:, halo: halo + chunk]

        _, outs = nn.scan(step, variable_broadcast="params",
                          split_rngs={"params": False})(self, None,
                                                        (tiles, masks))
        # (K, N, chunk, w, 12) -> (N, h, w, 12) -> shuffle -> (N, 2h, 2w, 3)
        outs = outs.transpose(1, 0, 2, 3, 4).reshape(n, h, w, 12)
        return pixel_shuffle(outs, 2)

    def compute_up(self, backward_feat_up, forward_feat_up, conf_bw, conf_fw,
                   base):
        """Final fusion + upsampling (RefVSR.py:104-119)."""
        conf_bw = _up2_clamp(conf_bw)
        conf_fw = _up2_clamp(conf_fw)
        cat_features = jnp.concatenate([backward_feat_up, forward_feat_up], -1)
        out = self.fusion_UP(cat_features)
        alpha = self._seq2(self.conf_fusion_BWFW,
                           jnp.concatenate([conf_bw, conf_fw], -1))
        out = out + alpha * self._seq2(self.feat_fusion_BWFW, cat_features)
        out = self.feat_decoder_BWFW(out)
        # under spatial sharding the row-tiled tail is unnecessary (per-shard
        # rows are 1/s) and its dynamic-slice/stack layout defeats GSPMD
        # (canvas-sized all-gathers at 8K geometry, r4); the direct tail's
        # convs + pixel shuffle shard cleanly
        from refvsr_tpu.parallel.spatial import active as _spatial_active
        if (_spatial_active() is None
                and out.shape[1] * out.shape[2] >= self._TAIL_TILE_THRESHOLD):
            if self.scale == 4:
                return self._tail_preshuffle_tiled(out) + base
            return self._tail_tiled(out) + base
        return self._tail(out) + base

    # ---------------- entry points ----------------

    def _backward_branch(self, lrs, refs, backward_flows, confs, indices,
                         frame_offset: int, aligneds=None, aligneds_up=None,
                         aligned_offset: int | None = None,
                         aligned_base=None):
        """Full backward branch over frames t-1 .. t//2 (RefVSR.py:210-238).

        All per-frame arrays here are indexed relative to `frame_offset` (the
        absolute index of their first entry) so the stream path can pass only
        the frames it computed. When `aligneds`/`aligneds_up` are given (the
        streaming RAP cache), the scan consumes them instead of re-running
        encode_ref/aa1/aa2 per step; `aligned_offset` is their own
        first-entry frame index (defaults to frame_offset). `aligned_base`
        (traced () int32) marks them as ring buffers with logical entry i at
        slot (base + i) % TT — see StreamState."""
        n, t = lrs.shape[:2]
        h, w = lrs.shape[2], lrs.shape[3]
        center = t // 2
        mid = self.mid_channels
        dt = lrs.dtype

        # frames t-1 down to center; step j=0 (frame t-1) gets a dummy zero flow
        # (warping the all-zero init is zeros regardless).
        frames = list(range(t - 1, center - 1, -1))
        rel = [i - frame_offset for i in frames]
        zero_flow = jnp.zeros((n, 1, h, w, 2), dt)
        # frame i (i < t-1) warps with backward_flows[:, i] (RefVSR.py:217)
        flows = jnp.concatenate(
            [zero_flow, jnp.stack([backward_flows[:, i] for i in frames[1:]], 1)],
            axis=1) if len(frames) > 1 else zero_flow
        xs = {
            "lr": jnp.stack([lrs[:, i] for i in frames], 0),
            "conf": jnp.stack([confs[:, i] for i in rel], 0),
            "flow": flows.transpose(1, 0, 2, 3, 4),
        }
        if aligneds is not None:
            aoff = frame_offset if aligned_offset is None else aligned_offset
            arel = [i - aoff for i in frames]
            # Scan over cache INDICES and dynamic-slice inside the body: the
            # reverse-ordered jnp.stack alternative materializes a full copy
            # of the (N, TT, 2h, 2w, C) cache (~3 GB at 1080p-HD-in) as a
            # scan input — measured as the largest HLO temp in the stream
            # graph. The cache arrays ride into the body as scan-invariant
            # captures instead.
            aidx = jnp.asarray(arel, jnp.int32)
            if aligned_base is not None:
                aidx = jnp.mod(aligned_base + aidx, aligneds.shape[1])
            xs["aidx"] = aidx
        else:
            xs["ref"] = jnp.stack([refs[:, i] for i in frames], 0)
            xs["index"] = jnp.stack([indices[:, i] for i in rel], 0)
        carry = (jnp.zeros((n, h, w, mid), dt),
                 jnp.zeros((n, 2 * h, 2 * w, mid), dt),
                 jnp.zeros((n, h, w, 1), dt))
        if aligneds is None:
            return self._scan_branch("backward", False, carry, xs)

        def step(mdl, c, x):
            x = dict(x)
            k = x.pop("aidx")
            x["aligned"] = jax.lax.dynamic_index_in_dim(
                aligneds, k, 1, keepdims=False)
            x["aligned_up"] = jax.lax.dynamic_index_in_dim(
                aligneds_up, k, 1, keepdims=False)
            return mdl._prop_step("backward", False, c, x)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        carry, _ = scan(self, carry, xs)
        return carry

    def _forward_step0(self, state: StreamState, lr, conf, ref=None,
                       index=None, aligned=None, aligned_up=None):
        """Peeled first forward step: warps the carried-in StreamState with its
        saved flow (RefVSR.py:256-260; zeros state for a first frame)."""
        carry = (state.feat_prop, state.feat_prop_up, state.conf_prop)
        x = {"lr": lr, "conf": conf, "flow": state.flow}
        if aligned is not None:
            x["aligned"], x["aligned_up"] = aligned, aligned_up
        else:
            x["ref"], x["index"] = ref, index
        carry, _ = self._prop_step("forward", False, carry, x)
        return carry

    def _forward_branch_full(self, state, lrs, refs, forward_flows, confs,
                             indices):
        """Forward branch over frames 0..t//2 (training / first frame)."""
        t = lrs.shape[1]
        center = t // 2
        carry0 = self._forward_step0(
            state, lrs[:, 0], confs[:, 0], ref=refs[:, 0],
            index=indices[:, 0])
        if center == 0:
            return carry0, carry0
        xs = {
            "lr": lrs[:, 1:center + 1].transpose(1, 0, 2, 3, 4),
            "ref": refs[:, 1:center + 1].transpose(1, 0, 2, 3, 4),
            "conf": confs[:, 1:center + 1].transpose(1, 0, 2, 3, 4),
            "index": indices[:, 1:center + 1].transpose(1, 0, 2),
            # frame i warps with forward_flows[:, i-1] (RefVSR.py:252)
            "flow": forward_flows[:, 0:center].transpose(1, 0, 2, 3, 4),
        }
        carry = self._scan_branch("forward", True, carry0, xs)
        return carry, carry0

    def _finalize(self, lr_center, bw_carry, fw_carry):
        _, backward_feat_up, conf_bw = bw_carry
        _, forward_feat_up, conf_fw = fw_carry
        base = jnp.clip(resize(lr_center, scale_factor=self.scale,
                               mode="bicubic", align_corners=False), 0.0, 1.0)
        return self.compute_up(backward_feat_up, forward_feat_up, conf_bw,
                               conf_fw, base)

    def forward_train(self, lrs, refs, state: StreamState):
        """Training window forward: full branches, state saved at forward step 0
        (RefVSR.py:279-283 with is_train=True). Returns (out, new_state)."""
        n, t = lrs.shape[:2]
        fwd_flows, bwd_flows = self.compute_flows(lrs)
        confs, indices = self.compute_matching(lrs, refs)

        bw_carry = self._backward_branch(lrs, refs, bwd_flows, confs, indices,
                                         0)
        fw_carry, fw_carry0 = self._forward_branch_full(
            state, lrs, refs, fwd_flows, confs, indices)
        out = self._finalize(lrs[:, t // 2], bw_carry, fw_carry)
        new_state = StreamState(
            feat_prop=jax.lax.stop_gradient(fw_carry0[0]),
            feat_prop_up=jax.lax.stop_gradient(fw_carry0[1]),
            conf_prop=jax.lax.stop_gradient(fw_carry0[2]),
            flow=jax.lax.stop_gradient(fwd_flows[:, 0]),
            flows_fwd=fwd_flows, flows_bwd=bwd_flows)
        return out, new_state

    def forward_first(self, lrs, refs):
        """Eval first-frame window: full branches, state saved at the center step
        (RefVSR.py:279-283 with is_train=False). Output clamped to [0,1]."""
        n, t = lrs.shape[:2]
        h, w = lrs.shape[2], lrs.shape[3]
        state = init_stream_state(n, h, w, self.mid_channels, lrs.dtype,
                                  num_frames=t)
        center = t // 2
        fwd_flows, bwd_flows = self.compute_flows(lrs)
        confs, indices = self.compute_matching(lrs, refs)
        # populate the RAP cache for the tail frames (the backward branch
        # consumes it directly, and subsequent forward_stream calls inherit a
        # warm cache — one compiled stream graph instead of cold+warm)
        aligneds, aligneds_up = self.compute_aligned_scan(
            lrs[:, center:], refs[:, center:], indices[:, center:])

        bw_carry = self._backward_branch(lrs, refs, bwd_flows, confs, indices,
                                         0, aligneds, aligneds_up,
                                         aligned_offset=center)
        fw_carry, _ = self._forward_branch_full(
            state, lrs, refs, fwd_flows, confs, indices)
        out = jnp.clip(self._finalize(lrs[:, center], bw_carry, fw_carry), 0, 1)
        conf_tail, index_tail = confs[:, center:], indices[:, center:]
        pipe = {}
        if self.pipeline_lanes > 1:
            # pipelined protocol: caches hold B + L - 1 frames; the window-0
            # tail frames sit at logical L-1..TT-1 so that after the L-1
            # priming dispatches (each shifts logicals down by one) frame 0
            # lands at logical 0 exactly when the first steady dispatch
            # needs it. Logical 0..L-2 are zero frames "before" the clip —
            # never read (primes discard the affected lanes' outputs).
            ext = self.pipeline_lanes - 1

            def front_pad(a):
                return jnp.concatenate(
                    [jnp.zeros((a.shape[0], ext) + a.shape[2:], a.dtype), a],
                    axis=1)

            aligneds = front_pad(aligneds)
            aligneds_up = front_pad(aligneds_up)
            conf_tail = front_pad(conf_tail)
            index_tail = front_pad(index_tail)
            mid = self.mid_channels
            h, w = lrs.shape[2], lrs.shape[3]
            pipe = dict(
                pipe_feat=jnp.zeros((ext * n, h, w, mid), lrs.dtype),
                pipe_feat_up=jnp.zeros((ext * n, 2 * h, 2 * w, mid),
                                       lrs.dtype),
                pipe_conf=jnp.zeros((ext * n, h, w, 1), lrs.dtype))
        new_state = StreamState(
            feat_prop=fw_carry[0], feat_prop_up=fw_carry[1],
            conf_prop=fw_carry[2], flow=fwd_flows[:, center],
            flows_fwd=fwd_flows, flows_bwd=bwd_flows,
            conf_tail=conf_tail, index_tail=index_tail,
            aligned_tail=aligneds, aligned_up_tail=aligneds_up,
            tail_base=jnp.zeros((), jnp.int32), **pipe)
        return out, new_state, (bw_carry[2], fw_carry[2], confs[:, center])

    def _shift_cached_flows(self, lrs, state: StreamState):
        """Window flows from the cached previous window + one new SPyNet pair
        (see StreamState docstring; values identical to recomputing all)."""
        if self.zero_flow:
            return state.flows_fwd, state.flows_bwd
        last, prev = lrs[:, -1], lrs[:, -2]
        pair = self.flow_net(jnp.concatenate([last, prev], 0),
                             jnp.concatenate([prev, last], 0))
        pair = jax.lax.stop_gradient(pair)
        n = lrs.shape[0]
        new_fwd, new_bwd = pair[:n], pair[n:]
        fwd = jnp.concatenate([state.flows_fwd[:, 1:], new_fwd[:, None]], 1)
        bwd = jnp.concatenate([state.flows_bwd[:, 1:], new_bwd[:, None]], 1)
        return fwd, bwd

    def forward_stream(self, lrs, refs, state: StreamState):
        """Eval streaming window: full backward branch, forward branch computes
        ONLY the center frame from the carried state (RefVSR.py:173-176,246-247).
        Matching/encoding run only for frames center..t-1."""
        n, t = lrs.shape[:2]
        center = t // 2
        fwd_flows, bwd_flows = self._shift_cached_flows(lrs, state)
        # only frames >= center are matched/encoded (RefVSR.py:198-202); with
        # a warm cache only the NEWEST frame needs fresh matching (shift
        # property, see StreamState docstring)
        if state.conf_tail is not None:
            new_conf, new_index = self.compute_matching(
                lrs[:, -1:], refs[:, -1:])
            confs = jnp.concatenate([state.conf_tail[:, 1:], new_conf], 1)
            indices = jnp.concatenate([state.index_tail[:, 1:], new_index], 1)
        else:
            confs, indices = self.compute_matching(lrs[:, center:],
                                                   refs[:, center:])
        # RAP cache (see StreamState docstring): one fresh encode+aa per
        # streamed frame; the other tail frames reuse cached aligned features.
        # Ring update: overwrite the expired slot in place (aliases the
        # donated buffer) and advance the base — no full-cache shift copy.
        if state.aligned_tail is not None:
            na, nau = self.compute_aligned(lrs[:, -1], refs[:, -1],
                                           indices[:, -1])
            tt = state.aligned_tail.shape[1]
            base_old = (state.tail_base if state.tail_base is not None
                        else jnp.zeros((), jnp.int32))
            aligneds = jax.lax.dynamic_update_slice_in_dim(
                state.aligned_tail, na[:, None], base_old, 1)
            aligneds_up = jax.lax.dynamic_update_slice_in_dim(
                state.aligned_up_tail, nau[:, None], base_old, 1)
            base = jnp.mod(base_old + 1, tt)
        else:
            aligneds, aligneds_up = self.compute_aligned_scan(
                lrs[:, center:], refs[:, center:], indices)
            base = jnp.zeros((), jnp.int32)

        bw_carry = self._backward_branch(lrs, refs, bwd_flows, confs, indices,
                                         center, aligneds, aligneds_up,
                                         aligned_base=base)
        fw_carry = self._forward_step0(
            state, lrs[:, center], confs[:, 0],
            aligned=jax.lax.dynamic_index_in_dim(aligneds, base, 1,
                                                 keepdims=False),
            aligned_up=jax.lax.dynamic_index_in_dim(aligneds_up, base, 1,
                                                    keepdims=False))
        out = jnp.clip(self._finalize(lrs[:, center], bw_carry, fw_carry), 0, 1)
        new_state = StreamState(
            feat_prop=fw_carry[0], feat_prop_up=fw_carry[1],
            conf_prop=fw_carry[2], flow=fwd_flows[:, center],
            flows_fwd=fwd_flows, flows_bwd=bwd_flows,
            conf_tail=confs, index_tail=indices,
            aligned_tail=aligneds, aligned_up_tail=aligneds_up,
            tail_base=base)
        return out, new_state, (bw_carry[2], fw_carry[2], confs[:, 0])

    # ---------------- pipelined streaming ----------------

    def _pipeline_plan(self, t: int):
        """Static index plan for L-lane pipelined streaming (see class
        docstring). Returns (L, P, B, TT, center)."""
        lanes = self.pipeline_lanes
        center = t // 2
        b_steps = t - center  # backward-chain steps: frames t-1 .. center
        assert lanes > 1 and b_steps % lanes == 0, (
            f"pipeline_lanes={lanes} must divide {b_steps} backward steps")
        assert center - lanes + 1 >= 0, (
            f"pipeline_lanes={lanes} needs t >= 2*lanes - 1")
        return lanes, b_steps // lanes, b_steps, b_steps + lanes - 1, center

    def _pipeline_dispatch(self, lrs, refs, state: StreamState, emit: bool):
        """One pipelined dispatch at window center d: advance the stream
        caches by one frame, run P batched prop sub-steps over the L
        in-flight backward chains, and (emit=True) finish the oldest chain
        into output frame d - (L-1).

        Lane l handles the chain of output d - l at steps s = l*P + p
        (p = 0..P-1), consuming frame d + center - l*(P+1) - p: window-
        relative lr index 2*center - l*(P+1) - p, backward-flow pair at the
        same relative index (zero flow at s=0 — the chain anchor), and
        conf/aligned at cache logical TT-1 - (l*(P+1) + p). Each value
        equals what forward_stream's sequential chain consumes, so outputs
        are bit-compatible up to batched-op reassociation."""
        n, t = lrs.shape[:2]
        lanes, p_steps, _, tt, center = self._pipeline_plan(t)
        assert state.aligned_tail is not None and state.pipe_feat is not None
        assert state.aligned_tail.shape[1] == tt, (
            "state rings are not pipeline-sized; run forward_first on a "
            "pipeline_lanes>1 net first")
        dt = lrs.dtype

        # ---- cache advance (same per-frame work as forward_stream)
        fwd_flows, bwd_flows = self._shift_cached_flows(lrs, state)
        new_conf, new_index = self.compute_matching(lrs[:, -1:], refs[:, -1:])
        confs = jnp.concatenate([state.conf_tail[:, 1:], new_conf], 1)
        indices = jnp.concatenate([state.index_tail[:, 1:], new_index], 1)
        na, nau = self.compute_aligned(lrs[:, -1], refs[:, -1],
                                       indices[:, -1])
        base_old = (state.tail_base if state.tail_base is not None
                    else jnp.zeros((), jnp.int32))
        aligneds = jax.lax.dynamic_update_slice_in_dim(
            state.aligned_tail, na[:, None], base_old, 1)
        aligneds_up = jax.lax.dynamic_update_slice_in_dim(
            state.aligned_up_tail, nau[:, None], base_old, 1)
        base = jnp.mod(base_old + 1, tt)

        # ---- P batched sub-steps over the L lanes
        carry = (jnp.concatenate([jnp.zeros_like(state.feat_prop),
                                  state.pipe_feat], 0),
                 jnp.concatenate([jnp.zeros_like(state.feat_prop_up),
                                  state.pipe_feat_up], 0),
                 jnp.concatenate([jnp.zeros_like(state.conf_prop),
                                  state.pipe_conf], 0))
        zero_flow = jnp.zeros(state.flow.shape, dt)
        for p in range(p_steps):
            lr_l, conf_l, flow_l, al_l, alu_l = [], [], [], [], []
            for lane in range(lanes):
                off = lane * (p_steps + 1) + p
                rel = 2 * center - off
                lr_l.append(lrs[:, rel])
                conf_l.append(confs[:, tt - 1 - off])
                flow_l.append(zero_flow if off == 0 else bwd_flows[:, rel])
                slot = jnp.mod(base + tt - 1 - off, tt)
                al_l.append(jax.lax.dynamic_index_in_dim(
                    aligneds, slot, 1, keepdims=False))
                alu_l.append(jax.lax.dynamic_index_in_dim(
                    aligneds_up, slot, 1, keepdims=False))
            x = {"lr": jnp.concatenate(lr_l, 0),
                 "conf": jnp.concatenate(conf_l, 0),
                 "flow": jnp.concatenate(flow_l, 0),
                 "aligned": jnp.concatenate(al_l, 0),
                 "aligned_up": jnp.concatenate(alu_l, 0)}
            carry, _ = self._prop_step("backward", False, carry, x)

        keep = (lanes - 1) * n
        new_pipe = dict(pipe_feat=carry[0][:keep],
                        pipe_feat_up=carry[1][:keep],
                        pipe_conf=carry[2][:keep])

        if not emit:
            # priming dispatch: the oldest lane's output is a not-yet-real
            # chain (pre-clip zeros feed it) — drop it; keep the fw carry.
            new_state = state.replace(
                flow=fwd_flows[:, center - lanes + 1],
                flows_fwd=fwd_flows, flows_bwd=bwd_flows,
                conf_tail=confs, index_tail=indices,
                aligned_tail=aligneds, aligned_up_tail=aligneds_up,
                tail_base=base, **new_pipe)
            return new_state

        bw_carry = (carry[0][keep:], carry[1][keep:], carry[2][keep:])
        # forward step + finalize for the emitted frame d - (L-1): its
        # conf/aligned sit at cache logical 0 (= ring slot `base`)
        fwi = center - lanes + 1
        fw_carry = self._forward_step0(
            state, lrs[:, fwi], confs[:, 0],
            aligned=jax.lax.dynamic_index_in_dim(aligneds, base, 1,
                                                 keepdims=False),
            aligned_up=jax.lax.dynamic_index_in_dim(aligneds_up, base, 1,
                                                    keepdims=False))
        out = jnp.clip(self._finalize(lrs[:, fwi], bw_carry, fw_carry), 0, 1)
        new_state = StreamState(
            feat_prop=fw_carry[0], feat_prop_up=fw_carry[1],
            conf_prop=fw_carry[2], flow=fwd_flows[:, center - lanes + 1],
            flows_fwd=fwd_flows, flows_bwd=bwd_flows,
            conf_tail=confs, index_tail=indices,
            aligned_tail=aligneds, aligned_up_tail=aligneds_up,
            tail_base=base, **new_pipe)
        return out, new_state, (bw_carry[2], fw_carry[2], confs[:, 0])

    def forward_stream_prime(self, lrs, refs, state: StreamState):
        """Priming dispatch (windows 1..L-1 after forward_first): advances
        caches and in-flight chains, emits nothing."""
        return self._pipeline_dispatch(lrs, refs, state, emit=False)

    def forward_stream_pipelined(self, lrs, refs, state: StreamState):
        """Steady pipelined dispatch at window center d: emits output frame
        d - (L-1) (identical values to forward_stream's output for that
        frame, L-1 dispatches late)."""
        return self._pipeline_dispatch(lrs, refs, state, emit=True)

    def __call__(self, lrs, refs, state: StreamState):
        """Default entry = training forward (used for init/jit checks)."""
        return self.forward_train(lrs, refs, state)
