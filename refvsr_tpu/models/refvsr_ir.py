"""RefVSR-IR ('Ours-IR'): RefVSR + IconVSR-style information refill, NHWC.

Reference: /root/reference/models/archs/RefVSR_IR.py:20-546. Structural deltas
vs plain RefVSR (all preserved here):
  - EDVR-M keyframe feature extractor with temporal mirror padding
    (RefVSR_IR.py:194-215) and spatial /4 reflect padding (:172-191)
  - refill fusion convs before each branch's resblocks at keyframes
    (:95-98, :294-297, :333-335)
  - the backward branch covers the FULL window (t-1..0) and stores per-step
    outputs consumed by the forward branch (:283-313); forward resblocks take
    2*mid+3 channels (:103-104)
  - keyframe indices slide across streamed windows (:255-264)
  - NO center-only streaming fast path: every call runs both full branches
    and saves state at forward step 0 (:321-352)

TPU redesign: refill features are computed for ALL frames in one batched EDVR
pass and gated per-step by a keyframe flag inside the scan (identical math at
keyframes; non-keyframe results are discarded by the flag). This keeps ONE
compiled graph while the reference recompiles nothing but evaluates EDVR only
at keyframes — a throughput trade that favors TPU (one big batch) over many
small launches.

REFERENCE BUG faithfully replicated (checkpoint parity): in the forward branch
at i > 0, feat_prop warps with forward_flows[:, i-1] but feat_prop_UP and
conf_map_prop warp with the *stale* `flow` variable left over from the
backward loop (= backward_flows[:, 0]); see RefVSR_IR.py:325-327. Pass
fix_stale_flow_bug=True to use the correct flow instead."""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.models.blocks import (
    BasicBlock, Conv2d, PixelShufflePack, ResidualBlocksWithInputConv, ResList)
from refvsr_tpu.models.edvr import EDVRFeatureExtractor
from refvsr_tpu.models.matching import AlignedAttention, FeatureMatching
from refvsr_tpu.models.refvsr import (RefVSRNet, StreamState, _flow_up2,
                                      init_stream_state)
from refvsr_tpu.models.spynet import SPyNet
from refvsr_tpu.ops.resize import resize
from refvsr_tpu.ops.warp import warp


def sliding_keyframe_mask(t: int, stride: int, prev_first: int | None):
    """Keyframe indices for a window (RefVSR_IR.py:255-264) as a bool mask.

    prev_first: first keyframe index of the previous window, or None if this is
    a first frame. Returns (mask[t], first_keyframe_idx) — host-side helper for
    the streaming runner."""
    if prev_first is None:
        idx = np.arange(0, t, stride)
    else:
        new_first = prev_first - 1
        if new_first < 0:
            new_first += stride
        idx = np.arange(new_first, t, stride)
    if idx[-1] != t - 1:
        idx = np.append(idx, t - 1)
    mask = np.zeros(t, bool)
    mask[idx] = True
    return mask, int(idx[0])


class RefVSRIRNet(nn.Module):
    scale: int = 4
    num_blocks: int = 30
    mid_channels: int = 36
    matching_ksize: int = 2
    flag_HD_in: bool = False
    keyframe_stride: int = 5
    zero_flow: bool = False
    edvr_padding: int = 2
    fix_stale_flow_bug: bool = False

    def setup(self):
        mid = self.mid_channels
        self.edvr = EDVRFeatureExtractor(
            num_frames=2 * self.edvr_padding + 1,
            center_frame_idx=self.edvr_padding, name="edvr")
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

        self.backward_fusion = Conv2d(mid, 3, name="backward_fusion")
        self.forward_fusion = Conv2d(mid, 3, name="forward_fusion")
        self.backward_resblocks = ResidualBlocksWithInputConv(
            mid, self.num_blocks, name="backward_resblocks")
        self.forward_resblocks = ResidualBlocksWithInputConv(
            mid, self.num_blocks, name="forward_resblocks")

        self.fusion_UP = Conv2d(mid, kernel_size=1, name="fusion_UP")
        self.upsample1 = PixelShufflePack(mid, 2, name="upsample1")
        if self.scale == 4:
            self.upsample2 = PixelShufflePack(mid, 2, name="upsample2")
        self.conv_hr = Conv2d(mid, 3, name="conv_hr")
        self.conv_last = Conv2d(3, 3, name="conv_last")

    # shared with RefVSRNet — reuse the implementations via delegation
    _seq2 = RefVSRNet._seq2
    compute_flows = RefVSRNet.compute_flows
    compute_matching = RefVSRNet.compute_matching
    encode_ref = RefVSRNet.encode_ref
    compute_aligned = RefVSRNet.compute_aligned
    compute_aligned_batched = RefVSRNet.compute_aligned_batched
    _shift_cached_flows = RefVSRNet._shift_cached_flows
    rap = RefVSRNet.rap
    compute_up = RefVSRNet.compute_up
    _finalize = RefVSRNet._finalize
    _tail = RefVSRNet._tail
    _tail_tiled = RefVSRNet._tail_tiled
    _TAIL_TILE_THRESHOLD = RefVSRNet._TAIL_TILE_THRESHOLD

    # ---------------- information refill ----------------

    def compute_refill_features(self, lrs):
        """Batched EDVR refill features for ALL frames (RefVSR_IR.py:194-215).
        lrs: (N, T, H, W, 3); returns (N, T, H, W, 64)."""
        n, t, h, w, c = lrs.shape
        pad_h = (4 - h % 4) % 4
        pad_w = (4 - w % 4) % 4
        if pad_h or pad_w:
            x = lrs.reshape(n * t, h, w, c)
            x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w), (0, 0)],
                        mode="reflect")
            lrs_p = x.reshape(n, t, h + pad_h, w + pad_w, c)
        else:
            lrs_p = lrs
        p = self.edvr_padding
        if p == 2:
            mirror = [lrs_p[:, [4, 3]], lrs_p, lrs_p[:, [-4, -5]]]
        else:
            mirror = [lrs_p[:, [6, 5, 4]], lrs_p, lrs_p[:, [-5, -6, -7]]]
        seq = jnp.concatenate(mirror, axis=1)
        nf = 2 * p + 1
        # batched sliding windows: frame i uses seq[:, i:i+nf]
        wins = jnp.stack([seq[:, i:i + nf] for i in range(t)], axis=1)
        wins = wins.reshape((n * t, nf) + lrs_p.shape[2:])
        feats = self.edvr(wins)
        feats = feats.reshape((n, t) + feats.shape[1:])
        return feats[:, :, :h, :w, :]

    # ---------------- propagation ----------------

    def _ir_step(self, branch: str, carry, x):
        """One IR propagation step. x extra fields vs RefVSR: 'refill',
        'is_key', and (forward only) 'bw_out' + 'flow_up_src'."""
        feat_prop, feat_prop_up, conf_prop = carry
        up_flow = x["flow_up"]
        mid = feat_prop.shape[-1]
        if branch == "backward":
            # conf rides the feature warp (same flow; 1ch-alone warps are slow)
            packed = warp(jnp.concatenate([feat_prop, conf_prop], -1),
                          x["flow"])
            feat_prop, conf_prop = packed[..., :mid], packed[..., mid:]
            feat_prop_up = warp(feat_prop_up, _flow_up2(x["flow"]))
        else:
            # forward: feat warps with the true flow; UP warps the LOW-res
            # feat (RefVSR.py:254 behavior) and conf with the (possibly stale
            # — see module docstring) up_flow
            feat_prop = warp(feat_prop, x["flow"])
            feat_prop_up = warp(feat_prop, _flow_up2(up_flow))
            conf_prop = warp(conf_prop, up_flow)

        # information refill at keyframes (RefVSR_IR.py:294-297,333-335)
        fusion = (self.backward_fusion if branch == "backward"
                  else self.forward_fusion)
        refilled = fusion(jnp.concatenate([feat_prop, x["refill"]], -1))
        feat_prop = jnp.where(x["is_key"][:, None, None, None], refilled,
                              feat_prop)

        if branch == "backward":
            agg = self.backward_resblocks(
                jnp.concatenate([x["lr"], feat_prop], -1))
        else:
            agg = self.forward_resblocks(
                jnp.concatenate([x["lr"], x["bw_out"], feat_prop], -1))
        feat_prop, feat_prop_up, conf_prop = self.rap(
            x["conf"], conf_prop, agg, feat_prop_up, x["aligned"],
            x["aligned_up"])
        return (feat_prop, feat_prop_up, conf_prop), feat_prop

    def _scan(self, branch, carry, xs):
        def step(mdl, c, x):
            return mdl._ir_step(branch, c, x)
        return nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})(self, carry, xs)

    def _stack_time(self, arrs):
        return jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(a, 1, 0), arrs)

    def __call__(self, lrs, refs, state: StreamState, keyframe_mask=None):
        return self.forward_train(lrs, refs, state, keyframe_mask)

    def _run(self, lrs, refs, state: StreamState, keyframe_mask, clamp_out,
             cached_flows: bool = False):
        n, t, h, w, _ = lrs.shape
        center = t // 2
        mid = self.mid_channels
        dt = lrs.dtype
        if keyframe_mask is None:
            keyframe_mask = sliding_keyframe_mask(t, self.keyframe_stride,
                                                  None)[0]

        if cached_flows:
            # streamed window: shift the cached flows + ONE new SPyNet pair
            # (identical values; see StreamState docstring)
            fwd_flows, bwd_flows = self._shift_cached_flows(lrs, state)
        else:
            fwd_flows, bwd_flows = self.compute_flows(lrs)
        confs, indices = self.compute_matching(lrs, refs)
        # carry-independent RAP half, batched over the window (IR inputs are
        # 270p — the whole-window batch is cheap here, unlike the 8K RefVSR)
        aligneds, aligneds_up = self.compute_aligned_batched(lrs, refs,
                                                             indices)
        refill = self.compute_refill_features(lrs)
        kf = jnp.broadcast_to(
            jnp.asarray(keyframe_mask, bool)[None, :], (n, t))

        # ---- backward branch over frames t-1..0 ----
        frames = list(range(t - 1, -1, -1))
        zero_flow = jnp.zeros((n, 1, h, w, 2), dt)
        parts = [zero_flow] + [bwd_flows[:, i][:, None] for i in frames[1:]]
        bw_flows = jnp.concatenate(parts, 1)
        xs_b = self._stack_time({
            "lr": lrs[:, frames], "conf": confs[:, frames],
            "aligned": aligneds[:, frames],
            "aligned_up": aligneds_up[:, frames],
            "refill": refill[:, frames], "is_key": kf[:, frames],
            "flow": bw_flows, "flow_up": bw_flows,
        })
        carry0 = (jnp.zeros((n, h, w, mid), dt),
                  jnp.zeros((n, 2 * h, 2 * w, mid), dt),
                  jnp.zeros((n, h, w, 1), dt))

        def bw_step(mdl, c, x):
            new_c, feat = mdl._ir_step("backward", c, x)
            # also emit the UP/conf states so the center capture
            # (RefVSR_IR.py:309-311) can be sliced out afterwards
            return new_c, (feat, new_c[1], new_c[2])

        (_, _, _), (bw_feats, bw_ups, bw_confs) = nn.scan(
            bw_step, variable_broadcast="params",
            split_rngs={"params": False})(self, carry0, xs_b)
        # scan step j handled frame t-1-j; frame i is at j = t-1-i
        bw_out_frames = jnp.flip(bw_feats, axis=0)       # (T, N, h, w, mid)
        backward_feat_up = bw_ups[t - 1 - center]
        conf_prop_backward = bw_confs[t - 1 - center]

        # ---- forward branch over frames 0..center ----
        stale_flow = bwd_flows[:, 0]  # the reference bug (RefVSR_IR.py:326)
        # step 0 (peeled): warp carried state with its saved flow
        x0 = {
            "lr": lrs[:, 0], "conf": confs[:, 0],
            "aligned": aligneds[:, 0], "aligned_up": aligneds_up[:, 0],
            "refill": refill[:, 0],
            "is_key": kf[:, 0], "flow": state.flow, "flow_up": state.flow,
            "bw_out": bw_out_frames[0],
        }
        carry = (state.feat_prop, state.feat_prop_up, state.conf_prop)
        # step-0 continue path warps the saved UP tensor (RefVSR_IR.py:330)
        feat_prop, feat_prop_up, conf_prop = carry
        packed = warp(jnp.concatenate([feat_prop, conf_prop], -1), x0["flow"])
        feat_prop, conf_prop = packed[..., :mid], packed[..., mid:]
        feat_prop_up = warp(feat_prop_up, _flow_up2(x0["flow"]))
        refilled = self.forward_fusion(
            jnp.concatenate([feat_prop, x0["refill"]], -1))
        feat_prop = jnp.where(x0["is_key"][:, None, None, None], refilled,
                              feat_prop)
        agg = self.forward_resblocks(
            jnp.concatenate([x0["lr"], x0["bw_out"], feat_prop], -1))
        feat_prop, feat_prop_up, conf_prop = self.rap(
            x0["conf"], conf_prop, agg, feat_prop_up, x0["aligned"],
            x0["aligned_up"])
        carry = (feat_prop, feat_prop_up, conf_prop)
        saved = (feat_prop, feat_prop_up, conf_prop)  # i==0 save (:348-352)

        if center > 0:
            fr = list(range(1, center + 1))
            up_flow = (fwd_flows[:, [i - 1 for i in fr]]
                       if self.fix_stale_flow_bug else
                       jnp.broadcast_to(stale_flow[:, None],
                                        (n, len(fr), h, w, 2)))
            xs_f = self._stack_time({
                "lr": lrs[:, fr], "conf": confs[:, fr],
                "aligned": aligneds[:, fr],
                "aligned_up": aligneds_up[:, fr],
                "refill": refill[:, fr], "is_key": kf[:, fr],
                "flow": fwd_flows[:, [i - 1 for i in fr]],
                "flow_up": up_flow,
                "bw_out": bw_out_frames[1:center + 1].transpose(1, 0, 2, 3, 4),
            })
            carry, _ = self._scan("forward", carry, xs_f)

        out = self._finalize(lrs[:, center],
                             (None, backward_feat_up, conf_prop_backward),
                             (None, carry[1], carry[2]))
        if clamp_out:
            out = jnp.clip(out, 0.0, 1.0)
        new_state = StreamState(
            feat_prop=jax.lax.stop_gradient(saved[0]),
            feat_prop_up=jax.lax.stop_gradient(saved[1]),
            conf_prop=jax.lax.stop_gradient(saved[2]),
            flow=jax.lax.stop_gradient(fwd_flows[:, 0]),
            flows_fwd=jax.lax.stop_gradient(fwd_flows),
            flows_bwd=jax.lax.stop_gradient(bwd_flows))
        return out, new_state, (conf_prop_backward, carry[2], confs[:, center])

    def forward_train(self, lrs, refs, state: StreamState, keyframe_mask=None):
        out, new_state, _ = self._run(lrs, refs, state, keyframe_mask,
                                      clamp_out=False)
        return out, new_state

    def forward_first(self, lrs, refs, keyframe_mask=None):
        n, t, h, w, _ = lrs.shape
        state = init_stream_state(n, h, w, self.mid_channels, lrs.dtype,
                                  num_frames=t)
        return self._run(lrs, refs, state, keyframe_mask, clamp_out=True)

    def forward_stream(self, lrs, refs, state: StreamState,
                       keyframe_mask=None):
        return self._run(lrs, refs, state, keyframe_mask, clamp_out=True,
                         cached_flows=True)
