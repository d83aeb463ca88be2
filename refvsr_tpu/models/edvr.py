"""EDVR-M feature extractor for information refill (Ours-IR), NHWC.

Reference: /root/reference/models/archs/edvr_net.py (ModulatedDCNPack /
PCDAlignment / TSAFusion; the mmcv CUDA modulated deformable conv is the one
native kernel in the reference — SURVEY.md §2.3).

TPU-native modulated DCN: deform groups are folded into the batch axis, the
k*k taps are bilinearly gathered in one pass, the modulation mask is applied,
and the contraction with the conv weight becomes a single [HW, k*k*C] x
[k*k*C, O] MXU matmul. Offset channel layout matches mmcv exactly
(per-group taps with interleaved (dy, dx); mask after the 2/3 split;
ModulatedDCNPack chunks its offset conv output into o1|o2|mask and
concatenates o1,o2 — edvr_net.py:50-58) so `edvrm` weights convert directly."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.models.blocks import Conv2d, ResidualBlockNoBN, lrelu
from refvsr_tpu.ops.resize import resize


def modulated_deform_conv(x, offset, mask, weight, bias, deform_groups: int):
    """mmcv modulated_deform_conv2d semantics (stride 1, pad 1, dilation 1,
    3x3 — the only configuration EDVR uses).

    x:      (N, H, W, C)
    offset: (N, H, W, 2*dg*k*k) — mmcv layout: [o1(dg*k*k) | o2(dg*k*k)] where
            the CUDA kernel reads channel 2*t as dy and 2*t+1 as dx per group;
            since conv_offset is learned from zero-init, we only need to be
            *consistent* with mmcv's read order for checkpoint parity:
            group-major, tap-major, (dy, dx) interleaved after the o1|o2 concat
            is reinterpreted by the kernel as that interleaved layout.
    mask:   (N, H, W, dg*k*k), already sigmoided.
    weight: (kh, kw, C, O) HWIO.
    """
    n, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    ntaps = kh * kw
    dg = deform_groups
    cg = c // dg
    pad = kh // 2

    # base tap coordinates (pad=1 conv): sample at (y + i - pad, x + j - pad)
    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    ty, tx = np.meshgrid(np.arange(kh, dtype=np.float32) - pad,
                         np.arange(kw, dtype=np.float32) - pad, indexing="ij")
    base_y = gy[None, :, :, None] + ty.reshape(-1)[None, None, None, :]
    base_x = gx[None, :, :, None] + tx.reshape(-1)[None, None, None, :]

    # mmcv interleaved read: offset viewed as (dg, ntaps, 2{dy,dx})
    off = offset.reshape(n, h, w, dg, ntaps, 2)
    dy = off[..., 0]
    dx = off[..., 1]
    sy = base_y[:, :, :, None, :] + dy.transpose(0, 1, 2, 3, 4)
    sx = base_x[:, :, :, None, :] + dx

    # fold groups into batch: (N*dg, H, W, ntaps) coords over (N*dg, H, W, cg)
    xg = x.reshape(n, h, w, dg, cg).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, cg)
    sy = sy.transpose(0, 3, 1, 2, 4).reshape(n * dg, h, w, ntaps)
    sx = sx.transpose(0, 3, 1, 2, 4).reshape(n * dg, h, w, ntaps)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    # ring canvas + ONE quad row gather per tap (see ops/warp.py): anchors in
    # [-1, S-1] read exact zeros one step outside; fully-outside taps are
    # masked below (zero-padding semantics of the mmcv CUDA kernel)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)

    from refvsr_tpu.ops.warp import build_corner_canvas, gather_corners
    canvas = build_corner_canvas(xg, ring=True)
    v00, v01, v10, v11 = gather_corners(canvas, y0i, x0i)

    dt = x.dtype
    w00 = ((1 - wy) * (1 - wx))[..., None].astype(dt)
    w01 = ((1 - wy) * wx)[..., None].astype(dt)
    w10 = (wy * (1 - wx))[..., None].astype(dt)
    w11 = (wy * wx)[..., None].astype(dt)
    sampled = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    valid = ((y0 >= -1.0) & (y0 <= h - 1.0) & (x0 >= -1.0) & (x0 <= w - 1.0))
    sampled = jnp.where(valid[..., None], sampled, jnp.zeros((), dt))

    m = mask.reshape(n, h, w, dg, ntaps).transpose(0, 3, 1, 2, 4).reshape(
        n * dg, h, w, ntaps)
    sampled = sampled * m[..., None].astype(x.dtype)

    # back to (N, H, W, ntaps, C) with original channel order, then one matmul
    sampled = sampled.reshape(n, dg, h, w, ntaps, cg).transpose(
        0, 2, 3, 4, 1, 5).reshape(n, h, w, ntaps * c)
    wmat = weight.reshape(ntaps * c, o)
    out = jnp.einsum("nhwk,ko->nhwo", sampled, wmat,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


class ModulatedDCNPack(nn.Module):
    """DCNv2 whose offsets/mask come from a separate feature
    (edvr_net.py:15-58). conv_offset is zero-initialized."""
    features: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, extra_feat):
        dg, k = self.deform_groups, 3
        off = nn.Conv(dg * 3 * k * k, (k, k), padding=((1, 1), (1, 1)),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="conv_offset")(
                          extra_feat)
        o1, o2, mask = jnp.split(off, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        weight = self.param(
            "weight", nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                       "uniform"),
            (k, k, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return modulated_deform_conv(x, offset, mask, weight, bias, dg)


class ConvModule(nn.Module):
    """mmcv ConvModule (conv + optional LeakyReLU(0.1))."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel_size, self.stride, name="conv")(x)
        return lrelu(x, 0.1) if self.act else x


def _up2x(x):
    return resize(x, scale_factor=2, mode="bilinear", align_corners=False)


class PCDAlignment(nn.Module):
    """3-level pyramid cascading deformable alignment (edvr_net.py:61-187)."""
    mid_channels: int = 64
    deform_groups: int = 8

    def setup(self):
        for i in (3, 2, 1):
            setattr(self, f"offset_conv1_l{i}",
                    ConvModule(self.mid_channels, name=f"offset_conv1_l{i}"))
            setattr(self, f"offset_conv2_l{i}",
                    ConvModule(self.mid_channels, name=f"offset_conv2_l{i}"))
            if i < 3:
                setattr(self, f"offset_conv3_l{i}",
                        ConvModule(self.mid_channels, name=f"offset_conv3_l{i}"))
                setattr(self, f"feat_conv_l{i}",
                        ConvModule(self.mid_channels, act=(i == 2),
                                   name=f"feat_conv_l{i}"))
            setattr(self, f"dcn_pack_l{i}",
                    ModulatedDCNPack(self.mid_channels, self.deform_groups,
                                     name=f"dcn_pack_l{i}"))
        self.cas_offset_conv1 = ConvModule(self.mid_channels,
                                           name="cas_offset_conv1")
        self.cas_offset_conv2 = ConvModule(self.mid_channels,
                                           name="cas_offset_conv2")
        self.cas_dcnpack = ModulatedDCNPack(self.mid_channels,
                                            self.deform_groups,
                                            name="cas_dcnpack")

    def __call__(self, neighbor_feats, ref_feats):
        """neighbor/ref feats: [L1 (N,H,W,C), L2 (N,H/2..), L3 (N,H/4..)]."""
        upsampled_offset = upsampled_feat = None
        feat = None
        for i in (3, 2, 1):
            offset = jnp.concatenate([neighbor_feats[i - 1], ref_feats[i - 1]],
                                     axis=-1)
            offset = getattr(self, f"offset_conv1_l{i}")(offset)
            if i == 3:
                offset = getattr(self, f"offset_conv2_l{i}")(offset)
            else:
                offset = getattr(self, f"offset_conv2_l{i}")(
                    jnp.concatenate([offset, upsampled_offset], axis=-1))
                offset = getattr(self, f"offset_conv3_l{i}")(offset)

            feat = getattr(self, f"dcn_pack_l{i}")(neighbor_feats[i - 1],
                                                   offset)
            if i == 3:
                feat = lrelu(feat, 0.1)
            else:
                feat = getattr(self, f"feat_conv_l{i}")(
                    jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                upsampled_offset = _up2x(offset) * 2.0
                upsampled_feat = _up2x(feat)

        offset = jnp.concatenate([feat, ref_feats[0]], axis=-1)
        offset = self.cas_offset_conv2(self.cas_offset_conv1(offset))
        return lrelu(self.cas_dcnpack(feat, offset), 0.1)


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (edvr_net.py:190-296)."""
    mid_channels: int = 64
    num_frames: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned_feat):
        """aligned_feat: (N, T, H, W, C) -> (N, H, W, C)."""
        n, t, h, w, c = aligned_feat.shape
        emb_ref = Conv2d(c, 3, name="temporal_attn1")(
            aligned_feat[:, self.center_frame_idx])
        emb = Conv2d(c, 3, name="temporal_attn2")(
            aligned_feat.reshape(n * t, h, w, c)).reshape(n, t, h, w, c)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)        # (N, T, H, W)
        corr_prob = jax.nn.sigmoid(corr)[..., None]            # (N, T, H, W, 1)
        feat_w = (aligned_feat * corr_prob).transpose(0, 2, 3, 1, 4).reshape(
            n, h, w, t * c)

        feat = ConvModule(c, 1, name="feat_fusion")(feat_w)

        def max_pool3(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1),
                                                                   (1, 1)))

        def avg_pool3(x):
            # torch AvgPool2d(3, stride=2, padding=1) counts padded zeros
            s = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            count_include_pad=True)
            return s

        attn = ConvModule(c, 1, name="spatial_attn1")(feat_w)
        attn = ConvModule(c, 1, name="spatial_attn2")(
            jnp.concatenate([max_pool3(attn), avg_pool3(attn)], axis=-1))
        attn_level = ConvModule(c, 1, name="spatial_attn_l1")(attn)
        attn_level = ConvModule(c, 3, name="spatial_attn_l2")(
            jnp.concatenate([max_pool3(attn_level), avg_pool3(attn_level)],
                            axis=-1))
        attn_level = ConvModule(c, 3, name="spatial_attn_l3")(attn_level)
        attn_level = _up2x(attn_level)

        attn = ConvModule(c, 3, name="spatial_attn3")(attn) + attn_level
        attn = ConvModule(c, 1, name="spatial_attn4")(attn)
        attn = _up2x(attn)
        attn = Conv2d(c, 3, name="spatial_attn5")(attn)
        attn_add = Conv2d(c, 1, name="spatial_attn_add2")(
            ConvModule(c, 1, name="spatial_attn_add1")(attn))
        attn = jax.nn.sigmoid(attn)
        return feat * attn * 2.0 + attn_add


class EDVRFeatureExtractor(nn.Module):
    """EDVR-M trunk used as keyframe feature extractor (RefVSR_IR.py:424-546)."""
    mid_channels: int = 64
    num_frames: int = 5
    deform_groups: int = 8
    num_blocks_extraction: int = 5
    center_frame_idx: int = 2

    def setup(self):
        self.conv_first = Conv2d(self.mid_channels, 3, name="conv_first")
        self.feature_extraction = [
            ResidualBlockNoBN(self.mid_channels, name=f"feature_extraction_{i}")
            for i in range(self.num_blocks_extraction)]
        self.feat_l2_conv1 = ConvModule(self.mid_channels, 3, stride=2,
                                        name="feat_l2_conv1")
        self.feat_l2_conv2 = ConvModule(self.mid_channels, 3,
                                        name="feat_l2_conv2")
        self.feat_l3_conv1 = ConvModule(self.mid_channels, 3, stride=2,
                                        name="feat_l3_conv1")
        self.feat_l3_conv2 = ConvModule(self.mid_channels, 3,
                                        name="feat_l3_conv2")
        self.pcd_alignment = PCDAlignment(self.mid_channels,
                                          self.deform_groups,
                                          name="pcd_alignment")
        self.fusion = TSAFusion(self.mid_channels, self.num_frames,
                                self.center_frame_idx, name="fusion")

    def __call__(self, x):
        """x: (N, T, H, W, 3) -> (N, H, W, mid_channels). H, W must be /4."""
        n, t, h, w, c = x.shape
        l1 = lrelu(self.conv_first(x.reshape(n * t, h, w, c)), 0.1)
        for blk in self.feature_extraction:
            l1 = blk(l1)
        l2 = self.feat_l2_conv2(self.feat_l2_conv1(l1))
        l3 = self.feat_l3_conv2(self.feat_l3_conv1(l2))

        l1 = l1.reshape(n, t, h, w, -1)
        l2 = l2.reshape(n, t, h // 2, w // 2, -1)
        l3 = l3.reshape(n, t, h // 4, w // 4, -1)

        ref = [l1[:, self.center_frame_idx], l2[:, self.center_frame_idx],
               l3[:, self.center_frame_idx]]
        aligned = [self.pcd_alignment([l1[:, i], l2[:, i], l3[:, i]], ref)
                   for i in range(t)]
        return self.fusion(jnp.stack(aligned, axis=1))
