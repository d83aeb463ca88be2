"""SPyNet optical flow (frozen in RefVSR) — TPU-native reimplementation.

Reference: /root/reference/models/archs/SPyNet.py:12-202 (mmedit/openmmlab
variant: 6 basic modules, no BN). Numerical conventions replicated:
  - inputs resized to a /32 multiple with bilinear align_corners=False (:117-126)
  - ImageNet-normalized (:62-63), 5x avg-pool pyramid (:66-78)
  - per-level: flow upsampled 2x bilinear align_corners=True * 2 (:88-92),
    residual from basic_module(cat[ref, flow_warp(supp, flow_up, border), flow_up])
  - output flow resized to input size (align_corners=False) and scaled per-axis
    by w/w_up, h/h_up (:129-137).

Flow tensors are NHWC with channel order (fx, fy).  The weights are frozen at
train time (RefVSR.py:28-29) — the trainer masks them out of the optimizer."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from refvsr_tpu.models.blocks import Conv2d
from refvsr_tpu.ops.resize import resize, avg_pool_2x2
from refvsr_tpu.ops.warp import flow_warp

# 7x7 conv formulation. A/B on v5e at 1080p-HD-in (docs/ROUND3_NOTES.md):
# native XLA lowering 326 ms/pair vs width-im2col (ops/conv.wide_im2col_conv)
# 370 ms — XLA wins, so it is the fixed choice (same params either way).
_SPYNET_CONV = "xla"

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class SPyNetBasicModule(nn.Module):
    """5 ConvModules 7x7 (8->32->64->32->16->2), ReLU between (SPyNet.py:142-202)."""

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate((32, 64, 32, 16, 2)):
            x = Conv2d(ch, kernel_size=7, formulation=_SPYNET_CONV,
                       name=f"conv_{i}")(x)
            if i < 4:
                x = nn.relu(x)
        return x


class SPyNet(nn.Module):
    num_levels: int = 6

    def setup(self):
        self.basic_module = [SPyNetBasicModule(name=f"basic_module_{i}")
                             for i in range(self.num_levels)]

    def compute_flow(self, ref, supp):
        """ref/supp: (N, H, W, 3) already sized to a /32 multiple."""
        n, h, w, _ = ref.shape
        mean = jnp.asarray(_IMAGENET_MEAN, ref.dtype)
        std = jnp.asarray(_IMAGENET_STD, ref.dtype)
        ref_pyr = [(ref - mean) / std]
        supp_pyr = [(supp - mean) / std]
        for _ in range(5):
            ref_pyr.append(avg_pool_2x2(ref_pyr[-1]))
            supp_pyr.append(avg_pool_2x2(supp_pyr[-1]))
        ref_pyr = ref_pyr[::-1]
        supp_pyr = supp_pyr[::-1]

        flow = jnp.zeros((n, h // 32, w // 32, 2), ref.dtype)
        for level in range(len(ref_pyr)):
            if level == 0:
                flow_up = flow
            else:
                flow_up = resize(flow, scale_factor=2, mode="bilinear",
                                 align_corners=True) * 2.0
            warped = flow_warp(supp_pyr[level], flow_up, padding="border")
            inp = jnp.concatenate([ref_pyr[level], warped, flow_up], axis=-1)
            flow = flow_up + self.basic_module[level](inp)
        return flow

    def __call__(self, ref, supp):
        """ref/supp: (N, H, W, 3) -> flow (N, H, W, 2), (fx, fy) in pixels."""
        h, w = ref.shape[1], ref.shape[2]
        w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
        h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
        ref_r = resize(ref, size=(h_up, w_up), mode="bilinear", align_corners=False)
        supp_r = resize(supp, size=(h_up, w_up), mode="bilinear", align_corners=False)
        flow = self.compute_flow(ref_r, supp_r)
        flow = resize(flow, size=(h, w), mode="bilinear", align_corners=False)
        scale = jnp.asarray([w / w_up, h / h_up], flow.dtype)
        return flow * scale
