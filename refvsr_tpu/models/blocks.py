"""Flax building blocks mirroring the reference's torch modules (NHWC).

Reference counterparts (structure + init semantics, cited per class):
  - BasicBlock / ResBlock / ResList:   /root/reference/models/archs/RefVSR_/common.py
  - ResidualBlockNoBN / make_layer:    /root/reference/mmedit/models/common/sr_backbone_utils.py
  - PixelShufflePack:                  /root/reference/mmedit/models/common/upsample.py
  - ResidualBlocksWithInputConv:       /root/reference/models/archs/RefVSR.py:327-360

Module/parameter naming is chosen so the torch->jax checkpoint converter
(refvsr_tpu/utils/convert.py) can map state_dict keys mechanically."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.ops.image import pixel_shuffle


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default: kaiming_uniform(a=sqrt(5)) over fan_in."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def scaled_kaiming_normal_init(scale: float = 0.1):
    """mmedit default_init_weights: kaiming_normal (fan_in, relu) * scale
    (sr_backbone_utils.py:42-97 uses 0.1 for residual blocks)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, _ = shape
        fan_in = kh * kw * cin
        std = float(np.sqrt(2.0 / fan_in)) * scale
        return jax.random.normal(key, shape, dtype) * std

    return init


class _ConvParams(nn.Module):
    """Parameter container matching nn.Conv's tree ('kernel', 'bias') so
    checkpoint key mapping is identical whichever compute path runs."""
    shape: tuple  # (kh, kw, cin, o)
    use_bias: bool
    kernel_init: Callable
    bias_bound: float

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = None
        if self.use_bias:
            bound = self.bias_bound
            b = self.param("bias",
                           lambda key, s, d=jnp.float32:
                           jax.random.uniform(key, s, d, -bound, bound),
                           (self.shape[-1],))
        return k, b


# Width-packing of conv CHAINS: measured 1.39x on isolated 30-block chains
# at (544, 960, 48) on v5e, but NET-NEGATIVE at the flagship 8K scale
# (W=1920: full-8K bench 0.0947 -> 0.0857 fps) and within noise at 544p
# full-step level — the packed conv doubles FLOPs and the win only exists
# where lane underutilization dominates. OFF by default; kept (with exact-
# equivalence tests) as groundwork for narrower-frame deployments.
WIDTH_PACK_CHAINS = False


def width_pack(x, f: int = 2):
    """(N, H, W, C) -> (N, H, W/f, f*C): fold f adjacent pixels into lanes."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // f, f * c)


def width_unpack(x, f: int = 2):
    n, h, wf, fc = x.shape
    return x.reshape(n, h, wf * f, fc // f)


def pack_conv_kernel(kernel, f: int):
    """(k, k, Ci, Co) -> (k, k, f*Ci, f*Co): the exact 3x3 'same' conv on the
    width-packed layout. Output phase p tap dx reads packed column
    (p + dx) // f phase (p + dx) % f — a fixed block scatter of the original
    taps (zeros elsewhere). Measured on v5e: f=2 runs resblock CHAINS 1.39x
    faster at C=48 (96 lanes at half width beat 48 lanes; the extra zero
    FLOPs are covered by better MXU/relayout behavior)."""
    kk, _, ci, co = kernel.shape
    kp = jnp.zeros((kk, kk, f * ci, f * co), kernel.dtype)
    half = kk // 2
    for p in range(f):
        for dx in range(-half, half + 1):
            col = p + dx
            dxp = (col + f) // f - 1
            q = (col + f) % f
            kp = kp.at[:, dxp + half, q * ci:(q + 1) * ci,
                       p * co:(p + 1) * co].add(kernel[:, dx + half])
    return kp


class Conv2d(nn.Module):
    """torch-style conv: square kernel, padding = k//2 (or explicit), bias.

    stride > 1 runs through ops/conv.blocked_strided_conv (space-to-depth
    lowering; XLA's native strided conv is ~15x off its floor on v5e for the
    shapes used here). packed=f>1 computes the SAME conv on a width-packed
    (N, H, W/f, f*C) tensor via pack_conv_kernel (chain modules use this).
    Identical numerics and param tree in all modes."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    packed: int = 1
    in_features: int | None = None  # required only for x=None param declare
    # "xla" = native conv lowering; "im2col_w" = width-im2col with K = k*C
    # dots (ops/conv.wide_im2col_conv; stride 1, 'same' padding only).
    # Identical params and numerics (matmul-reassociated sums).
    formulation: str = "xla"

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2 if self.padding is None else self.padding
        cin = (self.in_features if x is None
               else x.shape[-1] // self.packed)
        fan_in_shape = cin * self.kernel_size * self.kernel_size
        bound = float(np.sqrt(1.0 / fan_in_shape))
        kernel, bias = _ConvParams(
            (self.kernel_size, self.kernel_size, cin, self.features),
            self.use_bias, self.kernel_init, bound, name="conv")()
        if x is None:
            # params-only mode: raw-weight consumers (the Pallas matching
            # kernel, models/matching.py) declare the identical param tree
            # without computing (checkpoint compatibility)
            return kernel, bias
        kernel = kernel.astype(x.dtype)
        if self.packed > 1:
            assert self.stride == 1 and p == self.kernel_size // 2
            kernel = pack_conv_kernel(kernel, self.packed)
            if bias is not None:
                bias = jnp.tile(bias, self.packed)
        if self.stride > 1:
            # blocked_strided_conv's space-to-depth reshape (H -> H/s x s)
            # defeats GSPMD under spatial H-sharding (500 MB all-gathers at
            # the 8K geometry, scripts/debug_8k_allgather.py r4); the native
            # strided conv shards cleanly, and at 1/s per-shard rows its
            # lowering inefficiency is off the critical path
            from refvsr_tpu.parallel.spatial import active as _spatial_active
            if _spatial_active() is None:
                from refvsr_tpu.ops.conv import blocked_strided_conv
                return blocked_strided_conv(x, kernel, bias, self.stride, p)
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            return out if bias is None else out + bias.astype(x.dtype)
        if self.formulation == "im2col_w":
            assert self.packed == 1 and p == self.kernel_size // 2
            from refvsr_tpu.ops.conv import wide_im2col_conv
            return wide_im2col_conv(x, kernel, bias)
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        if bias is not None:
            out = out + bias.astype(x.dtype)
        return out


def lrelu(x, slope):
    return nn.leaky_relu(x, negative_slope=slope)


class BasicBlock(nn.Module):
    """conv + optional LeakyReLU(0.2) (RefVSR_/common.py:96-109)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    act_slope: float | None = 0.2  # None => no activation

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, self.kernel_size, self.stride, name="0")(x)
        if self.act_slope is not None:
            x = lrelu(x, self.act_slope)
        return x


class ResBlock(nn.Module):
    """conv3x3 -> LeakyReLU(0.2) -> conv3x3, residual (common.py:25-39).
    Called with x=None, declares and returns the two convs' raw params
    without computing."""
    features: int
    res_scale: float = 1.0
    packed: int = 1

    @nn.compact
    def __call__(self, x):
        c1 = Conv2d(self.features, 3, packed=self.packed,
                    in_features=self.features, name="conv1")
        c2 = Conv2d(self.features, 3, packed=self.packed,
                    in_features=self.features, name="conv2")
        if x is None:
            return c1(None), c2(None)
        out = c1(x)
        out = lrelu(out, 0.2)
        out = c2(out)
        return out * self.res_scale + x


class ResList(nn.Module):
    """num_blocks ResBlocks + conv_tail, outer residual (common.py:64-82).
    Plain XLA convs: a fused VMEM-resident Mosaic chain kernel was built
    and measured in rounds 2-3 (docs/ROUND2_NOTES.md) — it lost at the
    full-model level (prop-ALL 494 ms fused vs 380 ms XLA; boundary layout
    taxes ate the per-conv win) and was removed."""
    num_blocks: int
    features: int

    @nn.compact
    def __call__(self, x):
        f = 2 if (WIDTH_PACK_CHAINS and x.shape[-2] % 2 == 0
                  and self.num_blocks >= 8) else 1
        x1 = x
        if f > 1:
            x = width_pack(x, f)
        for i in range(self.num_blocks):
            x = ResBlock(self.features, packed=f, name=f"RBs_{i}")(x)
        x = Conv2d(self.features, 3, packed=f, name="conv_tail")(x)
        if f > 1:
            x = width_unpack(x, f)
        return x + x1


class ResidualBlockNoBN(nn.Module):
    """mmedit residual block: conv-ReLU-conv, 0.1-scaled kaiming init
    (sr_backbone_utils.py:42-97). x=None declares and returns the raw conv
    params without computing."""
    features: int
    res_scale: float = 1.0
    packed: int = 1

    @nn.compact
    def __call__(self, x):
        init = scaled_kaiming_normal_init(0.1)
        c1 = Conv2d(self.features, 3, kernel_init=init, packed=self.packed,
                    in_features=self.features, name="conv1")
        c2 = Conv2d(self.features, 3, kernel_init=init, packed=self.packed,
                    in_features=self.features, name="conv2")
        if x is None:
            return c1(None), c2(None)
        out = c1(x)
        out = nn.relu(out)
        out = c2(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """input conv + LeakyReLU(0.1) + N ResidualBlockNoBN (RefVSR.py:327-360).
    Plain XLA convs — see ResList for the measured fused-chain verdict."""
    features: int
    num_blocks: int = 30

    @nn.compact
    def __call__(self, x):
        f = 2 if (WIDTH_PACK_CHAINS and x.shape[-2] % 2 == 0) else 1
        if f > 1:
            x = width_pack(x, f)
        x = Conv2d(self.features, 3, packed=f, name="input_conv")(x)
        x = lrelu(x, 0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.features, packed=f,
                                  name=f"block_{i}")(x)
        if f > 1:
            x = width_unpack(x, f)
        return x


class PixelShufflePack(nn.Module):
    """conv to C*r^2 then depth-to-space (mmedit upsample.py:8-51)."""
    features: int
    scale_factor: int = 2
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x, shuffle: bool = True):
        """shuffle=False returns the pre-shuffle (C*r^2)-channel tensor —
        consumers that continue with preshuffle_conv (the 8K tail,
        models/refvsr.py) defer the depth-to-space to the very end."""
        x = Conv2d(self.features * self.scale_factor ** 2,
                   self.upsample_kernel, name="upsample_conv")(x)
        return pixel_shuffle(x, self.scale_factor) if shuffle else x


VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_normalize(x):
    """MeanShift(1, vgg_mean, vgg_std) semantics (common.py:84-94): (x-mean)/std."""
    return (x - jnp.asarray(VGG_MEAN, x.dtype)) / jnp.asarray(VGG_STD, x.dtype)
