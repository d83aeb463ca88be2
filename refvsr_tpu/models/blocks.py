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


class Conv2d(nn.Module):
    """torch-style conv: square kernel, padding = k//2 (or explicit), bias.

    stride > 1 runs through ops/conv.blocked_strided_conv (space-to-depth
    lowering; XLA's native strided conv is ~15x off its floor on v5e for the
    shapes used here). Identical numerics and param tree."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2 if self.padding is None else self.padding
        fan_in_shape = x.shape[-1] * self.kernel_size * self.kernel_size
        bound = float(np.sqrt(1.0 / fan_in_shape))
        kernel, bias = _ConvParams(
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            self.use_bias, self.kernel_init, bound, name="conv")()
        kernel = kernel.astype(x.dtype)
        if self.stride > 1:
            from refvsr_tpu.ops.conv import blocked_strided_conv
            return blocked_strided_conv(x, kernel, bias, self.stride, p)
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
    """conv3x3 -> LeakyReLU(0.2) -> conv3x3, residual (common.py:25-39)."""
    features: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.features, 3, name="conv1")(x)
        out = lrelu(out, 0.2)
        out = Conv2d(self.features, 3, name="conv2")(out)
        return out * self.res_scale + x


class ResList(nn.Module):
    """num_blocks ResBlocks + conv_tail, outer residual (common.py:64-82)."""
    num_blocks: int
    features: int

    @nn.compact
    def __call__(self, x):
        x1 = x
        for i in range(self.num_blocks):
            x = ResBlock(self.features, name=f"RBs_{i}")(x)
        x = Conv2d(self.features, 3, name="conv_tail")(x)
        return x + x1


class ResidualBlockNoBN(nn.Module):
    """mmedit residual block: conv-ReLU-conv, 0.1-scaled kaiming init
    (sr_backbone_utils.py:42-97)."""
    features: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        init = scaled_kaiming_normal_init(0.1)
        out = Conv2d(self.features, 3, kernel_init=init, name="conv1")(x)
        out = nn.relu(out)
        out = Conv2d(self.features, 3, kernel_init=init, name="conv2")(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """input conv + LeakyReLU(0.1) + N ResidualBlockNoBN (RefVSR.py:327-360)."""
    features: int
    num_blocks: int = 30

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, 3, name="input_conv")(x)
        x = lrelu(x, 0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.features, name=f"block_{i}")(x)
        return x


class PixelShufflePack(nn.Module):
    """conv to C*r^2 then depth-to-space (mmedit upsample.py:8-51)."""
    features: int
    scale_factor: int = 2
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features * self.scale_factor ** 2,
                   self.upsample_kernel, name="upsample_conv")(x)
        return pixel_shuffle(x, self.scale_factor)


VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def vgg_normalize(x):
    """MeanShift(1, vgg_mean, vgg_std) semantics (common.py:84-94): (x-mean)/std."""
    return (x - jnp.asarray(VGG_MEAN, x.dtype)) / jnp.asarray(VGG_STD, x.dtype)
