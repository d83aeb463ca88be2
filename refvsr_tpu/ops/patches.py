"""Patch extraction / reassembly for the matching + aligned-attention path (NHWC).

Reference counterparts:
  - ``extract_image_patches`` + ``same_padding`` (reflection):
    /root/reference/models/archs/RefVSR_/utils.py:10-57 (torch Unfold, [N, C*k*k, L])
  - ``F.fold`` overlap-add at /root/reference/models/archs/RefVSR_/attention.py:144,154.

TPU-first observations that shape this module:
  * Every AlignedAttention call in RefVSR uses ``kernel == stride`` (kernel =
    matching_ksize{,//2} * k_vsize, stride = scale*1 with scale==kernel; see
    RefVSR.py:39-40 and attention.py:138-144), so ``F.fold`` is an exact
    *non-overlapping* inverse — a pure reshape/space-to-depth, no scatter-add needed.
  * The 3x3/stride-1 matching unfold reduces to 9 shifted views of a
    reflection-padded image, which XLA fuses into the downstream matmul.

Patch vector layout here is ``[ky, kx, C]`` flattened (C fastest), NOT torch's
``[C, ky, kx]``; cosine similarity is invariant to this permutation and both the
extract and fold sides of this module use the same layout. The torch<->jax weight
converter never touches patch tensors, so no compatibility constraint exists."""

from __future__ import annotations

import jax.numpy as jnp


def same_pad_reflect(x: jnp.ndarray, ksize: int, stride: int) -> jnp.ndarray:
    """TF-style 'same' padding with reflection, matching
    RefVSR_/utils.py:10-26 (top = pad//2, bottom = pad - top)."""
    h, w = x.shape[-3], x.shape[-2]
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max(0, (out_h - 1) * stride + ksize - h)
    pad_w = max(0, (out_w - 1) * stride + ksize - w)
    top, left = pad_h // 2, pad_w // 2
    cfg = [(0, 0)] * (x.ndim - 3) + [(top, pad_h - top), (left, pad_w - left), (0, 0)]
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, cfg, mode="reflect")


def extract_patches(x: jnp.ndarray, ksize: int, stride: int,
                    padding: str = "same") -> jnp.ndarray:
    """x: (N, H, W, C) -> (N, L, k*k*C) with L = out_h*out_w (row-major).

    padding='same' uses reflection (matching the reference); 'valid' requires the
    spatial dims to already be compatible."""
    if padding == "same":
        x = same_pad_reflect(x, ksize, stride)
    n, h, w, c = x.shape
    if stride == ksize:
        # non-overlapping: pure reshape (space-to-depth)
        oh, ow = h // ksize, w // ksize
        x = x[:, : oh * ksize, : ow * ksize]
        x = x.reshape(n, oh, ksize, ow, ksize, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, oh, ow, ky, kx, c)
        return x.reshape(n, oh * ow, ksize * ksize * c)
    # generic small-kernel path: stack shifted views
    oh = (h - ksize) // stride + 1
    ow = (w - ksize) // stride + 1
    views = []
    for ky in range(ksize):
        for kx in range(ksize):
            v = x[:, ky : ky + (oh - 1) * stride + 1 : stride,
                  kx : kx + (ow - 1) * stride + 1 : stride, :]
            views.append(v)
    # (n, oh, ow, k*k, c) -> (n, L, k*k*c)
    stacked = jnp.stack(views, axis=3)
    return stacked.reshape(n, oh * ow, ksize * ksize * c)


def fold_non_overlapping(patches: jnp.ndarray, out_hw: tuple[int, int],
                         ksize: int, channels: int) -> jnp.ndarray:
    """Inverse of extract_patches for kernel==stride: (N, L, k*k*C) -> (N, H, W, C).

    Matches F.fold(..., kernel_size=k, stride=k, padding=0) at attention.py:144."""
    out_h, out_w = out_hw
    n = patches.shape[0]
    oh, ow = out_h // ksize, out_w // ksize
    x = patches.reshape(n, oh, ow, ksize, ksize, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (n, oh, ky, ow, kx, c)
    return x.reshape(n, out_h, out_w, channels)


def gather_patches(values: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: values (N, L_src, D), index (N, L_out) -> (N, L_out, D).

    Equivalent of AlignedAttention.warp's expand+gather (attention.py:118-128)."""
    return jnp.take_along_axis(values, index[..., None], axis=1)
