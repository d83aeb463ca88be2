"""Contextual (CX) loss on VGG19 features — reference parity (NHWC).

Reference: /root/reference/models/loss/contextual.py (FID/MFID family) and
contextual_X_mu.py (the `_X_mu` variant: x is centered by its *own* channel mean
while y uses y's; contextual_X_mu.py:124-151). Math replicated exactly:

  dist       = clamp(1 - x_n^T y_n, 0)                    (N, HWx, HWy)
  dist~      = dist / (min_y dist + 1e-5)
  cx         = softmax-ish: w / (sum_y w + 1e-5), w = exp((1 - dist~)/h)
  r_m        = max over x-axis (values + argmax)
  c          = exp((1 - dist)/h) gathered at argmax        (N, 1, HWy)
  loss       = mean(-log(sum(r_m * c)/sum(c) + 1e-5))

Precision note (SURVEY.md §7 hard part (f)): the distance matrix and the -log
reduction run in f32 even under a bf16 policy — exp((1-d)/0.5) spans e^{-4}..e^2
and the normalized ratios underflow in bf16."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from refvsr_tpu.models.blocks import vgg_normalize
from refvsr_tpu.models.vgg import RELU_TAPS, VGGFeatures


def _cx_core(x_feat, y_feat, band_width: float, x_self_mu: bool):
    """x_feat/y_feat: (N, H, W, C) VGG features. Returns (loss, c_map)."""
    x_feat = x_feat.astype(jnp.float32)
    y_feat = y_feat.astype(jnp.float32)
    n, hy, wy, c = y_feat.shape

    # channel-mean over batch+space (contextual.py:117 — couples the batch!)
    y_mu = jnp.mean(y_feat, axis=(0, 1, 2), keepdims=True)
    x_mu = jnp.mean(x_feat, axis=(0, 1, 2), keepdims=True) if x_self_mu else y_mu
    x_c = x_feat - x_mu
    y_c = y_feat - y_mu

    def norm(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    x_n = norm(x_c).reshape(n, -1, c)   # (N, HWx, C)
    y_n = norm(y_c).reshape(n, -1, c)   # (N, HWy, C)

    dist = jnp.clip(1.0 - jnp.einsum(
        "nxc,nyc->nxy", x_n, y_n, preferred_element_type=jnp.float32), 0.0, None)

    dist_min = jnp.min(dist, axis=2, keepdims=True)
    dist_t = dist / (dist_min + 1e-5)
    w = jnp.exp((1.0 - dist_t) / band_width)
    cx = w / (jnp.sum(w, axis=2, keepdims=True) + 1e-5)

    r_val = jnp.max(cx, axis=1)                     # (N, HWy)
    r_idx = jnp.argmax(cx, axis=1)
    sim = jnp.exp((1.0 - dist) / 0.5)               # contextual_X_mu.py:43 uses
    # 0.5 in the _X_mu file; the base file uses band_width — they coincide since
    # band_width defaults to 0.5 for the cosine variants used by RefVSR configs.
    c_map = jnp.take_along_axis(sim, r_idx[:, None, :], axis=1)[:, 0, :]

    cx_agg = jnp.sum(r_val * c_map, axis=1) / jnp.sum(c_map, axis=1)
    loss = jnp.mean(-jnp.log(cx_agg + 1e-5))
    return loss, c_map.reshape(n, hy, wy, 1)


class CXLoss(nn.Module):
    """VGG19-backed contextual loss (models/loss/contextual.py:188-246)."""
    vgg_layer: str = "relu3_4"
    band_width: float = 0.5
    x_self_mu: bool = False  # True => the `_X_mu` variant

    def setup(self):
        self.vgg = VGGFeatures(max_index=RELU_TAPS[self.vgg_layer] + 1,
                               taps=(self.vgg_layer,), name="vgg")

    def _features(self, img):
        _, taps = self.vgg(vgg_normalize(img))
        return taps[self.vgg_layer]

    def __call__(self, x_img, y_img):
        """x_img/y_img: (N, H, W, 3) in [0,1]. Returns (loss, c_map)."""
        return _cx_core(self._features(x_img), self._features(y_img),
                        self.band_width, self.x_self_mu)
