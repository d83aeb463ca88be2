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
import numpy as np

from refvsr_tpu.models.blocks import vgg_normalize
from refvsr_tpu.models.vgg import RELU_TAPS, VGGFeatures


def _cosine_distance(x_feat, y_feat, x_self_mu):
    """1 - cosine similarity after channel-mean centering
    (contextual.py:115-138 / contextual_X_mu.py:124-151)."""
    n, _, _, c = y_feat.shape
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
    return jnp.clip(1.0 - jnp.einsum(
        "nxc,nyc->nxy", x_n, y_n, preferred_element_type=jnp.float32),
        0.0, None)


def _l2_distance(x_feat, y_feat):
    """Squared-L2 pairwise distance (contextual.py:140-154)."""
    n, _, _, c = x_feat.shape
    x = x_feat.reshape(n, -1, c)
    y = y_feat.reshape(n, -1, c)
    xs = jnp.sum(x * x, axis=-1)[:, :, None]
    ys = jnp.sum(y * y, axis=-1)[:, None, :]
    cross = jnp.einsum("nxc,nyc->nxy", x, y,
                       preferred_element_type=jnp.float32)
    return jnp.clip(xs - 2.0 * cross + ys, 0.0, None)


def _l1_distance(x_feat, y_feat):
    """The reference's 'L1' distance (contextual.py:172-186) — NOTE it is a
    degenerate |sum_c x - sum_c x| of x against itself (y unused), reproduced
    for parity; no shipped config uses it."""
    n = x_feat.shape[0]
    xs = jnp.sum(x_feat, axis=-1).reshape(n, -1)
    return jnp.abs(xs[:, None, :] - xs[:, :, None])


def _meshgrid_dist(n, h, w):
    """Spatial grid L2 distances for CoBi (contextual.py:56-65,77-80)."""
    rows = np.arange(h, dtype=np.float32) / (h + 1)
    cols = np.arange(w, dtype=np.float32) / (w + 1)
    gy, gx = np.meshgrid(rows, cols, indexing="ij")
    grid = np.stack([gy.reshape(-1), gx.reshape(-1)], axis=-1)  # (HW, 2)
    d2 = ((grid[:, None, :] - grid[None, :, :]) ** 2).sum(-1)
    return jnp.broadcast_to(jnp.asarray(d2, jnp.float32), (n,) + d2.shape)


def _cx_core(x_feat, y_feat, band_width: float, x_self_mu: bool,
             loss_type: str = "cosine", is_cobi: bool = False,
             weight_sp: float = 0.1):
    """x_feat/y_feat: (N, H, W, C) VGG features. Returns (loss, c_map)."""
    x_feat = x_feat.astype(jnp.float32)
    y_feat = y_feat.astype(jnp.float32)
    n, hy, wy, c = y_feat.shape

    if loss_type == "cosine":
        dist = _cosine_distance(x_feat, y_feat, x_self_mu)
    elif loss_type == "L2":
        dist = _l2_distance(x_feat, y_feat)
    elif loss_type == "L1":
        dist = _l1_distance(x_feat, y_feat)
    else:
        raise ValueError(loss_type)

    dist_min = jnp.min(dist, axis=2, keepdims=True)
    dist_t = dist / (dist_min + 1e-5)
    w = jnp.exp((1.0 - dist_t) / band_width)
    cx = w / (jnp.sum(w, axis=2, keepdims=True) + 1e-5)

    if is_cobi:
        # contextual_bilateral_loss (contextual.py:67-102): mix in a spatial
        # meshgrid CX term
        d_sp = _meshgrid_dist(n, x_feat.shape[1], x_feat.shape[2])
        d_sp_t = d_sp / (jnp.min(d_sp, axis=2, keepdims=True) + 1e-5)
        w_sp = jnp.exp((1.0 - d_sp_t) / band_width)
        cx_sp = w_sp / (jnp.sum(w_sp, axis=2, keepdims=True) + 1e-5)
        cx = (1.0 - weight_sp) * cx + weight_sp * cx_sp

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
    x_self_mu: bool = False     # True => the `_X_mu` variant
    loss_type: str = "cosine"   # cosine | L2 | L1 (contextual.py:5)
    is_cobi: bool = False       # CoBi spatial term (contextual.py:67-102)

    def setup(self):
        self.vgg = VGGFeatures(max_index=RELU_TAPS[self.vgg_layer] + 1,
                               taps=(self.vgg_layer,), name="vgg")

    def _features(self, img):
        _, taps = self.vgg(vgg_normalize(img))
        return taps[self.vgg_layer]

    def __call__(self, x_img, y_img):
        """x_img/y_img: (N, H, W, 3) in [0,1]. Returns (loss, c_map)."""
        return _cx_core(self._features(x_img), self._features(y_img),
                        self.band_width, self.x_self_mu,
                        loss_type=self.loss_type, is_cobi=self.is_cobi)
