"""Torch-parity image resizing for TPU (NHWC).

Implements the exact coordinate conventions of ``torch.nn.functional.interpolate``
(reference uses it everywhere: e.g. /root/reference/models/archs/RefVSR.py:105,125,288,
/root/reference/models/archs/SPyNet.py:88,120) so that converted PyTorch checkpoints
reproduce bit-comparable outputs.

Conventions replicated (verified against torch CPU in tests/test_resize.py):
  - align_corners=False:  src = (dst + 0.5) * s - 0.5   with s = 1/scale_factor when a
    scale_factor was given, else s = in_size / out_size.  For *linear* modes the source
    coordinate is clamped at 0; for bicubic it is not (indices are clamped instead).
  - align_corners=True:   src = dst * (in-1)/(out-1)
  - nearest:              src = floor(dst * s)
  - bicubic uses the A=-0.75 cubic convolution kernel with border-replicated taps.

Design: separable 1-D interpolation implemented as gathers with trace-time-constant
index/weight tables (static shapes -> tables are XLA constants; 2 or 4 gathers +
weighted sum on the VPU; no HW x HW matrices)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75


def _cubic_w(t: np.ndarray):
    """Cubic convolution weights for fractional offset t in [0,1). 4 taps."""
    A = _CUBIC_A

    def k1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    return np.stack([k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t)], axis=-1)


@functools.lru_cache(maxsize=256)
def _axis_tables(in_size: int, out_size: int, mode: str, align_corners: bool,
                 coord_scale: float | None):
    """Per-axis (indices, weights) numpy tables. Cached per static shape."""
    dst = np.arange(out_size, dtype=np.float64)
    s = coord_scale if coord_scale is not None else in_size / out_size

    if mode == "nearest":
        idx_raw = np.floor(dst * s).astype(np.int64)[:, None]
        idx = np.clip(idx_raw, 0, in_size - 1)
        ones = np.ones((out_size, 1), np.float32)
        return idx, ones, idx_raw, ones

    if align_corners:
        src = dst * ((in_size - 1.0) / max(out_size - 1.0, 1.0))
        src_raw = src
    else:
        src_raw = (dst + 0.5) * s - 0.5
        src = src_raw
        if mode in ("bilinear", "linear"):
            src = np.maximum(src_raw, 0.0)

    def tables(sv):
        i0 = np.floor(sv).astype(np.int64)
        t = sv - i0
        if mode in ("bilinear", "linear"):
            return (np.stack([i0, i0 + 1], axis=-1),
                    np.stack([1.0 - t, t], axis=-1))
        if mode == "bicubic":
            return np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=-1), _cubic_w(t)
        raise ValueError(f"unsupported resize mode: {mode}")

    idx, w = tables(src)
    if src is src_raw:
        idx_raw, w_raw = idx, w
    else:
        # unclamped variant for the periodic fast path: the linear src clamp
        # at 0 only rewrites reads of (replicated) out-of-range taps, so the
        # raw tables + replicate padding compute the same value (up to one
        # final-rounding ulp at the first output row)
        idx_raw, w_raw = tables(src_raw)
    return (np.clip(idx, 0, in_size - 1), w.astype(np.float32), idx_raw,
            w_raw.astype(np.float32))


def _slice_axis(x, axis, start, length, stride=1):
    # jnp basic indexing with stride > 1 lowers to a GATHER (iota indices) —
    # use lax.slice, which keeps it a strided slice on TPU
    import jax.lax as lax
    starts = [0] * x.ndim
    limits = list(x.shape)
    strides = [1] * x.ndim
    starts[axis] = start
    limits[axis] = start + (length - 1) * stride + 1
    strides[axis] = stride
    return lax.slice(x, starts, limits, strides)


def _replicate_pad_axis(x, axis, lo, hi):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (lo, hi)
    return jnp.pad(x, pads, mode="edge")


def _interp_axis(x: jnp.ndarray, axis: int, in_size: int, out_size: int, mode: str,
                 align_corners: bool, coord_scale: float | None) -> jnp.ndarray:
    if in_size == out_size and mode != "bicubic":
        # identity for linear/nearest; bicubic at same size is also identity when
        # the coordinate map is the identity (integer src), which holds for s==1.
        if coord_scale in (None, 1.0):
            return x
    idx, w, idx_raw, w_raw = _axis_tables(in_size, out_size, mode,
                                          align_corners, coord_scale)
    taps = idx.shape[1]

    # Integer-factor fast paths: gathers with a PERIODIC index table are
    # reorganized into shifted/strided slices + a phase interleave — TPU
    # gathers along a small-minor-dim axis (flow 2ch, conf 1ch, RGB) hit a
    # tiny-row path that costs orders of magnitude over the slice
    # formulation. Exactness: the gate requires the raw index/weight tables
    # to be bit-periodic, edge clamping is reproduced by replicate padding
    # (identical reads), and the weights used are the table's own rows.
    if out_size % in_size == 0 and out_size > in_size:
        f = out_size // in_size
        if (np.array_equal(idx_raw[f:], idx_raw[:-f] + 1)
                and np.array_equal(w_raw[f:], w_raw[:-f])):
            lo = max(0, int(-idx_raw.min()))
            hi = max(0, int(idx_raw.max()) - (in_size - 1))
            xp = _replicate_pad_axis(x, axis, lo, hi)
            phases = []
            for p in range(f):
                acc = None
                for k in range(taps):
                    g = _slice_axis(xp, axis, int(idx_raw[p, k]) + lo, in_size)
                    wk = jnp.asarray(w_raw[p, k], x.dtype)
                    acc = g * wk if acc is None else acc + g * wk
                phases.append(acc)
            out = jnp.stack(phases, axis=axis + 1)   # (..., in, f, ...)
            shp = list(x.shape)
            shp[axis] = out_size
            return out.reshape(shp)
    if in_size % out_size == 0 and in_size > out_size:
        f = in_size // out_size
        if (np.array_equal(idx_raw[1:], idx_raw[:-1] + f)
                and np.array_equal(w_raw[1:], w_raw[:-1])):
            lo = max(0, int(-idx_raw.min()))
            hi = max(0, int(idx_raw.max()) - (in_size - 1))
            xp = _replicate_pad_axis(x, axis, lo, hi)
            acc = None
            for k in range(taps):
                g = _slice_axis(xp, axis, int(idx_raw[0, k]) + lo, out_size,
                                stride=f)
                wk = jnp.asarray(w_raw[0, k], x.dtype)
                acc = g * wk if acc is None else acc + g * wk
            return acc

    # Non-periodic (irregular) resample: contract a dense banded (out, in)
    # weight table on the MXU instead of per-row gathers — the gather path
    # along a small-minor-dim axis costs orders of magnitude more on TPU.
    # The table rows hold the same 2/4 tap weights (accumulated at clamped
    # duplicates), so values match the tap-sum up to matmul accumulation
    # order; precision=HIGHEST keeps f32 inputs exact on the MXU.
    if out_size * in_size <= (64 << 20):
        wm = np.zeros((in_size, out_size), np.float32)
        np.add.at(wm, (idx, np.arange(out_size, dtype=np.int64)[:, None]), w)
        xm = jnp.moveaxis(x, axis, -1)
        out = jnp.matmul(xm.astype(jnp.float32), jnp.asarray(wm),
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(out.astype(x.dtype), -1, axis)

    wshape = [1] * x.ndim
    wshape[axis] = out_size
    out = None
    for k in range(taps):
        g = jnp.take(x, jnp.asarray(idx[:, k]), axis=axis)
        wk = jnp.asarray(w[:, k]).reshape(wshape).astype(x.dtype)
        out = g * wk if out is None else out + g * wk
    return out


def resize(x: jnp.ndarray, size=None, scale_factor=None, mode: str = "bilinear",
           align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC (or ...HWC) images, matching torch.nn.functional.interpolate.

    Exactly one of ``size=(H, W)`` or ``scale_factor`` must be given. When
    ``scale_factor`` is given the output size is ``floor(in * sf)`` and the
    coordinate transform uses ``1/sf`` (torch's recompute_scale_factor=None path).
    Spatial axes are assumed to be ``(-3, -2)`` (NHWC/HWC)."""
    h, w = x.shape[-3], x.shape[-2]
    if (size is None) == (scale_factor is None):
        raise ValueError("pass exactly one of size / scale_factor")
    if size is not None:
        out_h, out_w = int(size[0]), int(size[1])
        sh = sw = None
    else:
        if isinstance(scale_factor, (tuple, list)):
            sf_h, sf_w = float(scale_factor[0]), float(scale_factor[1])
        else:
            sf_h = sf_w = float(scale_factor)
        out_h, out_w = int(np.floor(h * sf_h)), int(np.floor(w * sf_w))
        sh, sw = 1.0 / sf_h, 1.0 / sf_w

    x = _interp_axis(x, x.ndim - 3, h, out_h, mode, align_corners, sh)
    x = _interp_axis(x, x.ndim - 2, w, out_w, mode, align_corners, sw)
    return x


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool, NHWC, floor output size (torch avg_pool2d,
    count_include_pad irrelevant as there is no padding).
    Ref: /root/reference/models/archs/SPyNet.py:66-78 pyramid downsampling and
    /root/reference/models/archs/RefVSR_/attention.py:51 ref feature downscale."""
    h, w = x.shape[-3], x.shape[-2]
    h2, w2 = h // 2, w // 2
    x = x[..., : h2 * 2, : w2 * 2, :]
    shape = x.shape[:-3] + (h2, 2, w2, 2, x.shape[-1])
    x = x.reshape(shape)
    return x.mean(axis=(-4, -2))
