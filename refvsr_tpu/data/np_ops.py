"""Host-side numpy image ops for the data pipeline (torch-parity bicubic)."""

from __future__ import annotations

import numpy as np

from refvsr_tpu.ops.resize import _axis_tables


def np_resize(x: np.ndarray, size=None, scale_factor=None, mode="bicubic",
              align_corners=False) -> np.ndarray:
    """numpy twin of ops.resize for (..., H, W, C) arrays (shares the
    coordinate/weight tables, so host-side aug matches on-device math)."""
    h, w = x.shape[-3], x.shape[-2]
    if size is not None:
        out_h, out_w = size
        sh = sw = None
    else:
        sf = scale_factor if isinstance(scale_factor, (tuple, list)) \
            else (scale_factor, scale_factor)
        out_h, out_w = int(np.floor(h * sf[0])), int(np.floor(w * sf[1]))
        sh, sw = 1.0 / sf[0], 1.0 / sf[1]

    def interp(arr, axis, in_size, out_size, cs):
        idx, wgt = _axis_tables(in_size, out_size, mode, align_corners,
                                cs)[:2]
        out = None
        for k in range(idx.shape[1]):
            g = np.take(arr, idx[:, k], axis=axis)
            shape = [1] * arr.ndim
            shape[axis] = out_size
            term = g * wgt[:, k].reshape(shape)
            out = term if out is None else out + term
        return out

    x = interp(x, x.ndim - 3, h, out_h, sh)
    x = interp(x, x.ndim - 2, w, out_w, sw)
    return x
