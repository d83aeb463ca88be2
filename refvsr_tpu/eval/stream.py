"""Streaming video inference runtime (host-side policy around jitted graphs).

Owns the reference's branch-reset logic (RefVSR.py:100-101,167-170,291-295):
after `reset_branch` consecutive streamed windows, the recurrence is re-anchored
by running the full first-frame graph. Two compiled graphs exist per shape
(first/stream) — static shapes, no retraces (SURVEY.md §7 hard part (d))."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class StreamRunner:
    def __init__(self, net, params, reset_branch: Optional[int],
                 eval_first, eval_stream, compute_dtype=jnp.float32,
                 keyframe_stride: Optional[int] = None):
        self.net = net
        self.params = params
        self.reset_branch = reset_branch
        self.eval_first = eval_first
        self.eval_stream = eval_stream
        self.compute_dtype = compute_dtype
        # keyframe_stride set => IR model: per-window sliding keyframe masks
        # (RefVSR_IR.py:255-264)
        self.keyframe_stride = keyframe_stride
        self.kf_first: Optional[int] = None
        self.state = None
        self.count = 0

    def _kf_mask(self, t: int, is_first: bool):
        from refvsr_tpu.models.refvsr_ir import sliding_keyframe_mask
        mask, self.kf_first = sliding_keyframe_mask(
            t, self.keyframe_stride, None if is_first else self.kf_first)
        return jnp.asarray(mask)

    def process_device(self, lrs: np.ndarray, refs: np.ndarray,
                       is_first: bool):
        """Like process() but returns the SR frame as a DEVICE array —
        callers that only need metrics can reduce/downscale on device and
        skip the full-size host transfer (a 4x-8K frame is ~400 MB over the
        tunneled backend)."""
        return self._process(lrs, refs, is_first)

    def process(self, lrs: np.ndarray, refs: np.ndarray, is_first: bool):
        """lrs/refs: (N, T, H, W, 3) float32 numpy. Returns (sr (N,4H,4W,3)
        numpy, conf_vis tuple). Handles first/reset/stream dispatch."""
        out, conf = self._process(lrs, refs, is_first)
        return np.asarray(out, np.float32), conf

    def _process(self, lrs: np.ndarray, refs: np.ndarray, is_first: bool):
        if self.reset_branch is not None and self.count == self.reset_branch:
            is_first = True
        t = lrs.shape[1]
        lrs = jnp.asarray(lrs, self.compute_dtype)
        refs = jnp.asarray(refs, self.compute_dtype)
        if is_first or self.state is None:
            if self.keyframe_stride is not None:
                out, self.state, conf = self.eval_first(
                    self.params, lrs, refs, self._kf_mask(t, True))
            else:
                out, self.state, conf = self.eval_first(self.params, lrs, refs)
            self.count = 0
        else:
            if self.keyframe_stride is not None:
                out, self.state, conf = self.eval_stream(
                    self.params, lrs, refs, self.state,
                    self._kf_mask(t, False))
            else:
                out, self.state, conf = self.eval_stream(
                    self.params, lrs, refs, self.state)
        self.count += 1
        return out, conf
