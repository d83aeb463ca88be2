"""Streaming video inference runtime (host-side policy around jitted graphs).

Owns the reference's branch-reset logic (RefVSR.py:100-101,167-170,291-295):
after `reset_branch` consecutive streamed windows, the recurrence is re-anchored
by running the full first-frame graph. Two compiled graphs exist per shape
(first/stream) — static shapes, no retraces (SURVEY.md §7 hard part (d)).

Pipelined mode (pipeline_lanes L > 1, models/refvsr.py): outputs emerge L-1
windows late, so the runner exposes a submit/flush API — submit(window) may
return zero, one, or (around resets) two completed outputs, each tagged with
the caller's meta object; flush() drains the in-flight chains at a video end
by synthesizing clamp-shifted windows (repeat the last frame — exactly the
dataset's end-of-clip clamp rule, datasets.py:233-234, so drained outputs
equal the plain stream's). Plain mode: submit returns the window's own output
immediately and flush is a no-op, so callers use one code path for both.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class StreamRunner:
    def __init__(self, net, params, reset_branch: Optional[int],
                 eval_first, eval_stream, compute_dtype=jnp.float32,
                 keyframe_stride: Optional[int] = None,
                 eval_prime=None, eval_pipelined=None,
                 pipeline_lanes: int = 0):
        self.net = net
        self.params = params
        self.reset_branch = reset_branch
        self.eval_first = eval_first
        self.eval_stream = eval_stream
        self.eval_prime = eval_prime
        self.eval_pipelined = eval_pipelined
        self.pipeline_lanes = (pipeline_lanes
                               if eval_pipelined is not None else 0)
        if self.pipeline_lanes > 2 and reset_branch is not None:
            # mid-video re-anchors need one true-window drain per in-flight
            # chain; only the single-chain case (L=2) avoids lookahead
            raise NotImplementedError(
                "pipeline_lanes > 2 with reset_branch set needs window "
                "lookahead; use lanes=2 or reset_branch=None")
        self.compute_dtype = compute_dtype
        # keyframe_stride set => IR model: per-window sliding keyframe masks
        # (RefVSR_IR.py:255-264); mutually exclusive with pipelining
        self.keyframe_stride = keyframe_stride
        assert not (self.pipeline_lanes > 1 and keyframe_stride is not None)
        self.kf_first: Optional[int] = None
        self.state = None
        self.count = 0
        self._pending = []          # metas of in-flight (unemitted) outputs
        self._primes_left = 0       # pipelined: dispatches left before steady
        self._last_win = None       # (lrs, refs) of the last real window

    def _kf_mask(self, t: int, is_first: bool):
        from refvsr_tpu.models.refvsr_ir import sliding_keyframe_mask
        mask, self.kf_first = sliding_keyframe_mask(
            t, self.keyframe_stride, None if is_first else self.kf_first)
        return jnp.asarray(mask)

    # ------------- plain per-window API (kept for FOV/conf-map modes) ------

    def process_device(self, lrs: np.ndarray, refs: np.ndarray,
                       is_first: bool):
        """Like process() but returns the SR frame as a DEVICE array —
        callers that only need metrics can reduce/downscale on device and
        skip the full-size host transfer (a 4x-8K frame is ~400 MB over the
        tunneled backend)."""
        assert self.pipeline_lanes <= 1, "use submit() in pipelined mode"
        return self._process(lrs, refs, is_first)

    def process(self, lrs: np.ndarray, refs: np.ndarray, is_first: bool):
        """lrs/refs: (N, T, H, W, 3) float32 numpy. Returns (sr (N,4H,4W,3)
        numpy, conf_vis tuple). Handles first/reset/stream dispatch."""
        out, conf = self.process_device(lrs, refs, is_first)
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

    # ------------- submit/flush API (plain AND pipelined) ------------------

    def submit(self, lrs: np.ndarray, refs: np.ndarray, is_first: bool,
               meta=None):
        """Feed one window; return a list of completed (meta, sr_device,
        conf_vis) tuples (0..2 entries). In plain mode this is exactly
        [(meta, *process_device(...))]."""
        if self.pipeline_lanes <= 1:
            out, conf = self._process(lrs, refs, is_first)
            return [(meta, out, conf)]

        emitted = []
        if is_first and self._pending:
            emitted.extend(self.flush())  # previous video's tail
        lrs_d = jnp.asarray(lrs, self.compute_dtype)
        refs_d = jnp.asarray(refs, self.compute_dtype)

        if (not is_first and self.reset_branch is not None
                and self.count == self.reset_branch):
            # re-anchor (L=2): finish the one in-flight chain with THIS true
            # window (its remaining steps consume only frames this window
            # holds), then fall through to the forward_first below — the
            # window is consumed twice, once per output, exactly preserving
            # the plain stream's per-frame values. (_pending can only be
            # empty here in the degenerate reset_branch=1 case — nothing in
            # flight yet, plain re-anchor.)
            if self._pending:
                out, self.state, conf = self.eval_pipelined(
                    self.params, lrs_d, refs_d, self.state)
                emitted.append((self._pending.pop(0), out, conf))
            is_first = True

        if is_first or self.state is None:
            out, self.state, conf = self.eval_first(self.params, lrs_d,
                                                    refs_d)
            emitted.append((meta, out, conf))
            self.count = 0
            self._primes_left = self.pipeline_lanes - 1
        elif self._primes_left > 0:
            self.state = self.eval_prime(self.params, lrs_d, refs_d,
                                         self.state)
            self._pending.append(meta)
            self._primes_left -= 1
        else:
            out, self.state, conf = self.eval_pipelined(
                self.params, lrs_d, refs_d, self.state)
            self._pending.append(meta)
            emitted.append((self._pending.pop(0), out, conf))
        self.count += 1
        self._last_win = (lrs_d, refs_d)
        return emitted

    def flush(self):
        """Drain in-flight outputs with clamp-synthesized windows (video
        end). Returns completed (meta, sr_device, conf_vis) tuples."""
        emitted = []
        lrs, refs = self._last_win if self._last_win is not None else (None,
                                                                       None)
        while self._pending:
            # shift one frame, repeating the last — the dataset's clamp rule
            lrs = jnp.concatenate([lrs[:, 1:], lrs[:, -1:]], 1)
            refs = jnp.concatenate([refs[:, 1:], refs[:, -1:]], 1)
            out, self.state, conf = self.eval_pipelined(
                self.params, lrs, refs, self.state)
            emitted.append((self._pending.pop(0), out, conf))
            self.count += 1
        self._last_win = (lrs, refs) if lrs is not None else None
        return emitted
