"""Single image-pair serving adapter (Replicate/Gradio-style).

Reference: /root/reference/replicate.py:23-110. Pipeline preserved: read LR +
Ref stills, center-crop to <= 1280x720 (replicate.py:43-67), crop to a /8
multiple, expand to a fake 3-frame sequence (:87-88), run the network with
optical flow short-circuited to zeros (is_gradio path, RefVSR.py:183-191),
write the SR png. TPU deltas: bf16 compute, jitted graph cached across calls."""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from refvsr_tpu.configs import Config, get_config
from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.ops.image import refine_to_multiple
from refvsr_tpu.utils.precision import cast_floating


def _read_image(path):
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _crop_max(img, max_h=720, max_w=1280):
    """Center-crop to at most max_h x max_w (replicate.py:43-67)."""
    h, w = img.shape[:2]
    if h > max_h:
        top = (h - max_h) // 2
        img = img[top:top + max_h]
    if w > max_w:
        left = (w - max_w) // 2
        img = img[:, left:left + max_w]
    return img


class Predictor:
    def __init__(self, config: Config | None = None, params=None,
                 compute_dtype=jnp.bfloat16):
        if config is None:
            config = get_config("RefVSR_MFID_8K")
        import dataclasses
        config = config.replace(
            EVAL=dataclasses.replace(config.EVAL, is_gradio=True,
                                     is_replicate=True))
        self.config = config
        self.compute_dtype = compute_dtype
        self.net = RefVSRNet(
            scale=config.scale, num_blocks=config.num_blocks,
            mid_channels=config.mid_channels,
            matching_ksize=config.matching_ksize,
            flag_HD_in=config.flag_HD_in, zero_flow=True)
        self.params = params
        self._jit = None

    def load_checkpoint(self, path: str):
        """Load a converted (msgpack) or torch (.pytorch) checkpoint."""
        template = self._ensure_params_template()
        if path.endswith((".pytorch", ".pth", ".pt")):
            from refvsr_tpu.utils.convert import (convert_state_dict,
                                                  load_torch_checkpoint)
            sd = load_torch_checkpoint(path)
            self.params, _, _ = convert_state_dict(sd, template, strict=False)
        else:
            import flax.serialization as fser
            with open(path, "rb") as f:
                self.params = fser.from_bytes(template, f.read())

    def _ensure_params_template(self):
        if self.params is not None:
            return self.params
        key = jax.random.PRNGKey(0)
        h = w = 64
        lrs = jax.random.uniform(key, (1, 3, h, w, 3))
        refs = jax.random.uniform(key, (1, 3, h, w, 3))
        self.params = self.net.init(
            key, lrs, refs,
            init_stream_state(1, h, w, self.config.mid_channels,
                              num_frames=3))
        return self.params

    def predict(self, lr_path: str, ref_path: str, out_path: str = "out.png"):
        self._ensure_params_template()
        lr = refine_to_multiple(_crop_max(_read_image(lr_path)), 8)
        ref = refine_to_multiple(_crop_max(_read_image(ref_path)), 8)
        # fake 3-frame sequence (replicate.py:87-88)
        lrs = np.broadcast_to(lr[None, None], (1, 3) + lr.shape).copy()
        refs = np.broadcast_to(ref[None, None], (1, 3) + ref.shape).copy()

        params = cast_floating(self.params, self.compute_dtype)
        if self._jit is None:
            net = self.net

            @jax.jit
            def fwd(params, lrs, refs):
                out, _, _ = net.apply(params, lrs, refs,
                                      method=RefVSRNet.forward_first)
                return out

            self._jit = fwd
        out = self._jit(params, jnp.asarray(lrs, self.compute_dtype),
                        jnp.asarray(refs, self.compute_dtype))
        out = np.asarray(out[0], np.float32)
        Path(os.path.dirname(out_path) or ".").mkdir(parents=True,
                                                     exist_ok=True)
        Image.fromarray((np.clip(out, 0, 1) * 255).round().astype(
            np.uint8)).save(out_path)
        return out_path
