"""PROTOCOL-level eval parity vs the torch oracle (VERDICT r4 next-step #7).

tests/test_full_net_parity.py proves per-call parity of the assembled
network; this test proves the EVAL LOOP protocol: sliding stride-1 windows
with clip-edge clamping (datasets.py:233-234), is_first resets at video
boundaries, the model-internal reset_branch re-anchor counter
(RefVSR.py:167-170,291-295), per-frame PSNR/SSIM on the clamped center
frame, and the per-video/total aggregation written to score_*.txt
(eval_qual_quan.py:27-144).

Drive: a tiny synthetic RealMCVSR tree + shared random weights exported as a
reference-style torch checkpoint. Our side runs the REAL production surface
(run-level evaluate(config) with the torch-ckpt importer); the torch side is
an independent ~40-line transcription of the reference eval loop around the
proven oracle. Score lines must match number-for-number.
"""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state

import torch_refvsr_oracle as oracle
from conftest import write_clip_triplet
from test_full_net_parity import _export_sd

pytestmark = pytest.mark.slow

BLOCKS, MID, KSIZE, T, RESET = 2, 8, 2, 3, 3
LR = 32  # LRx4 frame size in the synthetic tree


def _read(path):
    from PIL import Image
    return np.asarray(Image.open(path), np.float32) / 255.0


def _frames(root, sub, cam, clip):
    d = os.path.join(root, "RealMCVSR", "test", sub, cam, clip)
    return [os.path.join(d, f) for f in sorted(os.listdir(d))]


def _torch_eval_loop(sd, root, clips):
    """Independent transcription of eval_qual_quan.py:27-144 +
    Test_datasets.__getitem__ window geometry (datasets.py:222-234) +
    the model's reset_branch counter (RefVSR.py:167-170,291-295)."""
    from refvsr_tpu.eval.metrics import psnr, ssim
    lines = []
    for clip in clips:
        lr_paths = _frames(root, "LRx4", "UW", clip)
        ref_paths = _frames(root, "LRx4", "W", clip)
        hr_paths = _frames(root, "HR", "UW", clip)
        n = len(lr_paths)
        lr_all = np.stack([_read(p) for p in lr_paths])
        ref_all = np.stack([_read(p) for p in ref_paths])
        state = oracle.OracleState()
        count = 0
        for c in range(n):
            idx = np.clip(np.arange(c - T // 2, c - T // 2 + T), 0, n - 1)
            is_first = c == 0
            # RefVSR.py:167-170: forced re-anchor when the window count
            # since the last first-frame reaches reset_branch
            if not is_first and count == RESET:
                is_first = True
            lrs = lr_all[idx][None].transpose(0, 1, 4, 2, 3)
            refs = ref_all[idx][None].transpose(0, 1, 4, 2, 3)
            with torch.no_grad():
                out = oracle.forward(
                    sd, torch.from_numpy(np.ascontiguousarray(lrs)),
                    torch.from_numpy(np.ascontiguousarray(refs)),
                    is_first, False, state, BLOCKS, MID,
                    matching_ksize=KSIZE)
            # RefVSR.py:291-295: counter reset AFTER the forward
            if is_first:
                count = 0
            count += 1
            sr = out[0].numpy().transpose(1, 2, 0)
            gt = _read(hr_paths[c])
            lines.append((clip, os.path.basename(lr_paths[c]),
                          psnr(sr, gt), ssim(sr, gt)))
    return lines


_LINE_RE = re.compile(
    r"\[EVAL [^|]*\|[^|]*\|(?P<vid>[^\]]+)\]\[\d+/\d+\]\[\d+/\d+\] "
    r"(?P<frame>\S+) PSNR: (?P<psnr>[-\d.]+) SSIM: (?P<ssim>[-\d.]+)")


def test_eval_protocol_score_file_parity(tmp_path):
    # ---- synthetic tree: two videos of different lengths (edge clamping
    # differs per clip; second video exercises the video-boundary reset)
    root = tmp_path / "tree"
    clips = {"0000": 6, "0001": 4}
    for clip, nf in clips.items():
        for cam in ("UW", "W", "T"):
            # zlib.crc32, not hash(): string hash() is salted per process
            import zlib
            write_clip_triplet(root / "RealMCVSR", "test", cam, clip, nf,
                               LR, LR,
                               seed=zlib.crc32(f"{clip}/{cam}".encode()))
        # valid split: trainer init needs it to exist
        for cam in ("UW", "W", "T"):
            write_clip_triplet(root / "RealMCVSR", "valid", cam, clip, 2,
                               LR, LR, seed=1)

    # ---- shared weights: init the production net, export a reference-style
    # torch checkpoint, and feed it BACK through the production importer
    net = RefVSRNet(scale=4, num_blocks=BLOCKS, mid_channels=MID,
                    matching_ksize=KSIZE, flag_HD_in=False)
    rng = np.random.default_rng(0)
    lrs_i = jnp.asarray(rng.random((1, T, LR, LR, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(5), lrs_i, lrs_i,
                      init_stream_state(1, LR, LR, MID, num_frames=T))
    sd = _export_sd(params)
    ckpt_path = tmp_path / "shared_weights.pytorch"
    torch.save(sd, str(ckpt_path))

    # ---- our side: the real evaluate(config) surface
    import dataclasses

    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.eval.runner import evaluate
    cfg = get_config(
        "RefVSR_MFID", is_train=False, num_blocks=BLOCKS, mid_channels=MID,
        matching_ksize=KSIZE, frame_num=T, reset_branch=RESET,
        data_offset=str(root), output_offset=str(tmp_path / "out"),
        log_offset=str(tmp_path / "log"), spynet_ckpt=None, vgg19_ckpt=None)
    cfg = cfg.replace(EVAL=dataclasses.replace(
        cfg.EVAL, eval_mode="quan_qual", ckpt_abs_name=str(ckpt_path),
        load_ckpt_by_score=False, quantitative_only=True))
    cfg = set_data_path(cfg, is_train=False)
    cfg = set_data_path(cfg, is_train=True)
    evaluate(cfg)

    # ---- collect our score lines
    result_dir = None
    for dirpath, _, files in os.walk(tmp_path / "out"):
        for f in files:
            if f.startswith("score_") and f.endswith(".txt"):
                result_dir = os.path.join(dirpath, f)
    assert result_dir, "no score file written"
    got = []
    with open(result_dir) as f:
        for line in f:
            m = _LINE_RE.match(line.strip())
            if m:
                got.append((m["vid"], m["frame"], float(m["psnr"]),
                            float(m["ssim"])))

    # ---- torch side + line-for-line diff
    want = _torch_eval_loop(sd, str(root), sorted(clips))
    assert len(got) == len(want) == sum(clips.values())
    for (gv, gf, gp, gs), (wv, wf, wp, ws) in zip(got, want):
        assert (gv, gf) == (wv, wf)
        # outputs agree to ~2e-4 px; PSNR/SSIM of tiny random-weight SR vs
        # GT are flat functions of that — 5e-3 dB / 1e-4 SSIM is tight
        # enough to catch any protocol divergence (a single skipped reset
        # moves PSNR by >0.1 dB at these sizes)
        assert gp == pytest.approx(wp, abs=5e-3), (gv, gf)
        assert gs == pytest.approx(ws, abs=1e-4), (gv, gf)
