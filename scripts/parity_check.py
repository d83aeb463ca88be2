#!/usr/bin/env python
"""Parity harness: one command between "released weights arrive" and "parity
number".

    python scripts/parity_check.py <ckpt.pytorch> <data_offset> \
        [--config RefVSR_small_L1] [--vid_name 0024] [--test_set test] \
        [--max_frames N] [--save_converted out.msgpack]

Converts the PyTorch checkpoint (reference load semantics:
/root/reference/ckpt_manager.py:22-60 — CPU remap, 'module.' prefix strip),
streams one clip through the eval path, and reports per-frame / per-video /
total PSNR+SSIM in the reference score protocol
(evaluation/eval_qual_quan.py:84-143). Use on `RefVSR_small_L1.pytorch`
first (SURVEY.md §7 step 3, README.md:73-90 checkpoint list)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", help=".pytorch/.pth checkpoint to convert+eval")
    p.add_argument("data_offset", help="dir containing RealMCVSR/")
    p.add_argument("--config", default="RefVSR_small_L1")
    p.add_argument("--vid_name", nargs="*", default=None,
                   help="restrict to specific clip(s)")
    p.add_argument("--test_set", default="test")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--output_offset", default="./parity_out")
    p.add_argument("--save_converted", default=None,
                   help="also save the converted params (msgpack)")
    a = p.parse_args()

    import dataclasses

    import numpy as np

    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.utils.convert import (convert_state_dict,
                                          load_torch_checkpoint)

    config = get_config(a.config, mode=a.config, data_offset=a.data_offset,
                        output_offset=a.output_offset,
                        spynet_ckpt=None, vgg19_ckpt=None)
    config = config.replace(EVAL=dataclasses.replace(
        config.EVAL, vid_name=a.vid_name, test_set=a.test_set,
        eval_mode="quan_qual", quantitative_only=True))
    config = set_data_path(config, is_train=False)
    config = set_data_path(config, is_train=True)

    # build params template + streaming runner via the standard eval init
    from refvsr_tpu.eval.runner import init_eval
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # template init: assets come from ckpt
        trainer, ds, runner, *_ = init_eval(config)

    sd = load_torch_checkpoint(a.ckpt)
    params, missing, unused = convert_state_dict(sd, runner.params,
                                                 strict=False)
    print(f"converted: {len(sd)} torch tensors; "
          f"missing flax leaves: {len(missing)}, unused torch keys: "
          f"{len(unused)}")
    for nm, tk in missing[:20]:
        print(f"  MISSING {'.'.join(nm)} (wanted {tk})")
    for k in unused[:20]:
        print(f"  UNUSED  {k}")
    from refvsr_tpu.utils.precision import cast_floating
    runner.params = cast_floating(params, trainer.compute_dtype)

    if a.save_converted:
        import flax.serialization
        with open(a.save_converted, "wb") as f:
            f.write(flax.serialization.to_bytes(params))
        print(f"saved converted params -> {a.save_converted}")

    # stream-eval (score protocol of eval_qual_quan.py:84-143)
    from refvsr_tpu.data.np_ops import np_resize
    from refvsr_tpu.eval.metrics import psnr, ssim
    t = config.frame_num
    psnr_v = ssim_v = 0.0
    n_v = 0
    per_video, totals = {}, []
    cur_video = None
    done = 0
    for i in range(len(ds)):
        if a.max_frames is not None and done >= a.max_frames:
            break
        item = ds[i]
        if item.get("is_continue"):
            continue
        if item["is_first"] and cur_video is not None and n_v:
            per_video[cur_video] = (psnr_v / n_v, ssim_v / n_v)
            psnr_v = ssim_v = 0.0
            n_v = 0
        cur_video = item["video_name"]
        sr, _ = runner.process(item["LR_UW"][None, :t],
                               item["LR_REF_W"][None, :t], item["is_first"])
        out = sr[0]
        gt = item["HR_UW"][t // 2]
        if config.flag_HD_in:
            out = np.clip(np_resize(out, scale_factor=1 / config.scale,
                                    mode="bicubic"), 0, 1)
        fp, fs = psnr(out, gt), ssim(out, gt)
        print(f"[{item['video_name']}] {item['frame_name']} "
              f"PSNR: {fp:.5f} SSIM: {fs:.5f}")
        psnr_v += fp
        ssim_v += fs
        n_v += 1
        totals.append((fp, fs))
        done += 1
    if cur_video is not None and n_v:
        per_video[cur_video] = (psnr_v / n_v, ssim_v / n_v)
    for vid, (pv, sv) in per_video.items():
        print(f"[MEAN {vid}] PSNR: {pv:.5f} SSIM: {sv:.5f}")
    if totals:
        tp = sum(v[0] for v in totals) / len(totals)
        tssim = sum(v[1] for v in totals) / len(totals)
        print(f"[TOTAL] PSNR: {tp:.5f} SSIM: {tssim:.5f} "
              f"({len(totals)} frames)")


if __name__ == "__main__":
    main()
