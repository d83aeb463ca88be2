"""Evaluation suite: qual/quan, FOV-masked, confidence-map dumps.

Reference: /root/reference/evaluation/{init,eval_qual_quan,eval_quan_FOV,
eval_quan_conf_map}.py. Score-file line formats and aggregation (per-frame ->
per-video mean -> over-videos mean) are preserved so downstream tooling that
parses score_*.txt keeps working."""

from __future__ import annotations

import datetime
import functools
import os
import time
from pathlib import Path

import numpy as np
from PIL import Image

from refvsr_tpu.configs import Config
from refvsr_tpu.data.datasets import TestDataset, collate
from refvsr_tpu.data.np_ops import np_resize
from refvsr_tpu.eval.metrics import psnr, psnr_masked, ssim, ssim_masked
from refvsr_tpu.eval.stream import StreamRunner
from refvsr_tpu.train.ckpt import CkptManager
from refvsr_tpu.train.trainer import Trainer


@functools.lru_cache(maxsize=8)
def _device_downscale_fn(scale_inv: float):
    """Jitted on-device bicubic downscale + clip for the HD-in metric
    protocol (eval_qual_quan.py:84-92 computes metrics on the SR frame
    downscaled by 1/scale). Computing it on device lets metrics-only eval
    skip transferring the full 4x-8K frame (~16x fewer bytes)."""
    import jax
    from refvsr_tpu.ops.resize import resize as _resize

    @jax.jit
    def f(x):
        import jax.numpy as jnp
        return jnp.clip(_resize(x.astype(jnp.float32),
                                scale_factor=scale_inv, mode="bicubic",
                                align_corners=False), 0.0, 1.0)
    return f


def _save_img(path, arr01):
    Path(os.path.dirname(path)).mkdir(parents=True, exist_ok=True)
    Image.fromarray(
        (np.clip(arr01, 0, 1) * 255).round().astype(np.uint8)).save(path)


class ImageWriter:
    """Background image encoder. An 8K PNG encode costs seconds of
    single-core CPU; writing synchronously (as the reference does,
    eval_qual_quan.py:99-129) serializes the accelerator behind the host.
    A small thread pool overlaps encode/IO with the next frame's compute;
    the bounded pending deque caps memory at a few frames. flush() re-raises
    the first writer exception so failures aren't silent."""

    def __init__(self, workers: int = 4, max_pending: int = 12):
        import concurrent.futures
        self._ex = concurrent.futures.ThreadPoolExecutor(workers)
        self._pending = []
        self._max = max_pending

    def save(self, path, arr01):
        while len(self._pending) >= self._max:
            self._pending.pop(0).result()
        self._pending.append(self._ex.submit(_save_img, path, arr01))

    def flush(self):
        err = None
        while self._pending:
            try:
                self._pending.pop(0).result()
            except Exception as e:  # drain everything, then surface first
                err = err or e
        if err is not None:
            raise err

    def close(self):
        try:
            self.flush()
        finally:
            self._ex.shutdown()


def init_eval(config: Config):
    """Build trainer + load checkpoint + output dirs (evaluation/init.py:9-34)."""
    trainer = Trainer(config)
    ds = TestDataset(config, is_valid=False)
    sample = None
    for i in range(len(ds)):
        s = ds[i]
        if "is_continue" not in s:
            sample = s
            break
    assert sample is not None, "empty eval dataset"
    batch = collate([sample])
    ts, loss_params = trainer.init_state({
        "LR_UW": batch["LR_UW"], "LR_REF_W": batch["LR_REF_W"],
        "HR_UW": batch["HR_UW"], "HR_REF_W": batch["HR_REF_W"],
        "HR_REF_T": batch["HR_REF_T"]})
    params = ts.params

    ckpt_name = "random_init"
    ev = config.EVAL
    if ev.ckpt_abs_name or ev.ckpt_name or ev.ckpt_epoch is not None or \
            os.path.exists(os.path.join(config.ckpt_dir, "..",
                                        "checkpoints.txt")):
        cm = CkptManager(os.path.join(config.log_dir, "checkpoint", "train",
                                      "epoch"), config.mode,
                         max_files_to_keep=config.max_ckpt_num)
        explicit = bool(ev.ckpt_abs_name or ev.ckpt_name
                        or ev.ckpt_epoch is not None)
        try:
            params, ckpt_name = cm.load_params(
                params, by_score=ev.load_ckpt_by_score, name=ev.ckpt_name,
                abs_path=ev.ckpt_abs_name, epoch=ev.ckpt_epoch)
        except FileNotFoundError:
            if explicit:  # a named checkpoint that doesn't exist is an error
                raise


    date = datetime.datetime.now().strftime("%Y_%m_%d_%H%M")
    save_root = os.path.join(config.result_dir, config.EVAL.data,
                             f"{date}_{ckpt_name}")
    score_root = save_root
    Path(save_root).mkdir(parents=True, exist_ok=True)

    # re-save the evaluated weights alongside the results so a result dir is
    # self-contained (reference: evaluation/init.py:26 torch.save's the
    # loaded state_dict into the result tree). msgpack, rank-0 only.
    import jax as _jax
    if ckpt_name != "random_init" and _jax.process_index() == 0:
        import flax.serialization as fser
        stem = ckpt_name.rsplit(".", 1)[0]
        with open(os.path.join(save_root, f"{stem}.ckpt"), "wb") as f:
            f.write(fser.to_bytes(params))

    kf_stride = (config.keyframe_stride
                 if config.network == "RefVSR_IR" else None)
    if getattr(config, "spatial_devices", 1) > 1:
        # multi-chip spatial serving: H-shard frames over a (1, N) mesh;
        # graphs AOT-compiled inside the trace-scoped spatial ctx so the
        # steady loop touches no global state (parallel/serve.py)
        from refvsr_tpu.parallel.serve import (build_spatial_mesh,
                                               spatial_eval_fns)
        mesh = build_spatial_mesh(config.spatial_devices)
        t = config.frame_num
        lrs_shape = (1, t) + sample["LR_UW"].shape[1:]
        refs_shape = (1, t) + sample["LR_REF_W"].shape[1:]
        ef, es, _, params = spatial_eval_fns(
            trainer.net, params, mesh, config.spatial_halo,
            lrs_shape, refs_shape, compute_dtype=trainer.compute_dtype,
            keyframe_stride=kf_stride)
    else:
        ef, es = trainer.eval_fns
    pipe_kw = {}
    pipe_fns = (None if getattr(config, "spatial_devices", 1) > 1
                else trainer.pipeline_eval_fns)
    if pipe_fns is not None:
        pipe_kw = dict(eval_prime=pipe_fns[0], eval_pipelined=pipe_fns[1],
                       pipeline_lanes=config.pipeline_lanes)
    runner = StreamRunner(
        trainer.net, params, config.reset_branch, ef, es,
        compute_dtype=trainer.compute_dtype,
        keyframe_stride=kf_stride, **pipe_kw)
    return trainer, ds, runner, save_root, score_root, ckpt_name


def _score_path(score_root, config):
    """Multi-host runs shard score files per process (videos round-robin by
    rank, eval/runner.py sharding below) so appends never race; single-host
    keeps the reference's exact filename (eval_qual_quan.py:99-101)."""
    import jax
    tag = f"_p{jax.process_index()}" if jax.process_count() > 1 else ""
    return os.path.join(
        score_root,
        f"score_{config.EVAL.data}_{config.EVAL.eval_mode}{tag}.txt")


def eval_qual_quan(config: Config):
    """PSNR/SSIM streaming eval + image dumps (eval_qual_quan.py:17-144)."""
    trainer, ds, runner, save_root, score_root, ckpt_name = init_eval(config)
    t = config.frame_num

    writer = ImageWriter()
    try:
        agg = dict(total_norm=0, psnr_total=0.0, ssim_total=0.0,
                   time_total=0.0, psnr_v=0.0, ssim_v=0.0, time_v=0.0,
                   frame_len_prev=0, first_write=True, cur_video=None,
                   n_sub=0, n_emit=0)
        # --vid_name-skipped frames increment frame_len_prev in STREAM order
        # (reference quirk: the skipped video inflates the preceding video's
        # MEAN denominator, eval_qual_quan.py:32-34). With pipelined streaming
        # outputs lag submits by L-1 windows, so each increment is queued with
        # the submit ordinal it occurred at and applied when emission catches
        # up — keeping pipelined score files line-for-line identical to plain
        # streaming under vid_name filtering (r3 advisor finding).
        continue_events = []  # [submit-ordinal] one entry per skipped frame
        results_summary = {}
        need_full = not config.EVAL.quantitative_only  # image dumps want 8K

        def emit(oitem, sr_dev, itr_time):
            """Per-OUTPUT postprocessing: metrics, score lines, image dumps,
            per-video aggregation. With pipelined streaming outputs arrive
            L-1 windows after their window was submitted, so all bookkeeping
            keys off the emitted item, incl. the video boundary (the MEAN
            line for the finished video prints with the NEXT video's first
            item's fields — reference quirk, eval_qual_quan.py:47)."""
            while continue_events and continue_events[0] <= agg["n_emit"]:
                continue_events.pop(0)
                agg["frame_len_prev"] += 1
            agg["n_emit"] += 1
            if (agg["cur_video"] is not None
                    and oitem["video_name"] != agg["cur_video"]
                    and agg["frame_len_prev"]):
                agg["psnr_total"] += agg["psnr_v"]
                agg["ssim_total"] += agg["ssim_v"]
                agg["time_total"] += agg["time_v"]
                line = (f"[MEAN EVAL {config.mode}|{config.EVAL.data}|"
                        f"{oitem['video_name']}]"
                        f"[{oitem['video_idx']}/{oitem['video_len']}]"
                        f" PSNR: {agg['psnr_v'] / agg['frame_len_prev']:.5f}"
                        f" SSIM: {agg['ssim_v'] / agg['frame_len_prev']:.5f}"
                        f" ({agg['time_v'] / agg['frame_len_prev']:.5f}sec)"
                        "\n\n")
                print(line, end="")
                if not config.EVAL.qualitative_only:
                    with open(_score_path(score_root, config), "a") as f:
                        f.write(line)
                agg["psnr_v"] = agg["ssim_v"] = agg["time_v"] = 0.0
            agg["cur_video"] = oitem["video_name"]

            out = out_cmp = None
            if need_full or not config.flag_HD_in:
                out = np.asarray(sr_dev, np.float32)[0]
            else:
                # metrics-only HD-in eval: downscale on device and transfer
                # the small frame instead of the full 4x-8K one (~400 MB
                # over the tunneled backend); same resize tables as np_resize
                small = _device_downscale_fn(1.0 / config.scale)(sr_dev)
                out_cmp = np.asarray(small[0], np.float32)

            gt = oitem["HR_UW"][t // 2]
            frame_psnr = frame_ssim = 0.0
            if not config.EVAL.qualitative_only:
                if out_cmp is None:
                    if config.flag_HD_in:
                        out_cmp = np.clip(
                            np_resize(out, scale_factor=1 / config.scale,
                                      mode="bicubic"), 0, 1)
                    else:
                        out_cmp = out
                frame_psnr = psnr(out_cmp, gt)
                frame_ssim = ssim(out_cmp, gt)

            agg["psnr_v"] += frame_psnr
            agg["ssim_v"] += frame_ssim
            agg["time_v"] += itr_time
            agg["total_norm"] += 1
            agg["frame_len_prev"] = oitem["frame_len"]

            line = (f"[EVAL {config.mode}|{config.EVAL.data}|"
                    f"{oitem['video_name']}]"
                    f"[{oitem['video_idx'] + 1}/{oitem['video_len']}]"
                    f"[{oitem['frame_idx'] + 1}/{oitem['frame_len']}] "
                    f"{oitem['frame_name']} PSNR: {frame_psnr:.5f} "
                    f"SSIM: {frame_ssim:.5f} ({itr_time:.5f}sec)")
            print(line)
            with open(_score_path(score_root, config),
                      "w" if agg["first_write"] else "a") as f:
                f.write(line + "\n")
            agg["first_write"] = False

            if not config.EVAL.quantitative_only:
                stem = oitem["frame_name"].split(".")[0]
                for fmt in ("png", "jpg"):
                    writer.save(os.path.join(save_root, fmt, "input",
                                             oitem["video_name"],
                                             f"{stem}.{fmt}"),
                                oitem["LR_UW"][t // 2])
                    writer.save(os.path.join(save_root, fmt, "output",
                                             oitem["video_name"],
                                             f"{stem}.{fmt}"),
                                out)

        # multi-host: shard by WHOLE video so recurrent state stays process-local
        # (data_sampler.py:31-43,64-72 semantics)
        import jax
        proc, nproc = jax.process_index(), jax.process_count()

        # dispatch time is attributed evenly to the outputs it completes;
        # priming dispatches bank their time for the outputs that follow
        t_unattr = 0.0
        for i in range(len(ds)):
            if nproc > 1 and ds.idx_video[i] % nproc != proc:
                continue
            item = ds[i]
            if item.get("is_continue"):
                continue_events.append(agg["n_sub"])
                continue
            t0 = time.time()
            agg["n_sub"] += 1
            emitted = runner.submit(item["LR_UW"][None, :t],
                                    item["LR_REF_W"][None, :t],
                                    item["is_first"], meta=item)
            t_unattr += time.time() - t0
            for oitem, sr_dev, _ in emitted:
                emit(oitem, sr_dev, t_unattr / len(emitted))
            if emitted:
                t_unattr = 0.0
        t0 = time.time()
        emitted = runner.flush()
        t_unattr += time.time() - t0
        for oitem, sr_dev, _ in emitted:
            emit(oitem, sr_dev, t_unattr / len(emitted))

    finally:
        writer.close()
    total_norm = agg["total_norm"]
    if total_norm:
        psnr_mean = (agg["psnr_total"] + agg["psnr_v"]) / total_norm
        ssim_mean = (agg["ssim_total"] + agg["ssim_v"]) / total_norm
        time_mean = (agg["time_total"] + agg["time_v"]) / total_norm
        shard = f" (shard p{jax.process_index()}, partial)" \
            if jax.process_count() > 1 else ""
        line = (f"\n[TOTAL {ckpt_name}|{config.EVAL.data}]{shard} "
                f"PSNR: {psnr_mean:.5f} SSIM: {ssim_mean:.5f} "
                f"({time_mean:.5f}sec)\n")
        print(line, end="")
        if not config.EVAL.qualitative_only:
            with open(_score_path(score_root, config), "a") as f:
                f.write(line)
        results_summary = {"PSNR": psnr_mean, "SSIM": ssim_mean,
                           "sec_per_frame": time_mean, "frames": total_norm}
    if jax.process_count() > 1:
        # cross-process frame-weighted aggregation: videos are sharded by
        # process (and can hold different frame counts), so the headline
        # number must sum (psnr_sum, ssim_sum, time_sum, n) over shards —
        # rank 0 writes the global [TOTAL] to the unsharded filename
        # (r3 advisor finding: per-shard TOTALs alone aren't the headline)
        from jax.experimental import multihost_utils
        sums = np.asarray([agg["psnr_total"] + agg["psnr_v"],
                           agg["ssim_total"] + agg["ssim_v"],
                           agg["time_total"] + agg["time_v"],
                           float(total_norm)], np.float32)
        g = np.asarray(multihost_utils.process_allgather(sums)).sum(axis=0)
        if g[3] > 0:
            psnr_mean, ssim_mean, time_mean = (
                float(g[0] / g[3]), float(g[1] / g[3]), float(g[2] / g[3]))
            line = (f"\n[TOTAL {ckpt_name}|{config.EVAL.data}] "
                    f"PSNR: {psnr_mean:.5f} SSIM: {ssim_mean:.5f} "
                    f"({time_mean:.5f}sec)\n")
            if jax.process_index() == 0:
                print(line, end="")
                if not config.EVAL.qualitative_only:
                    path = os.path.join(
                        score_root, f"score_{config.EVAL.data}_"
                        f"{config.EVAL.eval_mode}.txt")
                    with open(path, "a") as f:
                        f.write(line)
            results_summary = {"PSNR": psnr_mean, "SSIM": ssim_mean,
                               "sec_per_frame": time_mean,
                               "frames": int(g[3])}
    return results_summary


_FOV_KEYS = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


def eval_quan_FOV(config: Config, max_frames=None):
    """Masked PSNR/SSIM over center-FOV fractions (eval_quan_FOV.py:17-269).
    Masks: inside (center crop), outside (complement), ring (inside minus the
    50% center). Per-frame score lines (key==1.0) and the [TOTAL] block are
    written in the reference's exact line format (eval_quan_FOV.py:196-200,
    245-269) so score files diff cleanly; --is_debug stops after 3 frames and
    skips file writes (eval_quan_FOV.py:66-69,198,268)."""
    trainer, ds, runner, save_root, score_root, ckpt_name = init_eval(config)
    t = config.frame_num
    is_debug = config.EVAL.is_debug

    acc = {m: {k: 0.0 for k in _FOV_KEYS}
           for m in ("pfi", "pfo", "pfr", "sfi", "sfo", "sfr")}
    total_norm = 0
    time_total = 0.0
    first_write = True
    for i in range(len(ds)):
        if max_frames is not None and total_norm >= max_frames:
            break
        if is_debug and total_norm >= 3:
            break
        item = ds[i]
        if item.get("is_continue"):
            continue
        t0 = time.time()
        if config.flag_HD_in:
            # FOV metrics always run on the 1/scale frame — downscale on
            # device and skip the full 4x-8K host transfer
            sr_dev, _ = runner.process_device(item["LR_UW"][None, :t],
                                              item["LR_REF_W"][None, :t],
                                              item["is_first"])
            small = _device_downscale_fn(1.0 / config.scale)(sr_dev)
            out = np.asarray(small[0], np.float32)
        else:
            sr, _ = runner.process(item["LR_UW"][None, :t],
                                   item["LR_REF_W"][None, :t],
                                   item["is_first"])
            out = sr[0]
        itr_time = time.time() - t0
        gt = item["HR_UW"][t // 2]
        h, w, _ = out.shape
        for key in _FOV_KEYS:
            if key == 1.0:
                pfi, sfi = psnr(out, gt), ssim(out, gt)
                pfo = sfo = 0.0
                mask_fi = np.ones((h, w, 3))
            else:
                cr = int(1 / ((1 - key) / 2))
                mask_fi = np.zeros((h, w, 3))
                mask_fi[h // cr:h - h // cr, w // cr:w - w // cr] = 1.0
                pfi = psnr_masked(out, gt, mask_fi)
                sfi = ssim_masked(out, gt, mask_fi)
                mask_fo = 1.0 - mask_fi
                pfo = psnr_masked(out, gt, mask_fo)
                sfo = ssim_masked(out, gt, mask_fo)
            if key > 0.5:
                mask_fr = mask_fi.copy()
                mask_fr[h // 4:h - h // 4, w // 4:w - w // 4] = 0.0
                pfr = psnr_masked(out, gt, mask_fr)
                sfr = ssim_masked(out, gt, mask_fr)
            else:
                pfr = sfr = 0.0
            if key == 1.0:
                # per-frame line, format of eval_quan_FOV.py:196-200
                line = (f"[EVAL {config.mode}|{config.EVAL.data}|"
                        f"{item['video_name']}]"
                        f"[{item['video_idx'] + 1}/{item['video_len']}]"
                        f"[{item['frame_idx'] + 1}/{item['frame_len']}] "
                        f"{item['frame_name']} PSNR: {pfi:.5f} "
                        f"SSIM: {sfi:.5f} ({itr_time:.5f}sec)")
                print(line)
                if not is_debug:
                    with open(_score_path(score_root, config),
                              "w" if first_write else "a") as f:
                        f.write(line + "\n")
                    first_write = False
            for name, val in (("pfi", pfi), ("pfo", pfo), ("pfr", pfr),
                              ("sfi", sfi), ("sfo", sfo), ("sfr", sfr)):
                acc[name][key] += val
        time_total += itr_time
        total_norm += 1

    if total_norm == 0:
        return {}
    means = {m: {k: v / total_norm for k, v in d.items()}
             for m, d in acc.items()}
    time_mean = time_total / total_norm
    # [TOTAL] block, exact format of eval_quan_FOV.py:245-265
    out_str = f"\n[TOTAL {ckpt_name}|{config.EVAL.data}] \n[PSNR-FOV_in  ] ("
    for k, v in means["pfi"].items():
        out_str += f"0-{k * 100:3.1f}%: {v:.5f}, "
    out_str += ")\n[PSNR-FOV_out ] ("
    for k, v in means["pfo"].items():
        out_str += f"{k * 100:3.1f}-100%: {v:.5f}, "
    out_str += ")\n[PSNR-FOV_ring] ("
    for k, v in means["pfr"].items():
        out_str += f"{_FOV_KEYS[-1] * 100:3.1f}-{k * 100:3.1f}%: {v:.5f}, "
    out_str += ")\n[SSIM-FOV_in  ] ("
    for k, v in means["sfi"].items():
        out_str += f"0-{k * 100:3.1f}%: {v:.5f}, "
    out_str += ")\n[SSIM-FOV_out ] ("
    for k, v in means["sfo"].items():
        out_str += f"{k * 100:3.1f}-100%: {v:.5f}, "
    out_str += ")\n[SSIM-FOV_ring] ("
    for k, v in means["sfr"].items():
        out_str += f"{_FOV_KEYS[-1] * 100:3.1f}-{k * 100:3.1f}%: {v:.5f}, "
    out_str += f") ({time_mean:.5f}sec)\n\n"
    print(out_str, end="")
    if not is_debug:
        with open(_score_path(score_root, config), "a") as f:
            f.write(out_str)
    return means


def eval_quan_conf_map(config: Config, max_frames=None):
    """Dump inferno-colormapped confidence maps (eval_quan_conf_map.py:18-182):
    matching conf, propagated conf (max of bw/fw), bw, fw."""
    trainer, ds, runner, save_root, score_root, ckpt_name = init_eval(config)
    t = config.frame_num
    import matplotlib.cm as cm

    writer = ImageWriter()
    try:
        count = 0
        for i in range(len(ds)):
            if max_frames is not None and count >= max_frames:
                break
            item = ds[i]
            if item.get("is_continue"):
                continue
            # only the confidence maps are consumed — keep the SR frame on
            # device (no 4x-frame transfer)
            _, conf = runner.process_device(item["LR_UW"][None, :t],
                                            item["LR_REF_W"][None, :t],
                                            item["is_first"])
            conf_bw, conf_fw, conf_match = [np.asarray(c[0, ..., 0], np.float32)
                                            for c in conf]
            conf_prop = np.maximum(conf_bw, conf_fw)
            stem = item["frame_name"].split(".")[0]
            for name, m in (("conf", conf_match), ("conf_prop", conf_prop),
                            ("conf_prop_bw", conf_bw), ("conf_prop_fw", conf_fw)):
                colored = cm.inferno(np.clip(m, 0, 1))[..., :3]
                writer.save(os.path.join(save_root, "conf", item["video_name"],
                                         f"{stem}_{name}.png"), colored)
            count += 1
    finally:
        writer.close()
    return {"frames": count}


def evaluate(config: Config):
    """Dispatch on eval_mode (eval.py:8-21)."""
    mode = config.EVAL.eval_mode
    if getattr(config, "pipeline_lanes", 0) > 1 and (
            mode not in ("quan_qual", "qual_quan")
            or config.network == "RefVSR_IR"
            or getattr(config, "spatial_devices", 1) > 1):
        import warnings
        warnings.warn("pipeline_lanes>1 supports the RefVSR quan_qual eval "
                      "path only — falling back to plain streaming")
        config = config.replace(pipeline_lanes=0)
    if mode in ("quan_qual", "qual_quan"):
        return eval_qual_quan(config)
    if mode == "FOV":
        return eval_quan_FOV(config)
    if mode == "conf":
        return eval_quan_conf_map(config)
    raise ValueError(f"unknown eval mode {mode!r}")
