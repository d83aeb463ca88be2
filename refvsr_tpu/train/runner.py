"""Training orchestrator: epoch loop, validation, TB scalars, ckpt-on-PSNR.

Reference: /root/reference/run.py:28-206 (Runner). Kept: epoch loop over
['train','valid'] states, per-epoch metric accumulation, checkpoint save keyed
on validation PSNR every write_ckpt_every_epoch epochs, resume from a saved
epoch. TPU deltas: metrics reduce with a jnp mean instead of dist.all_reduce
(single-controller JAX); TensorBoard via torch.utils.tensorboard."""

from __future__ import annotations

import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.configs import Config, save_config
from refvsr_tpu.data.datasets import TestDataset, TrainDataset, TrainLoader
from refvsr_tpu.eval.stream import StreamRunner
from refvsr_tpu.train.ckpt import CkptManager
from refvsr_tpu.train.trainer import TrainState, Trainer


class Runner:
    def __init__(self, config: Config, mesh=None):
        self.config = config
        self.trainer = Trainer(config, mesh=mesh)
        self.train_ds = TrainDataset(config)
        self.valid_ds = TestDataset(config, is_valid=True)
        # multi-host: each controller process loads its own shard of the data
        # (DistIterSampler parity, data_sampler.py:47-62); single-host runs see
        # process_count()==1 -> whole dataset
        world, rank = jax.process_count(), jax.process_index()
        if getattr(config, "thread_num", 0) and config.thread_num > 0:
            # persistent worker pool (FastDataLoader parity); identical
            # batches to TrainLoader for any worker count (per-sample rng)
            from refvsr_tpu.data.loader import MultiWorkerLoader
            self.loader = MultiWorkerLoader(
                self.train_ds, config.batch_size, seed=config.manual_seed,
                world_size=world, rank=rank, num_workers=config.thread_num)
        else:
            self.loader = TrainLoader(self.train_ds, config.batch_size,
                                      seed=config.manual_seed,
                                      world_size=world, rank=rank)
        self.ckpt = CkptManager(
            os.path.join(config.log_dir, "checkpoint", "train", "epoch"),
            config.mode, max_files_to_keep=config.max_ckpt_num)
        # multi-host: all file writes (config/source snapshots, cost.txt, TB,
        # checkpoints, samples) happen on process 0 only — reference guards
        # rank 0 the same way (run.py:128-136, :313-317)
        self.is_main = rank == 0
        Path(config.log_dir).mkdir(parents=True, exist_ok=True)
        if self.is_main:
            save_config(config, os.path.join(config.log_dir, "config",
                                             "config.json"))
            self._snapshot_sources()
        self._tb = None
        self._vis_fn = None
        self._cx_vis_fn = None
        self.ts: TrainState | None = None
        self.loss_params = None
        self.epoch0 = 0

    def _snapshot_sources(self):
        """Copy the model/trainer sources into the log dir at train start
        (trainers/trainer.py:41-43 parity) so a run's code is reconstructable."""
        import shutil

        import refvsr_tpu.models.refvsr as m_refvsr
        import refvsr_tpu.models.refvsr_ir as m_ir
        import refvsr_tpu.train.trainer as m_trainer
        dst = Path(self.config.log_dir) / "source_snapshot"
        dst.mkdir(parents=True, exist_ok=True)
        for mod in (m_refvsr, m_ir, m_trainer):
            try:
                shutil.copy2(mod.__file__, dst / os.path.basename(mod.__file__))
            except OSError:
                pass

    class _NullWriter:
        def add_scalar(self, *a, **k):
            pass

        def close(self):
            pass

    @property
    def tb(self):
        if self._tb is None:
            if not self.is_main:
                self._tb = Runner._NullWriter()
            else:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    os.path.join(self.config.log_dir, "log", "train",
                                 "scalar"))
        return self._tb

    def _init_params(self):
        batch = next(iter(self.loader))
        self.ts, self.loss_params = self.trainer.init_state(batch)
        # complexity report (trainers/trainer.py:85-100 cost.txt equivalent)
        if self.is_main:
            from refvsr_tpu.utils.profiling import write_cost_report
            try:
                write_cost_report(
                    os.path.join(self.config.log_dir, "cost.txt"),
                    self.ts.params)
            except OSError:
                pass
        return batch

    def resume(self, epoch: int):
        self._init_params()
        params, _ = self.ckpt.load_params(self.ts.params, epoch=epoch)
        state = self.ckpt.load_train_state(
            {"opt_state": self.ts.opt_state,
             "step": np.zeros((), np.int32), "epoch": 0}, epoch)
        self.ts = TrainState(params=params, opt_state=state["opt_state"],
                             step=jnp.asarray(state["step"]))
        self.epoch0 = int(state["epoch"]) + 1
        self.ckpt.resume_prune(epoch)

    def resume_abs(self, path: str):
        self._init_params()
        params, _ = self.ckpt.load_params(self.ts.params, abs_path=path)
        self.ts = TrainState(params=params, opt_state=self.ts.opt_state,
                             step=self.ts.step)

    def train(self, max_epochs: int | None = None, max_itr: int | None = None):
        cfg = self.config
        if self.ts is None:
            self._init_params()
        total_itr = max_itr or cfg.total_itr
        itr_per_epoch = max(1, len(self.loader) * cfg.frame_itr_num)
        n_epochs = max_epochs or max(1, -(-total_itr // itr_per_epoch))

        for epoch in range(self.epoch0, n_epochs):
            # ---- train ----
            self.loader.set_epoch(epoch)
            t0 = time.time()
            train_errs, n_batches = {}, 0
            from refvsr_tpu.data.prefetch import prefetch
            from refvsr_tpu.utils.console import format_train_line
            t_batch = time.time()
            for batch in prefetch(self.loader, depth=2):
                self.ts, errs, _ = self.trainer.iteration(
                    self.ts, self.loss_params, batch)
                n_batches += 1
                for k, v in errs.items():
                    train_errs[k] = train_errs.get(k, 0.0) + v
                itr = int(self.ts.step)
                if itr % max(1, cfg.write_log_every_itr_train) < \
                        cfg.frame_itr_num:
                    # cursor-rewriting on a TTY (reference print_logs
                    # refresh mode, utils.py:52-104); plain lines when piped
                    from refvsr_tpu.utils.console import print_status
                    print_status(format_train_line(
                        cfg.mode, epoch, itr, itr_per_epoch, errs,
                        self.trainer.current_lr(self.ts),
                        time.time() - t_batch))
                    for k, v in errs.items():
                        self.tb.add_scalar(f"train_itr/{k}", v, itr)
                t_batch = time.time()
                if itr >= total_itr:
                    break
            train_errs = {k: v / max(n_batches, 1)
                          for k, v in train_errs.items()}
            for k, v in train_errs.items():
                self.tb.add_scalar(f"train_epoch/{k}", v, epoch)
            self.tb.add_scalar("train_epoch/lr",
                               self.trainer.current_lr(self.ts), epoch)

            # ---- valid + ckpt ----
            if (epoch + 1) % cfg.write_ckpt_every_epoch == 0 or \
                    int(self.ts.step) >= total_itr:
                val_psnr = self.validate()
                self.tb.add_scalar("valid_epoch/PSNR", val_psnr, epoch)
                if self.is_main:  # rank-0-only save (run.py:128-136)
                    self.ckpt.save(
                        self.ts.params,
                        {"opt_state": self.ts.opt_state,
                         "step": np.asarray(self.ts.step), "epoch": epoch},
                        epoch, val_psnr)
            from refvsr_tpu.utils.console import end_status
            end_status()
            print(f"[epoch {epoch}] itr={int(self.ts.step)} "
                  f"{ {k: round(v, 5) for k, v in train_errs.items()} } "
                  f"({time.time() - t0:.1f}s)")
            if int(self.ts.step) >= total_itr:
                break
        return self.ts

    def _warped_ref_vis(self, item, t):
        """'FW_aa2_fm_ref_aligned' sample tile (RefVSR.py:305): the ref image
        warped onto the 2x canvas by the hard matching index map."""
        try:
            if self._vis_fn is None:
                net = self.trainer.net

                @jax.jit
                def vis(params, lr, ref):
                    def run(m, lr, ref):
                        _, idx = m.feature_match(lr, ref)
                        return m.aa2(lr, ref, idx, ref, return_fm=True)
                    return net.apply(params, lr, ref, method=run)
                self._vis_fn = vis
            out = self._vis_fn(self.ts.params,
                               jnp.asarray(item["LR_UW"][None, t // 2]),
                               jnp.asarray(item["LR_REF_W"][None, t // 2]))
            return np.asarray(out[0], np.float32)
        except Exception:
            return None

    def _loss_cx_vis(self, item, sr, t):
        """Loss-side CX confidence tiles: the reference stores the contextual
        maps under outs['vis'] (Loss.py:112/123/133) and run.py:177-196 dumps
        them with the samples. CX cost is quadratic in feature positions, so
        (like the reference, which only ever computes it on training patches)
        the maps are evaluated on an aligned center crop sized to the training
        patch, not the full validation frame."""
        cfg = self.config
        from refvsr_tpu.losses import cx_options, parse_loss_spec
        if not any(cx_options(lt) for _, lt in parse_loss_spec(cfg.loss)):
            return []
        try:
            if self._cx_vis_fn is None:
                loss_mod = self.trainer.loss_mod

                @jax.jit
                def vis(loss_params, sr, hr, refs):
                    return loss_mod.apply(loss_params, sr, hr, refs,
                                          method=type(loss_mod).vis_maps)
                self._cx_vis_fn = vis

            sr_h, sr_w = sr.shape[0], sr.shape[1]
            tgt = 4 * cfg.patch_size

            def crop(a):
                # center crop, size proportional to the tensor's own
                # resolution so all crops cover the same image region
                h, w = a.shape[-3:-1]
                ch, cw = min(h, tgt * h // sr_h), min(w, tgt * w // sr_w)
                y, x = (h - ch) // 2, (w - cw) // 2
                return a[..., y:y + ch, x:x + cw, :]

            ref_key = "HR_REF_T" if cfg.is_use_T else "HR_REF_W"
            maps = self._cx_vis_fn(
                self.loss_params, jnp.asarray(crop(sr)[None]),
                jnp.asarray(crop(item["HR_UW"][t // 2])[None]),
                jnp.asarray(crop(item[ref_key][:t])[None]))
            return [(k, np.asarray(v[0, ..., 0], np.float32))
                    for k, v in maps.items()]
        except Exception:
            return []

    def validate(self, max_items: int | None = None) -> float:
        """Streaming validation PSNR over the valid split (run.py:94-136)."""
        cfg = self.config
        t = cfg.frame_num
        ef, es = self.trainer.eval_fns
        runner = StreamRunner(
            self.trainer.net, self.ts.params, cfg.reset_branch, ef, es,
            compute_dtype=self.trainer.compute_dtype,
            keyframe_stride=(cfg.keyframe_stride
                             if cfg.network == "RefVSR_IR" else None))
        sample_dir = os.path.join(cfg.log_dir, "sample", "valid")
        vals = []
        n = len(self.valid_ds) if max_items is None else min(
            max_items, len(self.valid_ds))
        for i in range(n):
            item = self.valid_ds[i]
            if item.get("is_continue"):
                continue
            sr, conf = runner.process(item["LR_UW"][None, :t],
                                      item["LR_REF_W"][None, :t],
                                      item["is_first"])
            gt = item["HR_UW"][t // 2]
            out = sr[0]
            if cfg.save_sample and i < 4 and self.is_main:
                # sample-image dumps incl. confidence visualization tiles
                # (run.py:177-196 + RefVSR.py:301-322 norm_res_vis parity)
                from PIL import Image

                def _norm_res_vis(m):
                    m = m - m.min()
                    return m / max(m.max(), 1e-12)

                Path(sample_dir).mkdir(parents=True, exist_ok=True)
                conf_bw, conf_fw, conf_match = [
                    np.asarray(c[0, ..., 0], np.float32) for c in conf]
                tiles = [("SR", out), ("HR", gt),
                         ("LR", item["LR_UW"][t // 2]),
                         ("conf_map_norm", _norm_res_vis(conf_match)),
                         ("conf_map_prop_backward_norm",
                          _norm_res_vis(conf_bw)),
                         ("conf_map_prop_forward_norm",
                          _norm_res_vis(conf_fw)),
                         ("conf_map_prop_norm",
                          _norm_res_vis(np.maximum(conf_bw, conf_fw)))]
                tiles.append(("FW_aa2_fm_ref_aligned",
                              self._warped_ref_vis(item, t)))
                tiles.extend(self._loss_cx_vis(item, out, t))
                for tag, img in tiles:
                    if img is None:
                        continue
                    Image.fromarray(
                        (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
                    ).save(os.path.join(sample_dir, f"{i:03d}_{tag}.png"))
            if cfg.flag_HD_in:
                from refvsr_tpu.data.np_ops import np_resize
                out = np.clip(np_resize(out, scale_factor=1 / cfg.scale,
                                        mode="bicubic"), 0, 1)
            mse = np.mean((out - gt) ** 2)
            vals.append(10 * np.log10(1.0 / mse))
        return float(np.mean(vals)) if vals else 0.0
