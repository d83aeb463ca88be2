"""Checkpoint manager with the reference's scoring/rotation semantics.

Reference: /root/reference/ckpt_manager.py:8-196. Behaviors kept:
  - two files per save: ckpt/<mode>_<epoch>.ckpt (network params) and
    state/<mode>_<epoch>.ckpt (epoch, itr, optimizer, schedule step)
  - checkpoints.txt: body = entries sorted by score (best first), last line
    duplicates the most recent save; pruned to `max_files` best entries
  - load by score (line 0) / by recency (last line) / by name / abs path / epoch
  - resume prunes entries newer than the resume epoch

Serialization is flax msgpack (host-independent pytrees) instead of torch
pickles; torch checkpoints are imported via refvsr_tpu/utils/convert.py."""

from __future__ import annotations

import os

import flax.serialization as fser


class CkptManager:
    def __init__(self, root_dir: str, model_name: str,
                 max_files_to_keep: int = 10, is_descending: bool = True):
        self.root_dir = root_dir
        self.dir_ckpt = os.path.join(root_dir, "ckpt")
        self.dir_state = os.path.join(root_dir, "state")
        self.model_name = model_name
        self.max_files = max_files_to_keep
        self.is_descending = is_descending
        self.list_path = os.path.join(root_dir, "checkpoints.txt")
        os.makedirs(self.dir_ckpt, exist_ok=True)
        os.makedirs(self.dir_state, exist_ok=True)

    # ---------- naming ----------
    def _file_name(self, epoch):
        if isinstance(epoch, str):
            return f"{self.model_name}_{epoch}.ckpt"
        return f"{self.model_name}_{epoch:05d}.ckpt"

    # ---------- save ----------
    def save(self, params, train_state_bytes_tree, epoch, score: float):
        name = self._file_name(epoch)
        with open(os.path.join(self.dir_ckpt, name), "wb") as f:
            f.write(fser.to_bytes(params))
        with open(os.path.join(self.dir_state, name), "wb") as f:
            f.write(fser.to_bytes(train_state_bytes_tree))

        lines = self._read_lines()
        if lines:
            # drop the duplicated 'most recent' marker line; if it is not also a
            # scored body entry, its files were rotated out (ckpt_manager.py:140-148)
            recent = lines[-1]
            if recent not in lines[:-1]:
                self._remove(recent.split(" ")[0])
            lines = lines[:-1]
        entry = f"{name} {score}"
        lines.append(entry)
        lines.append(entry)  # duplicated most-recent marker
        self._write_lines(lines)
        self._rotate()

    def _rotate(self):
        lines = self._read_lines()
        recent = lines[-1]
        body = self._sorted(lines[:-1])
        while len(body) > self.max_files:
            victim = body.pop()
            if victim != recent:
                self._remove(victim.split(" ")[0])
        self._write_lines(body + [recent])

    def _sorted(self, lines):
        return sorted(lines, key=lambda l: float(l.split(" ")[1]),
                      reverse=self.is_descending)

    def _remove(self, name):
        for d in (self.dir_ckpt, self.dir_state):
            p = os.path.join(d, name)
            if os.path.exists(p):
                os.remove(p)

    def _read_lines(self):
        if not os.path.exists(self.list_path):
            return []
        with open(self.list_path) as f:
            return [l for l in f.read().splitlines() if l.strip()]

    def _write_lines(self, lines):
        with open(self.list_path, "w") as f:
            for l in lines:
                f.write(l + os.linesep)

    # ---------- load ----------
    def load_params(self, template, by_score=True, name=None, abs_path=None,
                    epoch=None):
        """Returns (params, file_name). `template` is a matching pytree."""
        if name is None and abs_path is None and epoch is None:
            lines = self._read_lines()
            if not lines:
                raise FileNotFoundError(f"no checkpoints.txt in {self.root_dir}")
            file_name = (lines[0] if by_score else lines[-1]).split(" ")[0]
            path = os.path.join(self.dir_ckpt, file_name)
        elif abs_path is not None:
            file_name = os.path.basename(abs_path)
            path = abs_path
        elif name is not None:
            file_name = name
            path = os.path.join(self.dir_ckpt, file_name)
        else:
            file_name = self._file_name(int(epoch))
            path = os.path.join(self.dir_ckpt, file_name)
        if path.endswith((".pytorch", ".pth", ".pt")):
            # published torch checkpoints load through the converter, exactly
            # like serving (reference loads them natively,
            # ckpt_manager.py:22-60, incl. stripping DDP 'module.' prefixes)
            from refvsr_tpu.utils.convert import (convert_state_dict,
                                                  load_torch_checkpoint)
            sd = load_torch_checkpoint(path)
            params, missing, unused = convert_state_dict(
                sd, template, strict=False)
            # strict=False is parity (reference also load_state_dict
            # strict-by-default on a matching arch), but a silently
            # mis-matched variant would eval with random-init leaves —
            # surface any unmapped keys (known non-weight buffers excluded
            # by the converter already)
            if missing or unused:
                import warnings
                warnings.warn(
                    f"torch checkpoint '{file_name}' did not fully map: "
                    f"{len(missing)} target leaves keep their current "
                    f"values (e.g. {sorted(missing)[:3]}), "
                    f"{len(unused)} source keys unused "
                    f"(e.g. {sorted(unused)[:3]}). Wrong --config variant "
                    "for this checkpoint?")
        else:
            with open(path, "rb") as f:
                params = fser.from_bytes(template, f.read())
        return params, file_name

    def load_train_state(self, template, epoch):
        path = os.path.join(self.dir_state, self._file_name(int(epoch)))
        with open(path, "rb") as f:
            return fser.from_bytes(template, f.read())

    def resume_prune(self, resume_epoch: int):
        """Remove entries newer than resume_epoch (ckpt_manager.py:92-124)."""
        lines = self._read_lines()
        if not lines:
            return
        body, recent = lines[:-1], None
        kept = []
        for line in body:
            fname = line.split(" ")[0]
            ep = int(fname.rsplit(".", 1)[0].rsplit("_", 1)[-1])
            if ep > resume_epoch:
                self._remove(fname)
            else:
                kept.append(line)
                if ep == resume_epoch:
                    recent = line
        if recent is None and kept:
            recent = kept[-1]
        if recent is not None:
            self._write_lines(kept + [recent])
            self._rotate()
