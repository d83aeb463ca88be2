"""Persistent multi-worker training loader.

Reference counterpart: torch DataLoader with `num_workers=config.thread_num`
wrapped by FastDataLoader's persistent-worker trick
(/root/reference/data_loader/FastDataLoader.py:5-24,
trainers/baseTrainer.py:63-106). Here: a pool of spawn-context processes
(safe next to an initialized JAX runtime — fork can deadlock it) that stays
alive across epochs, each decoding/cropping whole batches; results are
re-ordered by sequence id so iteration order is deterministic.

Determinism beats the reference: augmentation randomness is seeded per
(seed, epoch, sample index), so results are IDENTICAL for any worker count
(torch's per-worker RNG streams change with num_workers).
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import random

from refvsr_tpu.data.datasets import collate


def _sample_rng(seed: int, epoch: int, index: int) -> random.Random:
    return random.Random((seed * 1_000_003 + epoch) * 1_000_003 + index)


def _worker_main(ds, seed, task_q, result_q):
    while True:
        task = task_q.get()
        if task is None:
            return
        gen, seq, epoch, idxs = task
        samples = [ds.__getitem__(int(i), rng=_sample_rng(seed, epoch, int(i)))
                   for i in idxs]
        result_q.put((gen, seq, collate(samples)))


class MultiWorkerLoader:
    """Batched, epoch-seeded, rank-sharded iterator over a TrainDataset.

    Same sharding semantics as TrainLoader / DistIterSampler
    (data_sampler.py:47-62): epoch-seeded permutation, strided split across
    ranks. set_epoch() reshuffles. Workers persist across epochs."""

    def __init__(self, dataset, batch_size: int, seed: int = 1234,
                 world_size: int = 1, rank: int = 0, num_workers: int = 4,
                 prefetch_batches: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.world_size = world_size
        self.rank = rank
        self.num_workers = max(1, num_workers)
        self.prefetch = max(2, prefetch_batches)
        self.epoch = 0
        self._pool = None
        # generation id: bumped per __iter__ so results left in flight by an
        # abandoned iteration (e.g. Runner breaking at total_itr) can never
        # collide with a later iteration's restarted seq numbering (ADVICE r1)
        self._gen = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        per_rank = -(-len(self.ds) // self.world_size)
        return per_rank // self.batch_size

    def _ensure_pool(self):
        if self._pool is not None:
            return
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._pool = [
            ctx.Process(target=_worker_main,
                        args=(self.ds, self.seed, self._task_q,
                              self._result_q), daemon=True)
            for _ in range(self.num_workers)]
        for p in self._pool:
            p.start()

    def close(self):
        if self._pool is None:
            return
        for _ in self._pool:
            self._task_q.put(None)
        for p in self._pool:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _batches(self):
        import numpy as np
        g = np.random.default_rng(self.seed + self.epoch)
        order = g.permutation(len(self.ds))[self.rank::self.world_size]
        n_batches = len(order) // self.batch_size
        for b in range(n_batches):
            yield order[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        self._ensure_pool()
        self._gen += 1
        gen = self._gen
        batches = list(self._batches())
        pending = {}
        next_submit = 0
        next_yield = 0
        epoch = self.epoch
        while next_yield < len(batches):
            while (next_submit < len(batches)
                   and next_submit - next_yield < self.prefetch):
                self._task_q.put((gen, next_submit, epoch,
                                  batches[next_submit].tolist()))
                next_submit += 1
            waited = 0.0
            while next_yield not in pending:
                try:
                    r_gen, seq, batch = self._result_q.get(timeout=5)
                    if r_gen != gen:   # stale result from an abandoned epoch
                        continue
                    waited = 0.0
                except queue_mod.Empty:
                    waited += 5.0
                    dead = [p.exitcode for p in self._pool
                            if not p.is_alive()]
                    if dead:
                        # e.g. spawn re-import of a non-importable __main__
                        self.close()
                        raise RuntimeError(
                            f"data worker(s) died (exit codes {dead}); "
                            "note: multiprocessing 'spawn' requires an "
                            "importable __main__ module")
                    if waited >= 300.0:
                        raise RuntimeError("data workers stalled (>300s)")
                    continue
                pending[seq] = batch
            yield pending.pop(next_yield)
            next_yield += 1
