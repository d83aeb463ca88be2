"""MultiWorkerLoader == TrainLoader batches (any worker count), persistence
across epochs, and clean shutdown."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("mcvsr")
    for sub, size in (("HR", 192), ("LRx2", 96), ("LRx4", 48)):
        for cam in ("UW", "W", "T"):
            d = root / "RealMCVSR" / "train" / sub / cam / "0000"
            os.makedirs(d)
            rng = np.random.default_rng(hash((sub, cam)) % 2 ** 31)
            for i in range(6):
                Image.fromarray(
                    rng.integers(0, 255, (size, size, 3),
                                 dtype=np.uint8).astype(np.uint8)).save(
                        d / f"{i:04d}.png")
    return str(root)


@pytest.fixture(scope="module")
def train_ds(tiny_tree):
    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.data.datasets import TrainDataset
    c = get_config("RefVSR_MFID", data_offset=tiny_tree, is_train=True,
                   frame_num=3, frame_itr_num=2, patch_size=4, batch_size=2)
    c = set_data_path(c, is_train=True)
    return TrainDataset(c)


def _collect(loader, epoch):
    loader.set_epoch(epoch)
    return list(loader)


def test_multiworker_matches_single_thread(train_ds):
    from refvsr_tpu.data.datasets import TrainLoader
    from refvsr_tpu.data.loader import MultiWorkerLoader

    ref = TrainLoader(train_ds, batch_size=2, seed=7)
    mw = MultiWorkerLoader(train_ds, batch_size=2, seed=7, num_workers=2)
    try:
        for epoch in (0, 1):  # persistence across epochs
            b_ref = _collect(ref, epoch)
            b_mw = _collect(mw, epoch)
            assert len(b_ref) == len(b_mw) == len(ref)
            for a, b in zip(b_ref, b_mw):
                assert set(a) == set(b)
                for k in a:
                    if isinstance(a[k], np.ndarray):
                        np.testing.assert_array_equal(a[k], b[k])
    finally:
        mw.close()


def test_multiworker_abandoned_iteration_no_stale_batches(train_ds):
    """Breaking out of an epoch mid-iteration (Runner's total_itr break) must
    not let in-flight results from the old epoch collide with the next
    iteration's seq numbering (ADVICE r1: generation-tagged results)."""
    from refvsr_tpu.data.datasets import TrainLoader
    from refvsr_tpu.data.loader import MultiWorkerLoader

    ref = TrainLoader(train_ds, batch_size=1, seed=7)
    mw = MultiWorkerLoader(train_ds, batch_size=1, seed=7, num_workers=2,
                           prefetch_batches=4)
    try:
        # abandon epoch 0 after one batch, leaving prefetched results in flight
        mw.set_epoch(0)
        for batch in mw:
            break
        import time
        time.sleep(0.5)  # let workers finish the abandoned prefetch tasks
        b_ref = _collect(ref, 1)
        b_mw = _collect(mw, 1)
        assert len(b_ref) == len(b_mw)
        for a, b in zip(b_ref, b_mw):
            np.testing.assert_array_equal(a["LR_UW"], b["LR_UW"])
    finally:
        mw.close()


def test_multiworker_worker_count_invariance(train_ds):
    from refvsr_tpu.data.loader import MultiWorkerLoader
    a = MultiWorkerLoader(train_ds, batch_size=2, seed=3, num_workers=1)
    b = MultiWorkerLoader(train_ds, batch_size=2, seed=3, num_workers=3)
    try:
        for x, y in zip(_collect(a, 0), _collect(b, 0)):
            np.testing.assert_array_equal(x["LR_UW"], y["LR_UW"])
            np.testing.assert_array_equal(x["HR_REF_T"], y["HR_REF_T"])
    finally:
        a.close()
        b.close()
