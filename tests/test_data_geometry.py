"""Golden tests for the cross-camera crop geometry and window indexing
(reference: data_loader/utils.py:43-205, datasets.py:43-148,233-288).

Uses coordinate-encoded images: pixel (y, x) stores (y/1000, x/1000, 0), so a
crop's origin can be read back from its corner pixel, verifying the exact
slice arithmetic of every stream."""

import random

import numpy as np
import pytest

from refvsr_tpu.data.datasets import get_patch, get_patch_T


def coord_img(h, w, t=1):
    y = np.arange(h, dtype=np.float32)[:, None] / 1000.0
    x = np.arange(w, dtype=np.float32)[None, :] / 1000.0
    img = np.stack([np.broadcast_to(y[:, :1], (h, w)),
                    np.broadcast_to(x[:1, :], (h, w)),
                    np.zeros((h, w), np.float32)], -1)
    return np.tile(img, (1, 1, t))


class FixedRng:
    """random.Random stub with scripted randrange/randint values."""

    def __init__(self, values):
        self.values = list(values)

    def randrange(self, lo, hi):
        v = self.values.pop(0)
        assert lo <= v < hi, (lo, v, hi)
        return v

    def randint(self, lo, hi):
        v = self.values.pop(0)
        assert lo <= v <= hi
        return v

    def uniform(self, lo, hi):
        return lo


def origin(patch_t):
    """(y, x) origin of a coordinate-encoded (T, H, W, 3) patch."""
    return (round(float(patch_t[0, 0, 0, 0]) * 1000),
            round(float(patch_t[0, 0, 0, 1]) * 1000))


def test_get_patch_geometry():
    h, w, p, scale = 96, 128, 16, 4
    lr_uw = coord_img(h, w)
    lr_w_img = coord_img(2 * h, 2 * w)
    hr_uw = coord_img(scale * h, scale * w)
    hr_w = coord_img(2 * scale * h, 2 * scale * w)

    x, y, delta = 40, 30, 7
    rng = FixedRng([x, y, delta])
    o_lr_uw, o_lr_w, o_hr_uw, o_hr_w = get_patch(
        lr_uw, lr_w_img, hr_uw, hr_w, p, scale, False, rng)

    # UW at (y, x), size p (utils.py:50-52)
    assert origin(o_lr_uw) == (y, x)
    assert o_lr_uw.shape == (1, p, p, 3)
    # W at 2*(coord - fov_offset) + delta, size 2p (utils.py:55-61)
    assert origin(o_lr_w) == ((y - h // 4) * 2 + delta, (x - w // 4) * 2 + delta)
    assert o_lr_w.shape == (1, 2 * p, 2 * p, 3)
    # HR_UW at scale*(y, x), size scale*p (utils.py:64-67)
    assert origin(o_hr_uw) == (scale * y, scale * x)
    assert o_hr_uw.shape == (1, scale * p, scale * p, 3)
    # HR_W at (scale/2)*W coords (utils.py:69-73)
    assert origin(o_hr_w) == (2 * ((y - h // 4) * 2 + delta),
                              2 * ((x - w // 4) * 2 + delta))
    assert o_hr_w.shape == (1, scale * p, scale * p, 3)


def test_get_patch_hd_in_returns_upscaled_ref():
    """flag_HD_in: HR_UW == LR_UW patch; HR_W = bicubic 2x of the LR_W patch
    (utils.py:76-79,104)."""
    h, w, p = 96, 128, 16
    lr_uw = coord_img(h, w)
    lr_w_img = coord_img(2 * h, 2 * w)
    rng = FixedRng([40, 30, 7])
    o_lr_uw, o_lr_w, o_hr_uw, o_hr_w = get_patch(
        lr_uw, lr_w_img, None, None, p, 4, True, rng)
    np.testing.assert_array_equal(o_hr_uw, o_lr_uw)
    assert o_hr_w.shape == (1, 4 * p, 4 * p, 3)


def test_get_patch_t_geometry():
    """T path (utils.py:110-205): UW grid 20 with pad 8, W pad 5, T at 5x
    coords rescaled 4/5."""
    h, w, p, scale = 200, 300, 16, 4
    lr_uw = coord_img(h, w)
    lr_w_img = coord_img(2 * h, 2 * w)
    lr_t = coord_img(5 * h, 5 * w)
    hr_uw = coord_img(scale * h, scale * w)
    hr_w = coord_img(2 * scale * h, 2 * scale * w)
    hr_t = coord_img(5 * scale * h, 5 * scale * w)

    x, y, dw, dt = 130, 85, 7, 11
    rng = FixedRng([x, y, dw, dt])
    o_lr_uw, o_lr_w, o_lr_t, o_hr_uw, o_hr_w, o_hr_t = get_patch_T(
        lr_uw, lr_w_img, lr_t, hr_uw, hr_w, hr_t, p, scale, False, rng)

    assert origin(o_lr_uw) == (y, x)
    assert origin(o_lr_w) == ((y - 5 * h // 20) * 2 + dw,
                              (x - 5 * w // 20) * 2 + dw)
    # T patch: origin 5*(coord - 8/20 fov) + delta, then rescaled x4/5
    ty = (y - 8 * h // 20) * 5 + dt
    tx = (x - 8 * w // 20) * 5 + dt
    assert o_lr_t.shape == (1, 4 * p, 4 * p, 3)
    # 4/5 bicubic rescale (align_corners=False): output pixel u samples input
    # coordinate (u + 0.5)/(4/5) - 0.5, so pixel 1 reads ty + 1.375
    got_ty, got_tx = (float(o_lr_t[0, 1, 1, 0]) * 1000,
                      float(o_lr_t[0, 1, 1, 1]) * 1000)
    assert abs(got_ty - (ty + 1.375)) < 0.5
    assert abs(got_tx - (tx + 1.375)) < 0.5


def test_train_dataset_window_indexing(tmp_path):
    """Windows start every frame_itr_num; frame idxs clamp to
    [window_start, len-1] (datasets.py:66-67, sampled_frame_idx.clip)."""
    from refvsr_tpu.configs import get_config, set_data_path
    import os
    from PIL import Image

    n_frames = 7
    for sub in ("HR", "LRx2", "LRx4"):
        for cam in ("UW", "W", "T"):
            d = tmp_path / "RealMCVSR" / "train" / sub / cam / "0000"
            os.makedirs(d)
            size = {"HR": 192, "LRx2": 96, "LRx4": 48}[sub]
            for i in range(n_frames):
                Image.fromarray(
                    np.zeros((size, size, 3), np.uint8)).save(
                        d / f"{i:04d}.png")

    c = get_config("RefVSR_MFID", data_offset=str(tmp_path), is_train=True,
                   frame_num=3, frame_itr_num=2, patch_size=4,
                   batch_size=1)
    c = set_data_path(c, is_train=True)
    from refvsr_tpu.data.datasets import TrainDataset
    ds = TrainDataset(c)
    # starts: 0, 2, 4 (range(0, 7-2+1, 2) = 0,2,4)
    assert ds.idx_frame == [0, 2, 4]

    rng = random.Random(0)
    s = ds.__getitem__(0, rng=rng)
    # window 0: offset = -1, count = 4, clamped to [0, 6] with min=start=0
    assert s["LR_UW"].shape[0] == c.frame_num + c.frame_itr_num - 1


def test_test_dataset_is_first_and_ranges(tmp_path):
    from refvsr_tpu.configs import get_config, set_data_path
    import os
    from PIL import Image

    for clip, n in (("0000", 3), ("0001", 2)):
        for sub in ("HR", "LRx2", "LRx4"):
            for cam in ("UW", "W", "T"):
                d = tmp_path / "RealMCVSR" / "test" / sub / cam / clip
                os.makedirs(d)
                size = {"HR": 64, "LRx2": 32, "LRx4": 16}[sub]
                for i in range(n):
                    Image.fromarray(
                        np.zeros((size, size, 3), np.uint8)).save(
                            d / f"{i:04d}.png")

    c = get_config("RefVSR_MFID", data_offset=str(tmp_path), is_train=False,
                   frame_num=3)
    c = set_data_path(c, is_train=False)
    from refvsr_tpu.data.datasets import TestDataset
    ds = TestDataset(c)
    firsts = [ds[i]["is_first"] for i in range(len(ds))]
    assert firsts == [True, False, False, True, False]
    assert ds.video_ranges() == [(0, 0, 3), (1, 3, 5)]
