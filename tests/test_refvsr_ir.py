"""Shape/consistency tests for RefVSR-IR (+ EDVR extractor, modulated DCN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refvsr_tpu.models.edvr import EDVRFeatureExtractor, modulated_deform_conv
from refvsr_tpu.models.refvsr import init_stream_state
from refvsr_tpu.models.refvsr_ir import RefVSRIRNet, sliding_keyframe_mask

N, T, H, W = 1, 5, 16, 16


def test_sliding_keyframe_mask():
    # first window, t=9, stride 5 -> [0, 5, 8] (RefVSR_IR.py:256-264)
    m, first = sliding_keyframe_mask(9, 5, None)
    assert list(np.where(m)[0]) == [0, 5, 8] and first == 0
    # next windows slide back by one
    m, first = sliding_keyframe_mask(9, 5, first)
    assert list(np.where(m)[0]) == [4, 8] and first == 4
    m, first = sliding_keyframe_mask(9, 5, first)
    assert list(np.where(m)[0]) == [3, 8]


def test_modulated_dcn_zero_offset_equals_conv(rng):
    """With zero offsets and mask=1, mDCN == plain 3x3 conv (zero padding)."""
    import torch
    import torch.nn.functional as F
    x = rng.standard_normal((1, 8, 10, 4), dtype=np.float32)
    wgt = rng.standard_normal((3, 3, 4, 6), dtype=np.float32) * 0.1
    dg = 2
    offset = np.zeros((1, 8, 10, 2 * dg * 9), np.float32)
    mask = np.ones((1, 8, 10, dg * 9), np.float32)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), jnp.asarray(wgt), None, dg)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(wgt.transpose(3, 2, 0, 1)), padding=1)
    np.testing.assert_allclose(np.asarray(got),
                               ref.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_modulated_dcn_integer_offset_shift(rng):
    """Integer (dy=1, dx=0) offsets on all taps == conv of shifted input."""
    import torch
    import torch.nn.functional as F
    x = rng.standard_normal((1, 8, 10, 2), dtype=np.float32)
    wgt = rng.standard_normal((3, 3, 2, 3), dtype=np.float32) * 0.1
    dg = 1
    off = np.zeros((1, 8, 10, 2 * 9), np.float32)
    off[..., 0::2] = 1.0  # dy at even channels (mmcv interleave)
    mask = np.ones((1, 8, 10, 9), np.float32)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(off),
                                jnp.asarray(mask), jnp.asarray(wgt), None, dg)
    x_shift = np.zeros_like(x)
    x_shift[:, :-1] = x[:, 1:]  # sample at y+1 == shift rows up
    ref = F.conv2d(torch.from_numpy(x_shift.transpose(0, 3, 1, 2)),
                   torch.from_numpy(wgt.transpose(3, 2, 0, 1)), padding=1)
    # interior only (border taps differ: shifted-conv zero pad vs dcn sampling)
    got_i = np.asarray(got)[:, 1:-2, 1:-1]
    ref_i = ref.numpy().transpose(0, 2, 3, 1)[:, 1:-2, 1:-1]
    np.testing.assert_allclose(got_i, ref_i, atol=2e-5)


def test_edvr_extractor_shapes():
    net = EDVRFeatureExtractor(mid_channels=16, num_frames=5,
                               deform_groups=4, num_blocks_extraction=2,
                               center_frame_idx=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 5, 16, 16, 3))
    params = net.init(key, x)
    out = net.apply(params, x)
    assert out.shape == (2, 16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def ir_setup():
    net = RefVSRIRNet(scale=4, num_blocks=2, mid_channels=8, matching_ksize=2,
                      keyframe_stride=2)
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (N, T, H, W, 3))
    refs = jax.random.uniform(key, (N, T, 2 * H, 2 * W, 3))
    state = init_stream_state(N, H, W, 8, num_frames=T)
    mask = sliding_keyframe_mask(T, 2, None)[0]
    params = net.init(key, lrs, refs, state, mask)
    return net, params, lrs, refs, state, mask


def test_ir_forward_train(ir_setup):
    net, params, lrs, refs, state, mask = ir_setup
    out, new_state = net.apply(params, lrs, refs, state, mask)
    assert out.shape == (N, 4 * H, 4 * W, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert new_state.feat_prop.shape == (N, H, W, 8)


def test_ir_eval_stream(ir_setup):
    net, params, _, _, _, _ = ir_setup
    key = jax.random.PRNGKey(1)
    lrs = jax.random.uniform(key, (N, T, H, W, 3))
    refs = jax.random.uniform(key, (N, T, H, W, 3))
    mask, first = sliding_keyframe_mask(T, 2, None)
    out, state, _ = net.apply(params, lrs, refs, mask,
                              method=RefVSRIRNet.forward_first)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    mask2, _ = sliding_keyframe_mask(T, 2, first)
    out2, state2, _ = net.apply(params, lrs, refs, state, mask2,
                                method=RefVSRIRNet.forward_stream)
    assert out2.shape == (N, 4 * H, 4 * W, 3)
    assert np.isfinite(np.asarray(out2)).all()


def test_ir_trainer_iteration():
    """Two sliding-window optimizer steps on the IR net with sliding keyframe
    masks (in-memory batch, no dataset)."""
    from refvsr_tpu.configs import get_config
    from refvsr_tpu.train.trainer import Trainer
    rng = np.random.default_rng(0)
    cfg = get_config("RefVSR_IR_MFID", num_blocks=2, mid_channels=8,
                     frame_num=5, frame_itr_num=2, patch_size=16,
                     batch_size=1, loss="1*L1", keyframe_stride=2)
    tr = Trainer(cfg)
    t_total = cfg.frame_num + cfg.frame_itr_num - 1
    h = w = cfg.patch_size

    def img(*s):
        return rng.random(s, dtype=np.float32)

    batch = {"LR_UW": img(1, t_total, h, w, 3),
             "LR_REF_W": img(1, t_total, 2 * h, 2 * w, 3),
             "HR_UW": img(1, t_total, 4 * h, 4 * w, 3),
             "HR_REF_W": img(1, t_total, 4 * h, 4 * w, 3),
             "HR_REF_T": img(1, t_total, 4 * h, 4 * w, 3)}
    ts, loss_params = tr.init_state(batch)
    ts, errs, _ = tr.iteration(ts, loss_params, batch)
    assert np.isfinite(errs["total"])
    assert int(ts.step) == cfg.frame_itr_num
