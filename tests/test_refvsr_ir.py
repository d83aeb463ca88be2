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


def _mdcn_oracle(x, offset, mask, weight, bias, dg):
    """Scalar reference for mmcv modulated_deform_conv2d (stride 1, pad 1,
    dilation 1) implementing the CUDA kernel's documented semantics directly
    (mmcv dmcn_im2col_bilinear: a sample at (y, x) is zero unless
    -1 < y < H and -1 < x < W, with out-of-bounds bilinear corners reading 0;
    offset channels read group-major, tap-major, (dy, dx) interleaved;
    mask applied post-sampling). Written independently of the production
    gather+matmul formulation (models/edvr.py:26-103) so it is a true oracle
    for fractional and out-of-bounds taps. torchvision (whose
    ops.deform_conv2d would be an alternative oracle) is not in this image.

    x (N,H,W,C), offset (N,H,W,2*dg*9), mask (N,H,W,dg*9), weight HWIO.
    """
    n, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    cg = c // dg
    out = np.zeros((n, h, w, o), np.float64)
    xd = x.astype(np.float64)

    def sample(img2d, y, xx):
        if y <= -1 or y >= h or xx <= -1 or xx >= w:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        v = 0.0
        for dy2, wyy in ((0, 1 - wy), (1, wy)):
            for dx2, wxx in ((0, 1 - wx), (1, wx)):
                yy, xc = y0 + dy2, x0 + dx2
                if 0 <= yy < h and 0 <= xc < w:
                    v += wyy * wxx * img2d[yy, xc]
        return v

    for b in range(n):
        for oy in range(h):
            for ox in range(w):
                acc = np.zeros(o, np.float64)
                for g in range(dg):
                    for t in range(kh * kw):
                        ki, kj = t // kw, t % kw
                        dy = offset[b, oy, ox, g * 18 + 2 * t]
                        dx = offset[b, oy, ox, g * 18 + 2 * t + 1]
                        m = mask[b, oy, ox, g * 9 + t]
                        sy = oy + ki - 1 + dy
                        sx = ox + kj - 1 + dx
                        for ci in range(cg):
                            v = sample(xd[b, :, :, g * cg + ci], sy, sx)
                            acc += v * m * weight[ki, kj, g * cg + ci]
                out[b, oy, ox] = acc
    if bias is not None:
        out += bias
    return out.astype(np.float32)


def test_modulated_dcn_fractional_oracle(rng):
    """Exact oracle for random FRACTIONAL offsets (incl. far out-of-bounds
    taps), random mask, multiple deform groups — the semantics `edvrm`
    checkpoint parity rides on (VERDICT r3 weak #5; edvr_net.py:55-58)."""
    n, h, w, c, o, dg = 2, 7, 9, 4, 5, 2
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wgt = (rng.standard_normal((3, 3, c, o), dtype=np.float32) * 0.2)
    bias = rng.standard_normal(o, dtype=np.float32)
    # offsets: mostly small fractional, plus a band of huge ones that push
    # taps entirely outside (must contribute exactly zero)
    off = rng.standard_normal((n, h, w, 2 * dg * 9)).astype(np.float32) * 2.5
    off[:, :2, :, ::3] += 40.0
    off[:, -2:, :, 1::4] -= 40.0
    mask = rng.random((n, h, w, dg * 9), dtype=np.float32)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(off),
                                jnp.asarray(mask), jnp.asarray(wgt),
                                jnp.asarray(bias), dg)
    ref = _mdcn_oracle(x, off, mask, wgt, bias, dg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_modulated_dcn_fractional_oracle_dg4(rng):
    """Same oracle at deform_groups=8-style grouping (dg=4, cg=2) with
    boundary-hugging offsets exercising the -1<y<H edge rule."""
    n, h, w, c, o, dg = 1, 6, 6, 8, 3, 4
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    wgt = (rng.standard_normal((3, 3, c, o), dtype=np.float32) * 0.2)
    off = rng.uniform(-1.0, 1.0, (n, h, w, 2 * dg * 9)).astype(np.float32)
    # pin several taps to exact integer / exact -1 boundary coordinates
    off[..., :8] = np.round(off[..., :8] * 3)
    mask = rng.random((n, h, w, dg * 9), dtype=np.float32)
    got = modulated_deform_conv(jnp.asarray(x), jnp.asarray(off),
                                jnp.asarray(mask), jnp.asarray(wgt),
                                None, dg)
    ref = _mdcn_oracle(x, off, mask, wgt, None, dg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


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
