"""Golden parity tests: our NHWC ops vs torch-CPU reference semantics.

torch is used ONLY as a test oracle (it ships CPU-only in this image); the
framework itself never imports it."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from refvsr_tpu import ops


def to_nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def from_torch(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("mode,align,in_hw,arg", [
    ("bilinear", False, (13, 17), {"scale_factor": 2}),
    ("bilinear", True, (13, 17), {"scale_factor": 2}),
    ("bilinear", False, (24, 20), {"size": (11, 13)}),
    ("bilinear", True, (24, 20), {"size": (11, 13)}),
    ("bicubic", False, (13, 17), {"scale_factor": 2}),
    ("bicubic", False, (16, 16), {"scale_factor": 0.5}),
    ("bicubic", False, (15, 17), {"scale_factor": 4}),
    ("bicubic", False, (20, 24), {"size": (30, 30)}),
    ("nearest", None, (10, 12), {"scale_factor": 2}),
    ("nearest", None, (10, 12), {"scale_factor": 0.5}),
])
def test_resize_matches_torch(rng, mode, align, in_hw, arg):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    kwargs = dict(arg)
    tkw = dict(kwargs)
    if mode != "nearest":
        tkw["align_corners"] = align
    ref = F.interpolate(to_nchw(x), mode=mode, **tkw)
    got = ops.resize(jnp.asarray(x), mode=mode,
                     align_corners=bool(align), **kwargs)
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=2e-5, rtol=1e-5)


def test_avg_pool_2x2(rng):
    x = rng.standard_normal((2, 13, 17, 3), dtype=np.float32)
    ref = F.avg_pool2d(to_nchw(x), 2, 2, count_include_pad=False)
    got = ops.avg_pool_2x2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=1e-6)


def _torch_refvsr_warp(x_nchw, flow_nchw):
    """Reimplementation of /root/reference/models/utils.py:35-43 as oracle."""
    H, W = flow_nchw.shape[2:]
    hori = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(-1, -1, H, -1)
    vert = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(-1, -1, -1, W)
    grid = torch.cat([hori, vert], 1)
    flow = torch.cat([
        flow_nchw[:, 0:1] / ((x_nchw.size(3) - 1.0) / 2.0),
        flow_nchw[:, 1:2] / ((x_nchw.size(2) - 1.0) / 2.0)], 1)
    return F.grid_sample(x_nchw, (grid + flow).permute(0, 2, 3, 1),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=False)


def test_warp_matches_reference_semantics(rng):
    x = rng.standard_normal((2, 12, 16, 4), dtype=np.float32)
    flow = (rng.standard_normal((2, 12, 16, 2)) * 3).astype(np.float32)
    ref = _torch_refvsr_warp(to_nchw(x), to_nchw(flow))
    got = ops.warp(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=2e-5)


def test_warp_2x_grid(rng):
    """feat_prop (h,w) warped with an upsampled 2x flow grid (RefVSR.py:220)."""
    x = rng.standard_normal((1, 8, 10, 4), dtype=np.float32)
    flow = (rng.standard_normal((1, 16, 20, 2)) * 2).astype(np.float32)
    ref = _torch_refvsr_warp(to_nchw(x), to_nchw(flow))
    got = ops.warp(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=2e-5)


def test_flow_warp_matches_mmedit(rng):
    x = rng.standard_normal((2, 12, 16, 3), dtype=np.float32)
    flow = (rng.standard_normal((2, 12, 16, 2)) * 3).astype(np.float32)
    # mmedit flow_warp oracle (flow_warp.py:6-47)
    xt = to_nchw(x)
    ft = torch.from_numpy(flow)
    h, w = 12, 16
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + ft
    gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(xt, torch.stack((gxn, gyn), dim=3), mode="bilinear",
                        padding_mode="border", align_corners=True)
    got = ops.flow_warp(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=2e-5)


def test_extract_patches_same_3x3_matches_unfold(rng):
    x = rng.standard_normal((2, 9, 11, 5), dtype=np.float32)
    xt = to_nchw(x)
    # reference: reflection 'same' pad then Unfold (RefVSR_/utils.py:29-57)
    pad = torch.nn.ReflectionPad2d((1, 1, 1, 1))(xt)
    ref = F.unfold(pad, kernel_size=3, stride=1)  # (N, C*9, L)
    got = ops.extract_patches(jnp.asarray(x), ksize=3, stride=1, padding="same")
    # ours is (N, L, 9*C) in [ky,kx,C] order; torch is (N, C*9, L) in [C,ky,kx]
    n, l, _ = got.shape
    got_t = np.asarray(got).reshape(n, l, 3, 3, 5).transpose(0, 4, 2, 3, 1)
    ref_t = ref.numpy().reshape(n, 5, 3, 3, l)
    np.testing.assert_allclose(got_t, ref_t, atol=1e-6)


def test_fold_roundtrip(rng):
    x = rng.standard_normal((2, 12, 16, 3), dtype=np.float32)
    p = ops.extract_patches(jnp.asarray(x), ksize=2, stride=2, padding="valid")
    back = ops.fold_non_overlapping(p, (12, 16), ksize=2, channels=3)
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


def test_gather_patches_matches_torch_gather(rng):
    vals = rng.standard_normal((2, 20, 7), dtype=np.float32)
    idx = rng.integers(0, 20, size=(2, 33))
    ref = torch.gather(torch.from_numpy(vals).permute(0, 2, 1), 2,
                       torch.from_numpy(idx)[:, None, :].expand(-1, 7, -1))
    got = ops.gather_patches(jnp.asarray(vals), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref.numpy(), atol=0)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 5, 6, 12), dtype=np.float32)
    ref = F.pixel_shuffle(to_nchw(x), 2)
    got = ops.pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=0)


def test_gaussian_lowpass_matches_reference(rng):
    import scipy.ndimage
    x = rng.standard_normal((1, 8, 8, 3), dtype=np.float32)
    # oracle: reflection pad 2 + 3x3 depthwise conv with scipy gaussian kernel
    n = np.zeros((3, 3)); n[1, 1] = 1.0
    k = scipy.ndimage.gaussian_filter(n, sigma=1)
    conv = torch.nn.Conv2d(3, 3, 3, padding=0, bias=False, groups=3)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(k).float()[None, None].repeat(3, 1, 1, 1))
    ref = conv(torch.nn.ReflectionPad2d(2)(to_nchw(x)))
    got = ops.gaussian_lowpass(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=1e-6)


def test_wide_im2col_conv_matches_native(rng):
    import jax
    from refvsr_tpu.ops.conv import wide_im2col_conv
    for k, c, o in ((7, 8, 32), (7, 64, 32), (3, 16, 2)):
        x = jnp.asarray(rng.standard_normal((2, 17, 23, c), dtype=np.float32))
        w = jnp.asarray(rng.standard_normal((k, k, c, o),
                                            dtype=np.float32)) * 0.1
        b = jnp.asarray(rng.standard_normal(o, dtype=np.float32))
        want = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((k // 2, k // 2),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = wide_im2col_conv(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_spynet_conv_formulation_same_params_and_output(rng, monkeypatch):
    """REFVSR_SPYNET_CONV=im2col_w must keep the exact param tree and output
    (SPyNet's 7x7 convs; checkpoint compatibility either way)."""
    import jax
    from refvsr_tpu.models import spynet as spynet_mod

    x = jnp.asarray(rng.standard_normal((1, 12, 16, 8), dtype=np.float32))
    m_ref = spynet_mod.SPyNetBasicModule()
    params = m_ref.init(jax.random.PRNGKey(0), x)
    want = m_ref.apply(params, x)
    monkeypatch.setattr(spynet_mod, "_SPYNET_CONV", "im2col_w")
    got = spynet_mod.SPyNetBasicModule().apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("mode,align,in_hw,ch,arg", [
    # integer-factor periodic fast path, odd sizes and small channel counts
    ("bicubic", False, (27, 31), 1, {"scale_factor": 4}),
    ("bilinear", False, (27, 31), 2, {"scale_factor": 4}),
    ("bicubic", False, (9, 11), 2, {"scale_factor": 8}),
    ("bilinear", False, (26, 30), 1, {"scale_factor": 0.5}),
    ("nearest", None, (27, 31), 2, {"scale_factor": 4}),
    # irregular (matmul) path: align_corners=True x2 (SPyNet flow upsample),
    # /32-multiple fitting (SPyNet input), arbitrary shrink
    ("bilinear", True, (17, 23), 2, {"scale_factor": 2}),
    ("bilinear", False, (27, 45), 3, {"size": (32, 64)}),
    ("bilinear", False, (32, 64), 2, {"size": (27, 45)}),
    ("bicubic", False, (21, 19), 1, {"size": (34, 50)}),
])
def test_resize_fast_paths_match_torch(rng, mode, align, in_hw, ch, arg):
    """The periodic slice path and the MXU matmul path (ops/resize.py) must
    both reproduce torch.nn.functional.interpolate on the shapes the model
    actually uses (1/2-channel flow and confidence maps included)."""
    x = rng.standard_normal((1, *in_hw, ch), dtype=np.float32)
    tkw = dict(arg)
    if mode != "nearest":
        tkw["align_corners"] = align
    ref = F.interpolate(to_nchw(x), mode=mode, **tkw)
    got = ops.resize(jnp.asarray(x), mode=mode,
                     align_corners=bool(align), **dict(arg))
    np.testing.assert_allclose(np.asarray(got), from_torch(ref), atol=3e-5,
                               rtol=1e-5)
