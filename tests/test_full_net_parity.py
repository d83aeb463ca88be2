"""Full-network golden parity: the ASSEMBLED JAX RefVSR vs the torch oracle
(tests/torch_refvsr_oracle.py, a functional transcription of
RefVSR.py:151-325) with SHARED random weights, at tiny dims.

Covers what the per-module parity tests cannot: branch ordering, conf gating,
fusion wiring, the low-res-UP-warp quirk, and the cross-window state handoff
of all three entry points (forward_train over two consecutive windows,
forward_first -> forward_stream -> forward_stream). One wiring transposition
anywhere in the assembly fails these (VERDICT r3 next-step #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.utils.convert import flax_to_torch_keymap

import torch_refvsr_oracle as oracle

N, T, H, W = 1, 3, 16, 16
BLOCKS, MID, KSIZE = 2, 8, 2


def _export_sd(params):
    """Flax params -> reference-style torch state_dict (HWIO -> OIHW)."""
    mapping = flax_to_torch_keymap(params)
    by_path = {tuple(getattr(p, "key", str(p)) for p in path): leaf
               for path, leaf in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    sd = {}
    for tkey, fpath in mapping.items():
        v = np.asarray(by_path[fpath], np.float32)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        sd[tkey] = torch.from_numpy(v.copy())
    # match0 bias channel tag isn't inferable from the 1-D bias shape
    # (convert.py:_fix_match0_bias_keys handles the import direction)
    for k in list(sd):
        alt = k.replace(".map64.", ".map128.")
        if ".map64.0.bias" in k and alt.replace(".bias", ".weight") in sd:
            sd[alt] = sd.pop(k)
    return sd


@pytest.fixture(scope="module")
def net_and_weights():
    net = RefVSRNet(scale=4, num_blocks=BLOCKS, mid_channels=MID,
                    matching_ksize=KSIZE, flag_HD_in=False)
    key = jax.random.PRNGKey(7)
    rng = np.random.default_rng(11)
    n_frames = T + 2  # two extra for the sliding eval windows
    lrs_all = rng.random((N, n_frames, H, W, 3)).astype(np.float32)
    refs_all = rng.random((N, n_frames, 2 * H, 2 * W, 3)).astype(np.float32)
    params = net.init(key, jnp.asarray(lrs_all[:, :T]),
                      jnp.asarray(refs_all[:, :T]),
                      init_stream_state(N, H, W, MID, num_frames=T))
    return net, params, _export_sd(params), lrs_all, refs_all


def _t(x):  # NHWC numpy window -> NCHW torch
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))


def test_forward_train_two_windows(net_and_weights):
    """Train entry over two consecutive sliding windows: output AND the
    window-1 use of window-0's saved forward state (RefVSR.py:279-283,
    is_train branch: saved at i==0, consumed at i==range_start)."""
    net, params, sd, lrs_all, refs_all = net_and_weights
    st = init_stream_state(N, H, W, MID, num_frames=T)
    ost = oracle.OracleState()

    outs_j, outs_t = [], []
    for wi, first in ((0, True), (1, False)):
        lrs = lrs_all[:, wi:wi + T]
        refs = refs_all[:, wi:wi + T]
        out_j, st = net.apply(params, jnp.asarray(lrs), jnp.asarray(refs), st,
                              method=RefVSRNet.forward_train)
        with torch.no_grad():
            out_t = oracle.forward(sd, _t(lrs), _t(refs), first, True, ost,
                                   BLOCKS, MID, matching_ksize=KSIZE)
        outs_j.append(np.asarray(out_j, np.float32))
        outs_t.append(out_t.numpy().transpose(0, 2, 3, 1))

    for wi, (a, b) in enumerate(zip(outs_j, outs_t)):
        np.testing.assert_allclose(a, b, atol=2e-4,
                                   err_msg=f"train window {wi}")


def test_forward_first_then_stream(net_and_weights):
    """Eval entries: forward_first then two forward_stream windows. Exercises
    the shifted-flow cache, the matching cache, the ring RAP cache, and the
    center-step state save/consume (RefVSR.py eval branches)."""
    net, params, sd, lrs_all, refs_all = net_and_weights
    ost = oracle.OracleState()

    lrs0 = lrs_all[:, :T]
    refs0 = refs_all[:, :T]
    out_j, st, _ = net.apply(params, jnp.asarray(lrs0), jnp.asarray(refs0),
                             method=RefVSRNet.forward_first)
    with torch.no_grad():
        out_t = oracle.forward(sd, _t(lrs0), _t(refs0), True, False, ost,
                               BLOCKS, MID, matching_ksize=KSIZE)
    np.testing.assert_allclose(np.asarray(out_j, np.float32),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, err_msg="first window")

    for wi in (1, 2):
        lrs = lrs_all[:, wi:wi + T]
        refs = refs_all[:, wi:wi + T]
        out_j, st, _ = net.apply(params, jnp.asarray(lrs), jnp.asarray(refs),
                                 st, method=RefVSRNet.forward_stream)
        with torch.no_grad():
            out_t = oracle.forward(sd, _t(lrs), _t(refs), False, False, ost,
                                   BLOCKS, MID, matching_ksize=KSIZE)
        np.testing.assert_allclose(np.asarray(out_j, np.float32),
                                   out_t.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-4, err_msg=f"stream window {wi}")


def test_forward_hd_in_flagship_wiring():
    """The 8K-flagship configuration's distinct wiring: flag_HD_in=True with
    matching_ksize=8 — BOTH aligners take the affine path (aa1 scale 4,
    aa2 scale 8), FeatureMatching runs the vgg_range=7 chain (nearest 1/2
    downscale, maxpool, map128) and the conf map is bicubic-upscaled 4x back
    to the lr grid (attention.py:64-99). first + one stream window."""
    KS = 8
    net = RefVSRNet(scale=4, num_blocks=BLOCKS, mid_channels=MID,
                    matching_ksize=KS, flag_HD_in=True)
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(5)
    h = w = 16
    n_frames = T + 1
    lrs_all = rng.random((N, n_frames, h, w, 3)).astype(np.float32)
    refs_all = rng.random((N, n_frames, h, w, 3)).astype(np.float32)
    params = net.init(key, jnp.asarray(lrs_all[:, :T]),
                      jnp.asarray(refs_all[:, :T]),
                      init_stream_state(N, h, w, MID, num_frames=T))
    sd = _export_sd(params)
    ost = oracle.OracleState()

    out_j, st, _ = net.apply(params, jnp.asarray(lrs_all[:, :T]),
                             jnp.asarray(refs_all[:, :T]),
                             method=RefVSRNet.forward_first)
    with torch.no_grad():
        out_t = oracle.forward(sd, _t(lrs_all[:, :T]), _t(refs_all[:, :T]),
                               True, False, ost, BLOCKS, MID,
                               flag_HD_in=True, matching_ksize=KS)
    np.testing.assert_allclose(np.asarray(out_j, np.float32),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, err_msg="HD first window")

    lrs = lrs_all[:, 1:1 + T]
    refs = refs_all[:, 1:1 + T]
    out_j, st, _ = net.apply(params, jnp.asarray(lrs), jnp.asarray(refs), st,
                             method=RefVSRNet.forward_stream)
    with torch.no_grad():
        out_t = oracle.forward(sd, _t(lrs), _t(refs), False, False, ost,
                               BLOCKS, MID, flag_HD_in=True,
                               matching_ksize=KS)
    np.testing.assert_allclose(np.asarray(out_j, np.float32),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, err_msg="HD stream window")
