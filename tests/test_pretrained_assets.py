"""Pretrained-asset bootstrap: synthetic torch SPyNet/VGG19 state_dicts on
disk -> Trainer.init_state starts with those exact weights, SPyNet stays
frozen through a training step (reference behavior: SPyNet.py:29-31 loads
./ckpt/SPyNet.pytorch at model init; attention.py:28-42 pretrained VGG19)."""

import numpy as np
import pytest
import torch

from refvsr_tpu.configs import get_config


def _spynet_state_dict(rng):
    """Reference-shaped mmedit SPyNet state_dict: 6 pyramid levels x
    5 ConvModules 7x7 (8->32->64->32->16->2)."""
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    sd = {}
    for i in range(6):
        for j, (cin, cout) in enumerate(chans):
            base = f"basic_module.{i}.basic_module.{j}.conv"
            sd[f"{base}.weight"] = torch.from_numpy(
                rng.standard_normal((cout, cin, 7, 7)).astype(np.float32))
            sd[f"{base}.bias"] = torch.from_numpy(
                rng.standard_normal(cout).astype(np.float32))
    return sd


_VGG_CONV = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
             (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
             (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
             (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512)]


def _vgg19_state_dict(rng):
    sd = {}
    for idx, cin, cout in _VGG_CONV:
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.02)
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32) * 0.02)
    return sd


@pytest.fixture(scope="module")
def asset_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("assets")
    rng = np.random.default_rng(42)
    sp, vg = root / "SPyNet.pytorch", root / "VGG19.pytorch"
    torch.save(_spynet_state_dict(rng), sp)
    torch.save(_vgg19_state_dict(rng), vg)
    return str(sp), str(vg)


def _flat(params):
    import jax
    return {tuple(getattr(p, "key", str(p)) for p in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}


def _tiny_batch(rng, n=1, t_total=3, h=16, w=16):
    def img(*shape):
        return rng.random(shape, dtype=np.float32)
    return {"LR_UW": img(n, t_total, h, w, 3),
            "LR_REF_W": img(n, t_total, 2 * h, 2 * w, 3),
            "HR_UW": img(n, t_total, 4 * h, 4 * w, 3),
            "HR_REF_W": img(n, t_total, 4 * h, 4 * w, 3),
            "HR_REF_T": img(n, t_total, 4 * h, 4 * w, 3)}


def test_init_state_loads_assets_and_spynet_stays_frozen(asset_files, rng):
    from refvsr_tpu.train.trainer import Trainer
    sp_path, vg_path = asset_files
    config = get_config("RefVSR_MFID", num_blocks=2, mid_channels=8,
                        frame_num=3, frame_itr_num=1, patch_size=16,
                        batch_size=1, loss="1*L1",
                        spynet_ckpt=sp_path, vgg19_ckpt=vg_path)
    trainer = Trainer(config)
    batch = _tiny_batch(rng)
    ts, loss_params = trainer.init_state(batch)

    sp_sd = {k: v.numpy() for k, v in torch.load(sp_path).items()}
    flat = _flat(ts.params)
    # every FlowNet leaf must hold the converted torch values
    key = ("params", "FlowNet", "basic_module_0", "conv_0", "conv", "kernel")
    want = sp_sd["basic_module.0.basic_module.0.conv.weight"].transpose(
        2, 3, 1, 0)
    np.testing.assert_array_equal(flat[key], want)
    key_b = ("params", "FlowNet", "basic_module_5", "conv_4", "conv", "bias")
    np.testing.assert_array_equal(
        flat[key_b], sp_sd["basic_module.5.basic_module.4.conv.bias"])

    # matching prefix VGG conv_0 holds the torchvision features.0 weights
    vg_sd = {k: v.numpy() for k, v in torch.load(vg_path).items()}
    fm_key = next(k for k in flat if "feature_extract" in k and "conv_0" in k
                  and k[-1] == "kernel")
    np.testing.assert_array_equal(
        flat[fm_key], vg_sd["features.0.weight"].transpose(2, 3, 1, 0))

    # one optimizer step: SPyNet (frozen via stop_gradient) must not move
    ts2, errs, _ = trainer.iteration(ts, loss_params, batch)
    assert np.isfinite(errs["total"])
    flat2 = _flat(ts2.params)
    for k in flat:
        if "FlowNet" in k:
            np.testing.assert_array_equal(flat2[k], flat[k])


def test_loss_vgg_filled_from_vgg19_ckpt(asset_files, rng):
    """CX-loss VGGs (models/loss/vgg.py:9-51 counterpart) also get the
    pretrained weights through load_pretrained_assets."""
    import jax
    from refvsr_tpu.losses import LossModule
    from refvsr_tpu.utils.convert import load_pretrained_assets
    _, vg_path = asset_files
    mod = LossModule(spec="0.01*FID_hr", scale=4, flag_HD_in=False,
                     vgg_layer="relu3_4")
    sr = rng.random((1, 32, 32, 3), np.float32)
    lp = mod.init(jax.random.PRNGKey(0), sr, sr, sr[:, None])
    config = get_config("RefVSR_MFID", spynet_ckpt=None, vgg19_ckpt=vg_path)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # spynet_ckpt=None warns by design
        _, lp2, report = load_pretrained_assets(config, {"params": {}}, lp)
    assert report.get("vgg_loss_leaves", 0) > 0
    vg_sd = {k: v.numpy() for k, v in torch.load(vg_path).items()}
    lflat = _flat(lp2)
    l0 = next(k for k in lflat if "conv_0" in k and k[-1] == "kernel")
    np.testing.assert_array_equal(
        lflat[l0], vg_sd["features.0.weight"].transpose(2, 3, 1, 0))


def test_missing_assets_warn_loudly(rng):
    from refvsr_tpu.utils.convert import load_pretrained_assets
    config = get_config("RefVSR_MFID", spynet_ckpt="/nonexistent/spynet",
                        vgg19_ckpt="/nonexistent/vgg")
    with pytest.warns(UserWarning, match="spynet_ckpt.*not found"):
        _, _, report = load_pretrained_assets(config, {"params": {}}, None)
    assert report["spynet_leaves"] == 0
