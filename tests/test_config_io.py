"""Config JSON round-trip + misload visibility (VERDICT r3 weak #7,
ADVICE r3 #1). Fast tier: no network compiles."""

import dataclasses
import json
import os

import numpy as np
import pytest

from refvsr_tpu.configs import get_config, load_config, save_config


def test_config_roundtrip(tmp_path):
    c = get_config("RefVSR_MFID", is_train=True, num_blocks=3,
                   mid_channels=12, loss="1*L1_lf+0.05*MFID_ref_X_mu")
    p = str(tmp_path / "config.json")
    save_config(c, p)
    c2 = load_config(p)
    assert dataclasses.asdict(c2) == dataclasses.asdict(c)


def test_config_unknown_key_warns(tmp_path):
    c = get_config("RefVSR_MFID", is_train=False)
    p = str(tmp_path / "config.json")
    save_config(c, p)
    with open(p) as f:
        d = json.load(f)
    d["total_itrs"] = 12345          # typo'd field
    d["EVAL"]["qualty"] = True       # typo'd nested field
    with open(p, "w") as f:
        json.dump(d, f)
    with pytest.warns(UserWarning, match="unknown keys.*EVAL.qualty"):
        c2 = load_config(p)
    # typo'd keys dropped, valid ones still round-trip
    assert c2.total_itr == c.total_itr


def test_torch_ckpt_partial_map_warns(tmp_path):
    """A .pytorch checkpoint whose keys don't map must produce a visible
    warning instead of silently evaluating random-init leaves
    (ADVICE r3 ckpt.py finding)."""
    torch = pytest.importorskip("torch")
    from refvsr_tpu.train.ckpt import CkptManager

    mgr = CkptManager(str(tmp_path), "RefVSR")
    # template: a tiny flax-style tree with one conv leaf the converter can
    # look up, so missing/unused are both non-empty for a bogus state_dict
    template = {"params": {"conv_last": {
        "kernel": np.zeros((3, 3, 4, 3), np.float32),
        "bias": np.zeros((3,), np.float32)}}}
    path = os.path.join(str(tmp_path), "bogus.pytorch")
    torch.save({"state_dict": {"module.not_a_real_key.weight":
                               torch.zeros(1, 1, 3, 3)}}, path)
    with pytest.warns(UserWarning, match="did not fully map"):
        params, _ = mgr.load_params(template, abs_path=path)
    # unmapped leaves keep the template values
    assert float(np.abs(params["params"]["conv_last"]["kernel"]).sum()) == 0.0
