"""Round-3 product paths: torch-checkpoint eval loading through the CLI,
eval-from-saved-config reconstruction, multi-host write guards, and the
multi-chip spatial serving CLI (VERDICT r2 items #3/#4/#6)."""

import os

import numpy as np
import pytest

import run as cli
import refvsr_tpu.configs as C

_TINY = dict(num_blocks=2, mid_channels=8, frame_num=3, frame_itr_num=2,
             patch_size=16, batch_size=1, loss="1*L1", reset_branch=2,
             total_itr=2, write_ckpt_every_epoch=1)


@pytest.fixture()
def tiny_variant():
    """Patch the RefVSR_MFID registry entry to tiny dims for CLI runs."""
    orig = C._VARIANTS["RefVSR_MFID"]
    C._VARIANTS["RefVSR_MFID"] = dict(orig, **_TINY)
    yield
    C._VARIANTS["RefVSR_MFID"] = orig


def _synth_torch_ckpt(path):
    """A reference-shaped .pytorch state_dict for the tiny RefVSR_MFID build
    (values = leaf index so mis-routing would corrupt shapes/values)."""
    torch = pytest.importorskip("torch")
    import jax

    from refvsr_tpu.models.refvsr import init_stream_state
    from refvsr_tpu.train.trainer import build_network
    from refvsr_tpu.utils.convert import flax_to_torch_keymap

    config = C.get_config("RefVSR_MFID")
    net = build_network(config)
    import jax.numpy as jnp
    t, h, w = config.frame_num, 16, 16
    lrs = jnp.zeros((1, t, h, w, 3), jnp.float32)
    refs = jnp.zeros((1, t, 2 * h, 2 * w, 3), jnp.float32)
    state = init_stream_state(1, h, w, config.mid_channels, num_frames=t)
    shapes = jax.eval_shape(
        lambda k: net.init(k, lrs, refs, state), jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    mapping = flax_to_torch_keymap(template)
    by_path = {tuple(getattr(p, "key", str(p)) for p in path): leaf
               for path, leaf in
               jax.tree_util.tree_flatten_with_path(template)[0]}
    sd = {}
    rng = np.random.default_rng(7)
    for tkey, fpath in sorted(mapping.items()):
        v = (rng.standard_normal(by_path[fpath].shape) * 0.02).astype(
            np.float32)
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        sd["module." + tkey] = torch.from_numpy(v)
    torch.save(sd, path)
    return path


def test_eval_cli_torch_checkpoint(fake_dataset, tmp_path, tiny_variant):
    """--ckpt_abs_name <X>.pytorch runs the converter inside CkptManager
    (reference ckpt_manager.py:22-60 loads torch natively; VERDICT r2 #4)."""
    ckpt = _synth_torch_ckpt(str(tmp_path / "RefVSR_MFID.pytorch"))
    out = tmp_path / "out"
    cli.main(["--mode", "RefVSR_MFID", "--data", "RealMCVSR",
              "--data_offset", fake_dataset,
              "--log_offset", str(tmp_path / "logs"),
              "--output_offset", str(out),
              "--eval_mode", "quan_qual", "--quantitative_only",
              "--ckpt_abs_name", ckpt, "--vid_name", "0003"])
    score = list(out.rglob("score_*.txt"))
    assert score, "no score file from torch-ckpt eval"
    txt = score[0].read_text()
    assert "[TOTAL" in txt and "PSNR:" in txt
    # the run is tagged with the torch file's name (init.py:9-34 semantics)
    assert any("RefVSR_MFID.pytorch" in str(p) for p in out.rglob("*"))


def test_eval_cli_missing_ckpt_fails(fake_dataset, tmp_path, tiny_variant):
    """An explicitly named checkpoint that doesn't exist must raise, not
    silently eval random init."""
    with pytest.raises(FileNotFoundError):
        cli.main(["--mode", "RefVSR_MFID", "--data", "RealMCVSR",
                  "--data_offset", fake_dataset,
                  "--log_offset", str(tmp_path / "logs"),
                  "--output_offset", str(tmp_path / "out"),
                  "--eval_mode", "quan_qual", "--quantitative_only",
                  "--ckpt_abs_name", str(tmp_path / "nope.pytorch")])


def test_eval_reconstructs_saved_config(fake_dataset, tmp_path, tiny_variant):
    """Eval with no --config rebuilds the config from the training run's
    saved snapshot (reference run.py:352-357), not from registry defaults."""
    log = str(tmp_path / "logs")
    common = ["--mode", "RefVSR_MFID", "--data", "RealMCVSR",
              "--data_offset", fake_dataset, "--log_offset", log]
    cli.main(["--is_train", "--max_epochs", "1", "-b", "1"] + common)

    # restore the full-size registry entry: only the saved snapshot knows the
    # run was tiny
    orig = C._VARIANTS["RefVSR_MFID"]
    C._VARIANTS["RefVSR_MFID"] = dict(orig, num_blocks=30, mid_channels=48)
    try:
        args = cli.build_parser().parse_args(
            ["--eval_mode", "quan_qual"] + common)
        cfg = cli.build_config(args)
        assert cfg.num_blocks == _TINY["num_blocks"]
        assert cfg.mid_channels == _TINY["mid_channels"]
        assert cfg.frame_num == _TINY["frame_num"]
        assert not cfg.is_train
    finally:
        C._VARIANTS["RefVSR_MFID"] = orig


def test_eval_cli_spatial_devices(fake_dataset, tmp_path, tiny_variant):
    """--spatial_devices 2 evals through the AOT-compiled H-sharded graphs
    (parallel/serve.py product path) on the virtual CPU mesh."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 (virtual) devices")
    out = tmp_path / "out"
    cli.main(["--mode", "RefVSR_MFID", "--data", "RealMCVSR",
              "--data_offset", fake_dataset,
              "--log_offset", str(tmp_path / "logs"),
              "--output_offset", str(out),
              "--eval_mode", "quan_qual", "--quantitative_only",
              "--spatial_devices", "2", "--spatial_halo", "16",
              "--vid_name", "0003"])
    score = list(out.rglob("score_*.txt"))
    assert score
    txt = score[0].read_text()
    assert "[TOTAL" in txt and "PSNR:" in txt
    for line in txt.splitlines():
        if "PSNR:" in line and "[EVAL" in line:
            val = float(line.split("PSNR:")[1].split()[0])
            assert np.isfinite(val) and val > 0


def test_multihost_write_guards(fake_dataset, tmp_path, monkeypatch,
                                tiny_variant):
    """Non-zero ranks write nothing: no config/source snapshots, null TB,
    no ckpt saves (reference guards rank 0, run.py:128-136)."""
    import jax

    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.train.runner import Runner

    def build(rank, world, tag):
        monkeypatch.setattr(jax, "process_index", lambda: rank)
        monkeypatch.setattr(jax, "process_count", lambda: world)
        c = get_config("RefVSR_MFID", mode=f"wg_{tag}", is_train=True,
                       data_offset=fake_dataset,
                       log_offset=str(tmp_path / f"logs_{tag}"), **_TINY)
        c = set_data_path(c, is_train=True)
        c = set_data_path(c, is_train=False)
        return Runner(c), c

    r1, c1 = build(rank=1, world=2, tag="r1")
    assert not r1.is_main
    assert not os.path.exists(os.path.join(c1.log_dir, "config",
                                           "config.json"))
    assert not os.path.exists(os.path.join(c1.log_dir, "source_snapshot"))
    r1.tb.add_scalar("x", 1.0, 0)  # must be a no-op, not a file write
    assert not os.path.exists(os.path.join(c1.log_dir, "log"))

    r0, c0 = build(rank=0, world=2, tag="r0")
    assert r0.is_main
    assert os.path.exists(os.path.join(c0.log_dir, "config", "config.json"))
    assert os.path.exists(os.path.join(c0.log_dir, "source_snapshot"))


def test_delete_log_wipes_run_tree(tmp_path, monkeypatch):
    """handle_directory (reference utils.py:168-191): -dl wipes the run's
    log tree; non-TTY runs take the flag at face value (no prompt)."""
    import types

    from refvsr_tpu.utils.console import handle_directory

    log = tmp_path / "logs" / "P" / "M"
    (log / "old").mkdir(parents=True)
    (log / "old" / "x.txt").write_text("stale")
    cfg = types.SimpleNamespace(log_dir=str(log))
    handle_directory(cfg, True)
    assert os.path.isdir(str(log)) and not os.path.exists(
        str(log / "old"))
    # delete_log=False keeps existing content
    (log / "keep.txt").write_text("k")
    handle_directory(cfg, False)
    assert os.path.exists(str(log / "keep.txt"))


def test_multihost_eval_score_shards(monkeypatch):
    """Eval score files shard per process so rank appends never race."""
    import jax

    from refvsr_tpu.configs import get_config
    from refvsr_tpu.eval.runner import _score_path

    c = get_config("RefVSR_MFID")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert _score_path("/x", c).endswith("_p1.txt")
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert _score_path("/x", c).endswith(
        f"score_{c.EVAL.data}_{c.EVAL.eval_mode}.txt")
