"""Pipelined streaming parity: forward_stream_prime/forward_stream_pipelined
(models/refvsr.py) driven through StreamRunner.submit/flush must emit the
SAME per-frame outputs as plain forward_stream — L-1 windows late. Covers
L=2 with mid-video re-anchors (reset_branch), L=4 steady state, flush at
video end, and a two-video boundary. Windows are dataset-style stride-1
clamped windows (datasets.py:233-234 clamp rule)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refvsr_tpu.eval.stream import StreamRunner
from refvsr_tpu.models.refvsr import RefVSRNet

N, T, H, W = 1, 7, 16, 16


def tiny_net(**kw):
    cfg = dict(scale=4, num_blocks=2, mid_channels=8, matching_ksize=2,
               flag_HD_in=False)
    cfg.update(kw)
    return RefVSRNet(**cfg)


@pytest.fixture(scope="module")
def setup():
    net = tiny_net()
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (N, T, H, W, 3))
    refs = jax.random.uniform(key, (N, T, H, W, 3))
    # params are pipeline_lanes-independent (setup() never reads the field),
    # so one init serves the plain and pipelined nets
    from refvsr_tpu.models.refvsr import init_stream_state
    state = init_stream_state(N, H, W, 8, num_frames=T)
    params = net.init(key, lrs, refs, state)
    return params


def _fns(net):
    ef = jax.jit(functools.partial(net.apply,
                                   method=RefVSRNet.forward_first))
    es = jax.jit(functools.partial(net.apply,
                                   method=RefVSRNet.forward_stream))
    return ef, es


def _pipe_fns(net):
    ep = jax.jit(functools.partial(net.apply,
                                   method=RefVSRNet.forward_stream_prime))
    epp = jax.jit(functools.partial(
        net.apply, method=RefVSRNet.forward_stream_pipelined))
    return ep, epp


def _video(key, n_frames):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    lr = np.asarray(jax.random.uniform(k1, (N, n_frames, H, W, 3)))
    ref = np.asarray(jax.random.uniform(k2, (N, n_frames, H, W, 3)))
    return lr, ref


def _windows(lr, ref):
    """Dataset-style stride-1 windows: output frame d's window is frames
    clip(d-c .. d+c) — consecutive windows shift by one with a repeated
    last frame at the clip tail (the clamp rule flush() reproduces)."""
    f = lr.shape[1]
    c = T // 2
    for d in range(f):
        idx = np.clip(np.arange(d - c, d + c + 1), 0, f - 1)
        yield d, lr[:, idx], ref[:, idx]


def _run_plain(params, reset_branch, videos):
    net = tiny_net()
    ef, es = _fns(net)
    runner = StreamRunner(net, params, reset_branch, ef, es)
    outs = {}
    for v, (lr, ref) in enumerate(videos):
        for d, wl, wr in _windows(lr, ref):
            sr, _ = runner.process(wl, wr, is_first=(d == 0))
            outs[(v, d)] = np.asarray(sr)
    return outs


def _run_pipelined(params, reset_branch, lanes, videos):
    net = tiny_net(pipeline_lanes=lanes)
    ef, es = _fns(net)
    ep, epp = _pipe_fns(net)
    runner = StreamRunner(net, params, reset_branch, ef, es,
                          eval_prime=ep, eval_pipelined=epp,
                          pipeline_lanes=lanes)
    outs = {}
    for v, (lr, ref) in enumerate(videos):
        for d, wl, wr in _windows(lr, ref):
            for meta, sr, _ in runner.submit(wl, wr, is_first=(d == 0),
                                             meta=(v, d)):
                outs[meta] = np.asarray(sr)
    for meta, sr, _ in runner.flush():
        outs[meta] = np.asarray(sr)
    return outs


def _check(plain, piped):
    assert sorted(plain) == sorted(piped)
    for k in sorted(plain):
        np.testing.assert_allclose(piped[k], plain[k], atol=2e-5,
                                   err_msg=f"frame {k}")


def test_lanes2_with_reset_and_two_videos(setup):
    """L=2: steady pipeline + two mid-video re-anchors + video boundary
    (flush inside submit) + end flush."""
    videos = [_video(1, 11), _video(2, 8)]
    plain = _run_plain(setup, 4, videos)
    piped = _run_pipelined(setup, 4, 2, videos)
    _check(plain, piped)


def test_lanes4_no_reset(setup):
    """L=4 (P=1: the whole backward chain is ONE batch-4 prop step per
    dispatch), reset_branch=None, drains 3 chains at flush."""
    videos = [_video(3, 10)]
    plain = _run_plain(setup, None, videos)
    piped = _run_pipelined(setup, None, 4, videos)
    _check(plain, piped)


def test_eval_qual_quan_pipelined_matches_plain(fake_dataset,
                                                tmp_path_factory):
    """CLI-level surface: eval_qual_quan with pipeline_lanes=2 must produce
    the same PSNR/SSIM summary as the plain stream on the synthetic tree
    (the submit/flush path incl. the emit-late bookkeeping in
    eval/runner.py)."""
    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.eval.runner import eval_qual_quan

    def cfg(lanes):
        log = tmp_path_factory.mktemp(f"logs_pipe{lanes}")
        c = get_config(
            "RefVSR_MFID", mode="tinypipe", is_train=False,
            data_offset=fake_dataset, log_offset=str(log),
            batch_size=1, frame_num=3, frame_itr_num=2,
            num_blocks=2, mid_channels=8, reset_branch=2,
            loss="1*L1", thread_num=0, pipeline_lanes=lanes)
        c = set_data_path(c, is_train=False)
        c.EVAL.quantitative_only = True
        return c

    plain = eval_qual_quan(cfg(0))
    piped = eval_qual_quan(cfg(2))
    assert piped["frames"] == plain["frames"] == 8
    np.testing.assert_allclose(piped["PSNR"], plain["PSNR"], atol=1e-3)
    np.testing.assert_allclose(piped["SSIM"], plain["SSIM"], atol=1e-4)


def test_eval_pipelined_vid_name_filtering_matches_plain(tmp_path_factory):
    """--vid_name filtering skips whole videos mid-run; skipped frames
    inflate the NEXT MEAN line's denominator in stream order (reference
    quirk, eval_qual_quan.py:32-34). With pipelined lanes the increments
    must be applied in emit order, not submit order, or the score files
    diverge (r3 advisor finding, eval/runner.py). Compares the full score
    files line-for-line (timings stripped)."""
    import glob
    import os
    import re

    from conftest import write_clip_triplet

    from refvsr_tpu.configs import get_config, set_data_path
    from refvsr_tpu.eval.runner import eval_qual_quan

    root = tmp_path_factory.mktemp("RealMCVSR_vidname")
    ds_root = root / "RealMCVSR"
    for clip in ("0010", "0011", "0012"):
        for cam in ("UW", "W", "T"):
            write_clip_triplet(ds_root, "test", cam, clip, 8, 64, 64,
                               seed=hash(("test", clip, cam)) % 2**31)

    def run(lanes):
        log = tmp_path_factory.mktemp(f"logs_vid{lanes}")
        c = get_config(
            "RefVSR_MFID", mode="tinyvid", is_train=False,
            data_offset=str(root), log_offset=str(log),
            batch_size=1, frame_num=3, frame_itr_num=2,
            num_blocks=2, mid_channels=8, reset_branch=2,
            loss="1*L1", thread_num=0, pipeline_lanes=lanes)
        c = set_data_path(c, is_train=False)
        c.EVAL.quantitative_only = True
        # skip the MIDDLE video: its frames arrive between video 0's last
        # submit and video 2's first — exactly the racy window
        c.EVAL.vid_name = ["0010", "0012"]
        res = eval_qual_quan(c)
        files = glob.glob(os.path.join(c.result_dir, "**", "score_*.txt"),
                          recursive=True)
        assert len(files) == 1, files
        with open(files[0]) as f:
            lines = [re.sub(r"\([0-9.]+sec\)", "(Xsec)", ln.rstrip())
                     for ln in f]
        return res, lines

    res_plain, lines_plain = run(0)
    res_piped, lines_piped = run(2)
    assert res_piped["frames"] == res_plain["frames"] == 16
    assert len(lines_plain) == len(lines_piped)
    for lp, lq in zip(lines_plain, lines_piped):
        # PSNR digits can wobble in the last decimal between graphs; the
        # MEAN denominators (the advisor's finding) shift values by >0.2 dB
        if lp != lq:
            nums_p = [float(x) for x in re.findall(r"\d+\.\d+", lp)]
            nums_q = [float(x) for x in re.findall(r"\d+\.\d+", lq)]
            np.testing.assert_allclose(nums_q, nums_p, atol=2e-3)
            assert re.sub(r"\d+\.\d+", "F", lp) == re.sub(r"\d+\.\d+", "F", lq)


def test_lanes_gt2_with_reset_rejected(setup):
    net = tiny_net(pipeline_lanes=4)
    ef, es = _fns(net)
    ep, epp = _pipe_fns(net)
    with pytest.raises(NotImplementedError):
        StreamRunner(net, setup, 4, ef, es, eval_prime=ep,
                     eval_pipelined=epp, pipeline_lanes=4)
