#!/usr/bin/env python
"""Benchmark: steady-state streaming-inference throughput of the flagship
RefVSR_MFID_8K model (HD input -> 4x SR toward 8K) on the available TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 30 (the BASELINE.md north star: >30 fps 4x 8K
streaming on a v5e-8 — this round benches a single chip).

The full 8K output path needs ~10+ GB HBM in bf16; if the chip OOMs we fall
back to progressively smaller tiles and report the fps normalized to 8K pixel
throughput (pixels/s / 8K-frame pixels) so rounds stay comparable."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_stream(h, w, frame_num=7, num_blocks=30, mid_channels=48,
                 iters=8, warmup=2, lanes=0):
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state

    dtype = jnp.bfloat16
    net = RefVSRNet(scale=4, num_blocks=num_blocks, mid_channels=mid_channels,
                    matching_ksize=8, flag_HD_in=True, pipeline_lanes=lanes)
    key = jax.random.PRNGKey(0)
    n, t = 1, frame_num
    lrs = jax.random.uniform(key, (n, t, h, w, 3), dtype)
    refs = jax.random.uniform(key, (n, t, h, w, 3), dtype)
    state = init_stream_state(n, h, w, mid_channels, dtype,
                              num_frames=frame_num)

    # init on small spatial dims to keep init fast, reuse param tree shapes
    # init in f32 (initializers emit f32; mixed dtypes break scan carries),
    # then cast the whole param tree to the bench compute dtype.
    si = 64
    lrs_i = jax.random.uniform(key, (n, t, si, si * 2, 3), jnp.float32)
    refs_i = jax.random.uniform(key, (n, t, si, si * 2, 3), jnp.float32)
    params = net.init(key, lrs_i, refs_i,
                      init_stream_state(n, si, si * 2, mid_channels,
                                        num_frames=frame_num))
    from refvsr_tpu.utils.precision import cast_floating
    params = cast_floating(params, dtype)

    import functools

    # give the state warm-shaped matching caches so the timed loop runs the
    # production streaming graph (one fresh matching/frame); zero values are
    # fine — the cache is fully real after t - t//2 steps, and compiling
    # forward_first at this size just to warm it would double compile time
    tt = (t - t // 2) + max(0, lanes - 1)
    state = state.replace(
        conf_tail=jnp.zeros((n, tt, h, w, 1), dtype),
        index_tail=jnp.zeros((n, tt, (h // 4) * (w // 4)), jnp.int32),
        aligned_tail=jnp.zeros((n, tt, h, w, mid_channels), dtype),
        aligned_up_tail=jnp.zeros((n, tt, 2 * h, 2 * w, mid_channels),
                                  dtype),
        tail_base=jnp.zeros((), jnp.int32))
    if lanes > 1:
        # pipelined steady state: L-1 in-flight lane carries ride the state;
        # one steady dispatch emits one frame, so fps = 1/dispatch_time
        ext = lanes - 1
        state = state.replace(
            pipe_feat=jnp.zeros((ext * n, h, w, mid_channels), dtype),
            pipe_feat_up=jnp.zeros((ext * n, 2 * h, 2 * w, mid_channels),
                                   dtype),
            pipe_conf=jnp.zeros((ext * n, h, w, 1), dtype))
    fwd = (RefVSRNet.forward_stream_pipelined if lanes > 1
           else RefVSRNet.forward_stream)

    @functools.partial(jax.jit, donate_argnums=(3, 4))
    def step(params, lrs, refs, state, acc):
        out, new_state, _ = net.apply(params, lrs, refs, state, method=fwd)
        # fold the full output into a carried scalar: the recurrent state only
        # depends on the cheap forward step, so without this the backward
        # branch of every non-final iteration would be dead-code-eliminated.
        return out, new_state, acc + jnp.mean(out.astype(jnp.float32))

    # NOTE on sync: on the tunneled axon backend block_until_ready() returns
    # before execution finishes, so we force a device->host scalar transfer —
    # once, after the timed loop, amortizing the tunnel round-trip.
    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        out, state, acc = step(params, lrs, refs, state, acc)
    float(acc)

    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, state, acc = step(params, lrs, refs, state, acc)
    assert np.isfinite(float(acc))  # host sync: waits for the full chain
    dt = (time.perf_counter() - t0) / iters

    # bench-scale numerics gate: after `iters` streamed windows the SR frame
    # must be finite and non-degenerate (std>0 catches an all-zero/constant
    # graph that isfinite alone would pass), and every float leaf of the
    # carried stream state must still be finite. Computed on device; only
    # scalars cross the tunnel.
    of = out.astype(jnp.float32)
    out_finite = bool(jnp.all(jnp.isfinite(of)))
    out_std = float(jnp.std(of))
    state_finite = all(
        bool(jnp.all(jnp.isfinite(leaf)))
        for leaf in jax.tree_util.tree_leaves(state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating))
    assert out_finite, "bench output contains non-finite values"
    assert out_std > 0.0, "bench output is degenerate (zero std)"
    assert state_finite, (
        f"stream state non-finite after {iters + warmup} windows")
    return 1.0 / dt, out.shape


def bench_train(patch=64, batch=1, frame_num=7, windows=3, iters=4,
                num_blocks=30, mid_channels=48):
    """Training throughput: optimizer steps/s on the flagship RefVSR_MFID
    recipe (full loss incl. MFID contextual terms, patch 64, T=7 —
    configs/config_RefVSR_MFID.py protocol; reference hot loop
    trainers/trainer.py:158-188). `windows` caps frame_itr_num so the
    compile count stays bounded through the tunnel; steps/s is averaged
    over all window positions of `iters` batches."""
    import jax
    _enable_compile_cache()
    import numpy as np

    from refvsr_tpu.configs import get_config
    from refvsr_tpu.train.trainer import Trainer

    cfg = get_config("RefVSR_MFID", is_train=True, num_blocks=num_blocks,
                     mid_channels=mid_channels, frame_num=frame_num,
                     frame_itr_num=windows, patch_size=patch,
                     batch_size=batch, spynet_ckpt=None, vgg19_ckpt=None)
    trainer = Trainer(cfg)
    t_total = frame_num + windows - 1
    rng = np.random.default_rng(0)

    def img(*s):
        return rng.random(s, dtype=np.float32)

    batch_d = {
        "LR_UW": img(batch, t_total, patch, patch, 3),
        "LR_REF_W": img(batch, t_total, 2 * patch, 2 * patch, 3),
        "HR_UW": img(batch, t_total, 4 * patch, 4 * patch, 3),
        "HR_REF_W": img(batch, t_total, 4 * patch, 4 * patch, 3),
        "HR_REF_T": img(batch, t_total, 4 * patch, 4 * patch, 3),
    }
    ts, loss_params = trainer.init_state(batch_d)
    ts, errs, _ = trainer.iteration(ts, loss_params, batch_d)  # compile
    assert np.isfinite(errs["total"]), errs
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, errs, _ = trainer.iteration(ts, loss_params, batch_d)
    assert np.isfinite(errs["total"]), errs
    dt = (time.perf_counter() - t0) / (iters * windows)
    return 1.0 / dt


def _run_one(h, w, lanes=0):
    fps, out_shape = bench_stream(h, w, lanes=lanes)
    target_out_pixels = 4320 * 7680
    out_pixels = out_shape[1] * out_shape[2]
    fps_8k_equiv = fps * out_pixels / target_out_pixels
    full_8k = out_pixels == target_out_pixels
    from refvsr_tpu.ops.warp import _use_pallas_warp
    return {
        "metric": "stream_fps_8k" if full_8k else "stream_fps_8k_equiv",
        "value": round(fps if full_8k else fps_8k_equiv, 4),
        "unit": "fps",
        "vs_baseline": round((fps if full_8k else fps_8k_equiv) / 30.0, 4),
        "raw_fps": round(fps, 4),
        "out_shape": list(out_shape),
        # ADVICE r4: make the active warp path auditable — a backend-name
        # mismatch must not silently bench the XLA path as "Pallas".
        "pallas_warp": bool(_use_pallas_warp()),
        "lanes": lanes,
    }


_LAST_GOOD = "/root/repo/.bench_last_good.json"


def _load_last_good():
    try:
        with open(_LAST_GOOD) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    # HD-in requires H,W divisible by 8 (aa1 kernel = matching_ksize//2 = 4 on
    # the half-res grid); 1080/8=135 exactly as in the reference's HD protocol.
    sizes = [(1080, 1920), (544, 960), (272, 480)]
    if len(sys.argv) >= 3 and sys.argv[1] == "--size":
        h, w = (int(v) for v in sys.argv[2].split("x"))
        lanes = int(sys.argv[4]) if len(sys.argv) == 5 else 0
        print(json.dumps(_run_one(h, w, lanes=lanes)))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--train":
        # patch fallback: the flagship patch-64 train-step compile has
        # SIGKILLed the remote compile helper (r4, r5 leg 4 — helper OOM on
        # the windowed-scan + MFID + backward program), while patch 48/32
        # compile and run (r5: 3.17 / 2.91 steps/s). Walk down until one
        # lands; the record says which geometry the number belongs to.
        # (64,1) first: the flagship geometry, one window position = one
        # compiled step (r5 chip: 1.94 steps/s; windows=3 triples the
        # compile count for the same per-step rate)
        for patch, windows in ((64, 1), (48, 1), (32, 1)):
            try:
                # iters=4: at iters=2 the tunneled dispatch latency dominated
                # (r5 measured 1.94 vs 0.73 steps/s run-to-run)
                sps = bench_train(patch=patch, windows=windows, iters=4)
                print(json.dumps({"train_steps_per_s": round(sps, 4),
                                  "train_patch": patch,
                                  "train_windows": windows}))
                return
            except Exception as e:
                print(f"# train bench patch={patch} windows={windows} "
                      f"failed: {str(e).splitlines()[0][:120]}",
                      file=sys.stderr)
        print(json.dumps({"train_steps_per_s": None}))
        return

    # ---- budgeted driver mode (VERDICT r4 #1) -----------------------------
    # Two consecutive rounds produced NO driver-parsed number (r3: attach
    # failure after long retries; r4: rc=124 — the 40-min train leg ran FIRST
    # and ate the driver's wall-clock before any stream leg printed). The
    # driver's own timeout is outside our control, so this process enforces a
    # 35-min internal budget, runs the legs most likely to succeed (warm
    # .jax_cache stream step) FIRST, and prints a best-so-far record after
    # EVERY completed leg — whichever JSON line the driver parses (first or
    # last) is a real measurement.
    import os
    import signal
    import subprocess
    import tempfile

    t0 = time.time()
    BUDGET = 35 * 60.0

    def remaining():
        return BUDGET - (time.time() - t0)

    def run_sub(argv, timeout):
        """Run a subprocess with a HARD timeout that cannot hang.

        subprocess.run(capture_output=True, timeout=...) deadlocks here: the
        axon tunnel spawns helper grandchildren that inherit the stdout pipe,
        so after the timeout-kill of the direct child the pipe still has
        writers and the post-kill read blocks forever (observed: a 2x150s
        preflight pinned a 10-min wrapper; r4's rc=124 looked the same).
        Fix: output to a FILE (no pipe to drain) + start_new_session so the
        timeout kills the whole process group. Returns (rc|None, text)."""
        with tempfile.TemporaryFile(mode="w+") as f:
            p = subprocess.Popen(argv, stdout=f, stderr=f, text=True,
                                 start_new_session=True)
            try:
                rc = p.wait(timeout)
            except subprocess.TimeoutExpired:
                rc = None
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
                try:
                    p.wait(15)
                except subprocess.TimeoutExpired:
                    pass  # unreapable child; the file still has its output
            f.seek(0)
            return rc, f.read()

    # preflight: a dead axon tunnel makes jax.devices() hang forever (seen
    # as a multi-hour pool outage). 2 tries max (r4 burned 20 min on 8).
    attach_ok = False
    for _ in range(2):
        _, out = run_sub(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jax.devices(); "
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"],
            timeout=150)
        if "512" in out:
            attach_ok = True
            break
        print("# bench preflight: TPU attach failed, retrying",
              file=sys.stderr)
    if not attach_ok:
        rec = {"metric": "stream_fps_8k", "value": 0.0, "unit": "fps",
               "vs_baseline": 0.0, "error": "TPU attach failed (tunnel down)"}
        last = _load_last_good()
        if last:
            rec["last_good"] = last
        print(json.dumps(rec))
        return

    best = None

    def emit(rec):
        print(json.dumps(rec), flush=True)
        try:
            with open(_LAST_GOOD, "w") as f:
                json.dump(rec, f)
        except Exception:
            pass

    def run_leg(argv, timeout, log):
        """Run a bench leg in a subprocess; return its parsed JSON or None."""
        rc, out = run_sub([sys.executable, __file__] + argv, timeout)
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        # persist the FULL output so the real exception is never lost
        # (round-2 postmortem: 200-char stderr tails destroyed the error)
        with open(log, "w") as f:
            f.write(f"rc={rc} (None = killed at {timeout}s)\n"
                    f"== output ==\n{out}\n")
        return None

    # stream legs FIRST: the streaming step's compiled graph is in the
    # committed-on-disk .jax_cache from the builder's own chip runs, so the
    # flagship 1080p leg is minutes, not the 30-min cold compile. Smaller
    # sizes only run as fallback if the flagship leg failed.
    err = "no stream leg succeeded"
    for h, w in sizes:
        if remaining() < 240:
            err = "budget exhausted before stream leg"
            break
        log = f"/root/repo/.bench_fail_{h}x{w}.log"
        leg_t = min(remaining() - 120, 2400)
        rec = run_leg(["--size", f"{h}x{w}"], leg_t, log)
        if rec is not None:
            best = rec
            emit(best)  # a real number is on stdout from this point on
            break
        err = f"stream {h}x{w} failed (see {log})"
        print(f"# bench at {h}x{w} failed", file=sys.stderr)

    # training throughput leg LAST (r4: its remote compile was SIGKILLed
    # after ~40 min; it must never gate the stream number again). Merged into
    # the main record as an extra field so the driver's one-line contract
    # holds.
    if remaining() > 300:
        tr = run_leg(["--train"], remaining() - 60,
                     "/root/repo/.bench_fail_train.log")
        if tr and tr.get("train_steps_per_s") is not None:
            if best is None:
                best = {"metric": "train_only", "value": 0.0, "unit": "fps",
                        "vs_baseline": 0.0}
            for k in ("train_steps_per_s", "train_patch", "train_windows"):
                if k in tr:
                    best[k] = tr[k]
            emit(best)
        else:
            print("# train bench failed (see .bench_fail_train.log)",
                  file=sys.stderr)

    if best is None:
        rec = {"metric": "stream_fps_8k", "value": 0.0, "unit": "fps",
               "vs_baseline": 0.0, "error": err}
        last = _load_last_good()
        if last:
            rec["last_good"] = last
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
