"""Banded bilinear warp (ops/warp_banded.py) parity vs the quad-canvas path.

The banded formulation must be bit-compatible (up to f32 reassociation) with
ops/warp._bilinear_sample for smooth flows, and must *report* invalidity —
never silently mis-sample — when a tile's flow range exceeds its static
select window. Also covers the warp() integration (banded is the DEFAULT
branch above _BANDED_MIN_PIXELS): output must be identical to the quad path
for smooth flows (cond picks the banded branch) and still correct (fallback
branch) for violent flows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# refvsr_tpu.ops re-exports the warp *function*, shadowing the submodule
# attribute — fetch the module from sys.modules for monkeypatching
import sys

from refvsr_tpu.ops.warp import warp

warp_mod = sys.modules["refvsr_tpu.ops.warp"]
from refvsr_tpu.ops.warp_banded import banded_sample


def _smooth_flow(key, h, w, mag):
    k1, k2 = jax.random.split(key)
    base = jax.random.uniform(k1, (1, 1, 1, 2), minval=-mag, maxval=mag)
    coarse = jax.random.uniform(k2, (1, 8, 8, 2), minval=-1.0, maxval=1.0)
    sm = jax.image.resize(coarse, (1, h, w, 2), "bilinear")
    return (base + sm * 0.01 * min(h, w)).astype(jnp.float32)


@pytest.mark.parametrize("h,w,c,mag", [(40, 56, 8, 6.0), (41, 57, 3, 30.0),
                                       (64, 96, 16, 20.0)])
def test_banded_matches_quad(rng, h, w, c, mag):
    key = jax.random.PRNGKey(h * 1000 + w)
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (1, h, w, c), jnp.float32)
    flow = _smooth_flow(kf, h, w, mag)
    want = warp(x, flow)

    from refvsr_tpu.ops.warp import warp_coords
    sx, sy = warp_coords((h, w), flow)

    got, ok = banded_sample(x, sy, sx)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_banded_batched_matches_quad():
    """n>1 folds the batch into the tile axis (flat-table row offsets);
    every item must match its own n=1 quad warp — no cross-item reads."""
    key = jax.random.PRNGKey(21)
    n, h, w, c = 3, 40, 56, 8
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (n, h, w, c), jnp.float32)
    # per-item distinct flows, incl. one pushing samples out of bounds
    flows = jnp.stack([_smooth_flow(jax.random.fold_in(kf, i), h, w,
                                    mag=6.0 + 8.0 * i)[0] for i in range(n)])
    from refvsr_tpu.ops.warp import warp_coords
    sx, sy = warp_coords((h, w), flows)
    got, ok = banded_sample(x, sy, sx)
    assert bool(ok)
    for i in range(n):
        want = warp(x[i:i + 1], flows[i:i + 1])
        np.testing.assert_allclose(np.asarray(got[i:i + 1]),
                                   np.asarray(want), atol=2e-5)


def test_batch_split_matches_batched(monkeypatch):
    """Above _BATCH_SPLIT_BYTES a batched warp processes items one at a time
    via lax.map (ops/warp.py) — outputs must equal the whole-batch path."""
    key = jax.random.PRNGKey(31)
    n, h, w, c = 3, 40, 56, 8
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (n, h, w, c), jnp.float32)
    flows = jnp.stack([_smooth_flow(jax.random.fold_in(kf, i), h, w,
                                    mag=6.0 + 8.0 * i)[0] for i in range(n)])
    want = warp(x, flows)
    monkeypatch.setattr(warp_mod, "_BATCH_SPLIT_BYTES", 1)
    got = warp(x, flows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # and with the banded gate open too (split outer, banded inner)
    monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 0)
    got_b = warp(x, flows)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want),
                               atol=2e-5)


def test_banded_invalidates_on_violent_flow():
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (1, 64, 96, 4), jnp.float32)
    wild = jax.random.uniform(key, (1, 64, 96, 2), minval=-40.0, maxval=40.0)
    gy, gx = np.meshgrid(np.arange(64, dtype=np.float32),
                         np.arange(96, dtype=np.float32), indexing="ij")
    _, ok = banded_sample(x, gy[None] + wild[..., 1], gx[None] + wild[..., 0])
    assert not bool(ok)


def test_warp_gate_integration(monkeypatch):
    """Banded-default warp() must match the quad-path output for both a
    smooth flow (banded branch taken) and a violent flow (cond fallback).
    The 48x64 shape sits below _BANDED_MIN_PIXELS, so the unpatched calls
    are the pure quad baseline."""
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, 48, 64, 8), jnp.float32)
    smooth = _smooth_flow(key, 48, 64, 8.0)
    wild = jax.random.uniform(key, (1, 48, 64, 2), minval=-30.0, maxval=30.0)

    want_s, want_w = warp(x, smooth), warp(x, wild)
    monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 0)
    np.testing.assert_allclose(np.asarray(warp(x, smooth)),
                               np.asarray(want_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(warp(x, wild)),
                               np.asarray(want_w), atol=2e-5)


@pytest.mark.slow
def test_stream_step_with_banded_gate(monkeypatch):
    """Full streaming step with the banded branch forced on (threshold
    dropped to 0) must reproduce the quad-path stream output exactly (the
    banded branch feeds every prop step's warps; smooth SPyNet-free flows
    keep it on the fast branch)."""
    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state

    net = RefVSRNet(scale=4, num_blocks=2, mid_channels=8, matching_ksize=8,
                    flag_HD_in=True, zero_flow=True)
    key = jax.random.PRNGKey(11)
    t, h, w = 7, 32, 48
    lrs = jax.random.uniform(key, (1, t, h, w, 3), jnp.float32)
    refs = jax.random.uniform(jax.random.fold_in(key, 1), (1, t, h, w, 3),
                              jnp.float32)
    state = init_stream_state(1, h, w, 8, num_frames=t)
    params = net.init(key, lrs, refs, state)

    def run():
        out1, st, _ = net.apply(params, lrs, refs,
                                method=RefVSRNet.forward_first)
        out2, _, _ = net.apply(params, lrs, refs, st,
                               method=RefVSRNet.forward_stream)
        return out1, out2

    want1, want2 = run()
    monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 0)
    got1, got2 = run()
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=3e-5)


def test_banded_nonfinite_flow_matches_quad():
    """A non-finite flow value (bf16 SPyNet overflow) must yield the quad
    path's exact 0 at that pixel — not NaN — with validity still True
    (the point is dead/masked, so no whole-call fallback is needed)."""
    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(key, (1, 48, 64, 8), jnp.float32)
    flow = _smooth_flow(key, 48, 64, 4.0)
    flow = flow.at[0, 10, 20, 0].set(jnp.inf)
    flow = flow.at[0, 30, 40, 1].set(jnp.nan)
    want = warp(x, flow)
    from refvsr_tpu.ops.warp import warp_coords
    sx, sy = warp_coords((48, 64), flow)
    got, ok = banded_sample(x, sy, sx)
    assert bool(ok)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_lean_sampler_matches_quad(rng, padding):
    """_bilinear_sample_lean (the canvas-free cond fallback, r4) must equal
    the quad-canvas path exactly — incl. far-OOB anchors, the one-step ring
    zone, and the 2x output grid."""
    from refvsr_tpu.ops.warp import (_bilinear_sample_lean,
                                     _bilinear_sample_quad)
    h, w, c = 37, 53, 5
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    sx = jnp.asarray(rng.uniform(-6, w + 6, (2, 2 * h, 2 * w)), jnp.float32)
    sy = jnp.asarray(rng.uniform(-6, h + 6, (2, 2 * h, 2 * w)), jnp.float32)
    want = _bilinear_sample_quad(x, sx, sy, padding)
    got = _bilinear_sample_lean(x, sx, sy, padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6, rtol=1e-6)


def test_lean_sampler_chunked_matches(rng, monkeypatch):
    from refvsr_tpu.ops.warp import (_bilinear_sample_lean,
                                     _bilinear_sample_quad)
    monkeypatch.setattr(warp_mod, "_WARP_CHUNK_PIXELS", 512)
    h, w, c = 24, 40, 3
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    sx = jnp.asarray(rng.uniform(-3, w + 3, (1, h, w)), jnp.float32)
    sy = jnp.asarray(rng.uniform(-3, h + 3, (1, h, w)), jnp.float32)
    want = _bilinear_sample_quad(x, sx, sy, "zeros")
    got = _bilinear_sample_lean(x, sx, sy, "zeros")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_banded_ok_plan_matches_exec(rng, padding):
    """banded_ok (the coordinate-only plan, r4) must return EXACTLY the ok
    scalar banded_sample computes — over smooth, violent, OOB-heavy, and
    non-finite flows — or the plan/exec cond split silently mis-samples."""
    from refvsr_tpu.ops.warp import warp_coords
    from refvsr_tpu.ops.warp_banded import banded_ok

    h, w, c = 40, 56, 8
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (2, h, w, c), jnp.float32)
    cases = [
        _smooth_flow(jax.random.PRNGKey(1), h, w, 4.0),
        _smooth_flow(jax.random.PRNGKey(2), h, w, 60.0),
        jax.random.uniform(jax.random.PRNGKey(3), (1, h, w, 2),
                           minval=-25.0, maxval=25.0),   # violent
        jnp.full((1, h, w, 2), 1e4, jnp.float32),        # all OOB
        jnp.zeros((1, h, w, 2)).at[0, 5, 5, 0].set(jnp.nan),
    ]
    for flow in cases:
        flow2 = jnp.concatenate([flow, flow * 0.5], axis=0)
        sx, sy = warp_coords((h, w), flow2)
        _, ok_exec = banded_sample(x, sy, sx, padding=padding)
        ok_plan = banded_ok(x.shape, sy, sx, padding=padding)
        assert bool(ok_plan) == bool(ok_exec)


def test_warp_dispatch_plan_exec_parity(rng, monkeypatch):
    """warp() through the plan/exec cond split == quad, for a smooth flow
    (banded branch) and a violent flow (lean fallback branch)."""
    monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 0)
    h, w, c = 40, 56, 8
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    for mag, name in ((4.0, "smooth"), (200.0, "violent")):
        flow = jnp.asarray(
            rng.uniform(-mag, mag, (1, h, w, 2)), jnp.float32)
        got = warp(x, flow)
        monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 1 << 40)
        want = warp(x, flow)
        monkeypatch.setattr(warp_mod, "_BANDED_MIN_PIXELS", 0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=name)
