"""Pallas VMEM-select banded warp (ops/pallas/warp_select.py) parity.

Runs the kernel in interpreter mode on the CPU backend. Contract mirrors
tests/test_banded_warp.py: bit-compatible with ops/warp's samplers (up to
f32 reassociation; bf16 — the production dtype — must be bit-exact), and
the coordinate-only plan must *report* invalidity, never mis-sample, when
a tile's flow spread exceeds the static select window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refvsr_tpu.ops.pallas.warp_select as ws
from refvsr_tpu.ops.warp import _bilinear_sample_lean


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ws, "_FORCE_INTERPRET", True)


def _budget_flow(rng, n, ho, wo, shift=(3.7, -2.3)):
    """Smooth flow inside the select budget (y spread < 2 px per 16 rows,
    x spread < 4 px per 128 cols), with a global shift that pushes border
    samples out of bounds (dead-point coverage)."""
    gy, gx = np.meshgrid(np.arange(ho, dtype=np.float32),
                         np.arange(wo, dtype=np.float32), indexing="ij")
    fy = shift[0] + 0.7 * np.sin(gy / 40.0) + rng.normal(0, .02, (n, ho, wo))
    fx = shift[1] + 1.2 * np.cos(gx / 80.0) + rng.normal(0, .02, (n, ho, wo))
    sy = jnp.asarray(gy[None] + fy, jnp.float32)
    sx = jnp.asarray(gx[None] + fx, jnp.float32)
    return sy, sx


@pytest.mark.parametrize("dt,exact", [(jnp.float32, False),
                                      (jnp.bfloat16, True)])
@pytest.mark.parametrize("n,h,w,c,ho,wo", [(1, 40, 140, 5, 37, 130),
                                           (2, 33, 131, 3, 33, 131)])
def test_matches_lean_sampler(rng, dt, exact, n, h, w, c, ho, wo):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dt)
    sy, sx = _budget_flow(rng, n, ho, wo)
    assert bool(ws.pallas_banded_ok(x.shape, sy, sx))
    got = ws.pallas_banded_sample(x, sy, sx)
    want = _bilinear_sample_lean(x, sx, sy, "zeros")
    assert got.shape == (n, ho, wo, c) and got.dtype == dt
    if exact:
        assert bool(jnp.all(got == want))
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_plan_rejects_violent_and_scaled_flows(rng):
    x_shape = (1, 64, 160, 4)
    gy, gx = np.meshgrid(np.arange(48, dtype=np.float32),
                         np.arange(160, dtype=np.float32), indexing="ij")
    wild = rng.uniform(-40, 40, (2, 1, 48, 160)).astype(np.float32)
    assert not bool(ws.pallas_banded_ok(
        x_shape, jnp.asarray(gy[None] + wild[0]),
        jnp.asarray(gx[None] + wild[1])))
    # 0.5x downscale grid: intra-tile source spread is ~half the tile
    # extent, far beyond the window — must report invalid, not mis-sample
    assert not bool(ws.pallas_banded_ok(
        x_shape, jnp.asarray(gy[None]), jnp.asarray(gx[None] * 0.5)))


def test_batched_no_cross_item_reads(rng):
    """Each batch item must match its own n=1 sample (the flat row table
    folds items with per-item row offsets)."""
    n, h, w, c = 3, 40, 140, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    sy, sx = _budget_flow(rng, n, 37, 130)
    assert bool(ws.pallas_banded_ok(x.shape, sy, sx))
    got = ws.pallas_banded_sample(x, sy, sx)
    for i in range(n):
        want = ws.pallas_banded_sample(x[i:i + 1], sy[i:i + 1], sx[i:i + 1])
        np.testing.assert_array_equal(np.asarray(got[i:i + 1]),
                                      np.asarray(want))


def test_nonfinite_flow_zeros_not_nan(rng):
    """NaN coords make points dead; outputs there must be EXACT zeros (the
    weight-only masking would propagate NaN*0)."""
    n, h, w, c = 1, 40, 140, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    sy, sx = _budget_flow(rng, n, 32, 128)
    sy = sy.at[0, 5:9, 7:40].set(jnp.nan)
    sx = sx.at[0, 20:23, 60:90].set(jnp.inf)
    got = ws.pallas_banded_sample(x, sy, sx)
    want = _bilinear_sample_lean(x, sx, sy, "zeros")
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert float(jnp.abs(got[0, 5:9, 7:40]).max()) == 0.0


def test_custom_vjp_matches_lean_grads(rng):
    """Training never reaches the kernel (pixel threshold), but the op must
    stay differentiable: the custom VJP pulls back through the lean XLA
    sampler with identical semantics."""
    n, h, w, c = 1, 36, 132, 3
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    sy, sx = _budget_flow(rng, n, 33, 129, shift=(0.4, -0.6))

    def loss_k(x, sy, sx):
        return jnp.sum(ws.pallas_banded_sample(x, sy, sx) ** 2)

    def loss_l(x, sy, sx):
        return jnp.sum(_bilinear_sample_lean(x, sx, sy, "zeros") ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, sy, sx)
    gl = jax.grad(loss_l, argnums=(0, 1, 2))(x, sy, sx)
    for a, b in zip(gk, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
