"""Pallas fused conv kernels (interpret mode) vs the XLA reference:
exact 'same'-padding semantics at tile borders, odd sizes, both activations,
and the custom_vjp backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refvsr_tpu.ops.pallas.conv_kernel as ck


@pytest.fixture
def small_tiles(monkeypatch):
    # force rows=8 so multi-tile paths (incl. ragged last tile) are exercised
    monkeypatch.setattr(ck, "_pick_rows", lambda *a, **k: 8)


@pytest.mark.parametrize("h,w,c,o,k,slope", [
    (24, 40, 8, 16, 3, 1.0),
    (21, 40, 8, 8, 3, 0.2),    # ragged last tile
    (16, 40, 8, 8, 5, 0.1),    # 5x5
    (8, 40, 8, 8, 3, 0.0),     # single tile
])
def test_fused_conv_matches_xla(small_tiles, h, w, c, o, k, slope, rng):
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, k, c, o)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    ref = ck._xla_single(x, kern, bias, slope)
    got = ck.fused_conv3x3(x, kern, bias, slope, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,c,k,slope,scale", [
    (24, 40, 8, 3, 0.0, 1.0),
    (19, 40, 8, 3, 0.2, 1.0),   # ragged; lrelu (ResBlock)
    (16, 40, 8, 5, 0.2, 0.5),   # 5x5, res_scale
])
def test_fused_resblock_matches_xla(small_tiles, h, w, c, k, slope, scale,
                                    rng):
    x = jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((k, k, c, c)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((k, k, c, c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = ck._xla_resblock(x, k1, b1, k2, b2, slope, scale)
    got = ck.fused_resblock(x, k1, b1, k2, b2, slope, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_resblock_grad_matches_xla(small_tiles, rng):
    x = jnp.asarray(rng.standard_normal((1, 12, 16, 4)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((4,)), jnp.float32)

    def loss_fused(x, k1, b1, k2, b2):
        return jnp.sum(ck.fused_resblock(x, k1, b1, k2, b2, 0.2, 1.0, True)
                       ** 2)

    def loss_ref(x, k1, b1, k2, b2):
        return jnp.sum(ck._xla_resblock(x, k1, b1, k2, b2, 0.2, 1.0) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
