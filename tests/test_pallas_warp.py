"""Pallas banded-warp kernel parity (interpreter mode on CPU).

The kernel (ops/pallas/warp_kernel.py) must match ops/warp._bilinear_sample
(padding='zeros' — grid_sample align_corners=False zeros semantics,
/root/reference/models/utils.py:35-43) exactly on live pixels, trip its
exactness guard on violent flows, and carry correct gradients through the
custom_vjp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refvsr_tpu.ops.pallas.warp_kernel import _pallas_warp, pallas_warp_zeros
from refvsr_tpu.ops.warp import _bilinear_sample_quad, warp, warp_coords


def _smooth_flow(key, n, h, w, mag=12.0, grad=0.015):
    k1, k2, _ = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n, 1, 1, 2), minval=-mag, maxval=mag)
    coarse = jax.random.uniform(k2, (n, 8, 8, 2), minval=-1.0, maxval=1.0)
    sm = jax.image.resize(coarse, (n, h, w, 2), "bilinear")
    return (base + sm * (grad * min(h, w))).astype(jnp.float32)


@pytest.mark.parametrize("h,w,c,mag", [
    (40, 56, 8, 6.0),        # single tile
    (64, 96, 16, 20.0),      # heavy out-of-bounds masking
    (41, 57, 3, 30.0),       # non-tile-aligned output padding
    (48, 300, 8, 10.0),      # multiple tiles per row
])
def test_parity_vs_quad(h, w, c, mag):
    key = jax.random.fold_in(jax.random.PRNGKey(0), h)
    kx, kf = jax.random.split(key)
    x = jax.random.uniform(kx, (1, h, w, c), jnp.float32)
    flow = _smooth_flow(kf, 1, h, w, mag=mag, grad=0.01)
    sx, sy = warp_coords(x.shape[1:3], flow)
    got, ok = _pallas_warp(x, sx, sy, interpret=True)
    assert bool(ok), "smooth flow must not trip the guard"
    np.testing.assert_allclose(np.asarray(got), np.asarray(warp(x, flow)),
                               atol=2e-5)


def test_edge_up_left_flow_stays_exact():
    """Uniform up-left flow at image edges: anchors go negative into the
    kernel's top/left zero padding instead of clamping — the guard must NOT
    trip (a clamped-anchor formulation falls back on every edge tile)."""
    key = jax.random.PRNGKey(1)
    h, w, c = 32, 400, 4
    x = jax.random.uniform(key, (1, h, w, c), jnp.float32)
    flow = jnp.full((1, h, w, 2), -3.7, jnp.float32)
    sx, sy = warp_coords((h, w), flow)
    got, ok = _pallas_warp(x, sx, sy, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(warp(x, flow)),
                               atol=2e-5)


def test_guard_trips_and_cond_falls_back():
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (1, 64, 96, 8), jnp.float32)
    sx = jax.random.uniform(key, (1, 64, 96), minval=-40, maxval=90)
    sy = jax.random.uniform(jax.random.fold_in(key, 1), (1, 64, 96),
                            minval=-40, maxval=60)
    _, ok = _pallas_warp(x, sx, sy, interpret=True)
    assert not bool(ok), "violent flow should invalidate the band"
    out = pallas_warp_zeros(x, sx, sy, True)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_bilinear_sample_quad(x, sx, sy, "zeros")), atol=2e-5)


def test_vjp_matches_quad():
    key = jax.random.PRNGKey(3)
    h, w, c = 24, 48, 6
    x = jax.random.uniform(key, (1, h, w, c), jnp.float32)
    flow = _smooth_flow(jax.random.fold_in(key, 1), 1, h, w, mag=4.0)
    sx, sy = warp_coords((h, w), flow)

    g = jax.grad(lambda v: jnp.sum(pallas_warp_zeros(v, sx, sy, True) ** 2))(x)
    gq = jax.grad(lambda v: jnp.sum(
        _bilinear_sample_quad(v, sx, sy, "zeros") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gq), atol=2e-5)
