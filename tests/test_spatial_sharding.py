"""Shard-local gather parity (parallel/spatial.py): the halo-exchange warp,
affine gather, and sharded matching argmax must match their single-device
counterparts bit-for-bit within the halo bound, and the compiled warp program
must contain NO all-gather (the round-1 HLO showed GSPMD all-gathering every
gather canvas — docs/ROUND1_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from refvsr_tpu.parallel.mesh import make_mesh
from refvsr_tpu.parallel.spatial import spatial_sharding


@pytest.fixture(scope="module")
def smesh():
    return make_mesh(n_data=1, n_spatial=8, devices=jax.devices()[:8])


def _shard(mesh, x, axis):
    spec = P(*[None] * axis, "spatial", *[None] * (x.ndim - axis - 1))
    return jax.device_put(x, NamedSharding(mesh, spec))


def test_sharded_warp_parity_zeros(smesh, rng):
    from refvsr_tpu.ops.warp import warp
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 8)).astype(np.float32))
    # flows bounded well inside the halo (the exactness condition)
    flow = jnp.asarray(
        (rng.uniform(-1.5, 1.5, (1, 64, 16, 2))).astype(np.float32))
    want = warp(x, flow)
    with spatial_sharding(smesh, halo=4):
        got = jax.jit(warp)(_shard(smesh, x, 1), _shard(smesh, flow, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sharded_warp_parity_2x_grid(smesh, rng):
    """The UP warp: 1x source, 2x output grid (RefVSR.py:220,254)."""
    from refvsr_tpu.ops.warp import warp
    x = jnp.asarray(rng.standard_normal((1, 32, 8, 4)).astype(np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((1, 64, 16, 2)) * 1.0).astype(np.float32))
    want = warp(x, flow)
    with spatial_sharding(smesh, halo=4):
        got = jax.jit(warp)(_shard(smesh, x, 1), _shard(smesh, flow, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sharded_flow_warp_parity_border(smesh, rng):
    from refvsr_tpu.ops.warp import flow_warp
    x = jnp.asarray(rng.standard_normal((1, 64, 16, 4)).astype(np.float32))
    flow = jnp.asarray(
        (rng.uniform(-1.5, 1.5, (1, 64, 16, 2))).astype(np.float32))
    want = flow_warp(x, flow)
    with spatial_sharding(smesh, halo=4):
        got = jax.jit(flow_warp)(_shard(smesh, x, 1), _shard(smesh, flow, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sharded_affine_gather_parity(smesh, rng):
    """Clamped-corner affine gather, incl. the reflect rows at global edges
    and boundary clamp collapses."""
    from refvsr_tpu.models.matching import affine_bilinear_gather
    from refvsr_tpu.parallel.spatial import (SpatialCtx,
                                             sharded_affine_gather)
    n, hx, wx, c = 1, 64, 16, 4
    pad = 1
    x = jnp.asarray(rng.standard_normal((n, hx, wx, c)).astype(np.float32))
    # taps: per-block anchors + bounded offsets (incl. some clamping at edges)
    gh, gw, ntaps = 16, 4, 9
    anchors = (np.arange(gh) * (hx // gh))[None, :, None, None]
    p_row = (anchors + rng.uniform(-4.0, 4.0, (n, gh, gw, ntaps)))
    p_col = rng.random((n, gh, gw, ntaps)) * (wx + 2 * pad - 1)
    p_row[0, 0, 0, 0] = -2.0          # clamps to padded row 0 (reflect row)
    p_row[0, -1, 0, 1] = hx + 4.0     # clamps to padded bottom reflect row
    p_row = jnp.asarray(p_row.astype(np.float32))
    p_col = jnp.asarray(p_col.astype(np.float32))

    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    want = affine_bilinear_gather(xp, p_row, p_col)

    ctx = SpatialCtx(smesh, halo=8)
    got = jax.jit(lambda a, b, d: sharded_affine_gather(a, pad, b, d, ctx))(
        _shard(smesh, x, 1), _shard(smesh, p_row, 1), _shard(smesh, p_col, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_sharded_argmax_parity(smesh, rng):
    from refvsr_tpu.models.matching import tiled_argmax_matmul, _l2_normalize
    from refvsr_tpu.parallel.spatial import SpatialCtx, sharded_argmax_matmul
    ref_p = _l2_normalize(jnp.asarray(
        rng.standard_normal((2, 40, 12)).astype(np.float32)), axis=2)
    lr_p = _l2_normalize(jnp.asarray(
        rng.standard_normal((2, 64, 12)).astype(np.float32)), axis=2)
    want_c, want_i = tiled_argmax_matmul(ref_p, lr_p)
    ctx = SpatialCtx(smesh, halo=4)
    got_c, got_i = jax.jit(
        lambda r, l: sharded_argmax_matmul(r, l, ctx, use_pallas=False))(
            ref_p, _shard(smesh, lr_p, 1))
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_sharded_warp_hlo_has_no_allgather(smesh, rng):
    """Round-1 failure mode: GSPMD all-gathered the warp canvas. The sharded
    warp program must lower to collective-permutes only."""
    from refvsr_tpu.ops.warp import warp
    x = jnp.zeros((1, 64, 16, 8), jnp.float32)
    flow = jnp.zeros((1, 64, 16, 2), jnp.float32)
    x_sh = _shard(smesh, x, 1)
    f_sh = _shard(smesh, flow, 1)
    with spatial_sharding(smesh, halo=4):
        lowered = jax.jit(warp).lower(x_sh, f_sh)
    txt = lowered.compile().as_text()
    assert "all-gather" not in txt, "warp canvas is being all-gathered"
    assert "collective-permute" in txt  # the halo exchange

    # control: without the ctx the same program DOES all-gather
    txt_plain = jax.jit(warp).lower(x_sh, f_sh).compile().as_text()
    assert "all-gather" in txt_plain
