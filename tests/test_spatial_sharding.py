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


@pytest.mark.parametrize("gh,ks", [(64, 2),   # grid rows divide shards
                                   (68, 2)])  # fractional: gh_loc=9, d=1
def test_sharded_affine_fold_parity(smesh, rng, gh, ks):
    """Replicated-coords affine fold (r4) == unsharded gather+fold, incl.
    the reflect rows at global edges, boundary clamp collapses, and the
    fractional-grid padded-chunk re-shard."""
    from refvsr_tpu.models.matching import affine_bilinear_gather
    from refvsr_tpu.parallel.spatial import maybe_sharded_affine_fold

    n, c, pad = 1, 4, 1
    gw = 6
    hx, wx = gh * ks, gw * ks
    x = jnp.asarray(rng.standard_normal((n, hx, wx, c)).astype(np.float32))
    ntaps = ks * ks
    # anchors at patch centers + bounded offsets (incl. edge clamping)
    anchors = (1.0 + np.arange(gh) * ks)[None, :, None, None]
    p_row = anchors + rng.uniform(-3.0, 3.0, (n, gh, gw, ntaps))
    p_col = (rng.random((n, gh, gw, ntaps)) * (wx + 2 * pad - 1))
    p_row[0, 0, 0, 0] = -2.0          # clamps to padded row 0 (reflect row)
    p_row[0, -1, 0, 1] = hx + 4.0     # clamps to padded bottom reflect row
    p_row = jnp.asarray(p_row.astype(np.float32))
    p_col = jnp.asarray(p_col.astype(np.float32))

    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    o = affine_bilinear_gather(xp, p_row, p_col)
    want = (np.asarray(o).reshape(n, gh, gw, ks, ks, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(n, hx, wx, c))

    with spatial_sharding(smesh, halo=8):
        got = jax.jit(
            lambda a, b, d: maybe_sharded_affine_fold(a, pad, b, d, ks,
                                                      min_halo=6)
        )(_shard(smesh, x, 1), p_row, p_col)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("h,stride", [(96, 4),   # grid divides shards
                                      (88, 4),   # fractional grid
                                      (64, 8)])  # stride > kernel (aa2)
def test_sharded_strided_conv_parity(smesh, rng, h, stride):
    """Shard-local strided head conv (r4) == lax.conv with zero 'same' pad,
    incl. stride > kernel (which GSPMD's partitioner refuses)."""
    import jax.lax as lax
    from refvsr_tpu.parallel.spatial import maybe_sharded_strided_conv_small

    n, w, ci, co, k, pad = 1, 24, 6, 5, 5, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, ci)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((k, k, ci, co)).astype(np.float32)) * 0.2
    bias = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    with spatial_sharding(smesh, halo=8):
        got = jax.jit(
            lambda a: maybe_sharded_strided_conv_small(a, kernel, bias,
                                                       stride, pad)
        )(_shard(smesh, x, 1))
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


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


@pytest.mark.parametrize("h,w,ks", [(96, 32, 4),   # grid rows divide shards
                                    (88, 32, 4),   # fractional: gh=22, s=8
                                    (64, 32, 8)])  # aa2-style kernel
def test_sharded_patch_warp_parity(smesh, rng, h, w, ks):
    """Ring-rotation patch warp (r4) == the unsharded unfold/gather/fold,
    for WORST-CASE fully random index maps (every output row pulls from an
    arbitrary shard) and both aligned and fractional patch-grid geometry."""
    from refvsr_tpu.ops.patches import (extract_patches, fold_non_overlapping,
                                        gather_patches)
    from refvsr_tpu.parallel.spatial import maybe_sharded_patch_warp

    c = 5
    gh, gw = h // ks, w // ks
    l = gh * gw
    v = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, l, (1, l)).astype(np.int32))

    unf = extract_patches(v, ks, ks, padding="same")
    want = fold_non_overlapping(gather_patches(unf, idx), (h, w), ks, c)

    with spatial_sharding(smesh, halo=16):
        got = jax.jit(
            lambda vv, ii: maybe_sharded_patch_warp(vv, ii, ks, ks, (h, w))
        )(_shard(smesh, v, 1), _shard(smesh, idx, 1))
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_sharded_patch_warp_no_big_allgather(smesh, rng):
    """The compiled ring program must not all-gather the patch table (only
    the tiny int32 index map may ride an all-gather)."""
    from refvsr_tpu.parallel.spatial import maybe_sharded_patch_warp

    h, w, c, ks = 96, 32, 5, 4
    l = (h // ks) * (w // ks)
    v = jnp.asarray(rng.standard_normal((1, h, w, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, l, (1, l)).astype(np.int32))
    with spatial_sharding(smesh, halo=16):
        compiled = jax.jit(
            lambda vv, ii: maybe_sharded_patch_warp(vv, ii, ks, ks, (h, w))
        ).lower(_shard(smesh, v, 1), _shard(smesh, idx, 1)).compile()
    import re
    big = []
    for line in compiled.as_text().splitlines():
        m = re.search(r"=\s*(\w+)\[([\d,]*)\][^=]*\ball-gather", line)
        if not m:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        if m.group(1) not in ("s32", "u32") and n > l:
            big.append(line[:120])
    assert not big, big
