"""Fused conv-chain kernel (ops/pallas/conv_chain.py) parity vs the XLA
module path — same params, same outputs, incl. 'same' zero-padding semantics
at image borders and residual bookkeeping across group splits."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import refvsr_tpu.ops.pallas.conv_chain as cc
from refvsr_tpu.models.blocks import ResidualBlocksWithInputConv, ResList


def _force_fused(monkeypatch):
    monkeypatch.setattr(cc, "use_fused_chain", lambda x, n: True)


def test_resblocks_with_input_conv_fused_parity(rng, monkeypatch):
    x = jnp.asarray(rng.standard_normal((1, 24, 40, 11)).astype(np.float32))
    mod = ResidualBlocksWithInputConv(features=16, num_blocks=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)

    _force_fused(monkeypatch)
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_reslist_fused_parity(rng, monkeypatch):
    x = jnp.asarray(rng.standard_normal((1, 20, 28, 16)).astype(np.float32))
    mod = ResList(num_blocks=4, features=16)
    params = mod.init(jax.random.PRNGKey(1), x)
    want = mod.apply(params, x)

    _force_fused(monkeypatch)
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_params_tree_identical(rng, monkeypatch):
    """The fused path must declare EXACTLY the same param tree (checkpoint
    conversion + torch key mapping depend on it)."""
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    mod = ResidualBlocksWithInputConv(features=8, num_blocks=2)
    p_plain = mod.init(jax.random.PRNGKey(3), x)

    _force_fused(monkeypatch)
    with pltpu.force_tpu_interpret_mode():
        p_fused = mod.init(jax.random.PRNGKey(3), x)
    flat_a = jax.tree_util.tree_flatten_with_path(p_plain)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_multi_tile_grid_parity(rng, monkeypatch):
    """Force a 2-D (H strip x W tile) grid so interior tiles exercise the
    zeroed-guard-column margin logic (corruption must stay inside the
    discarded halo) and the xp-frame masking offsets."""
    x = jnp.asarray(rng.standard_normal((1, 40, 72, 8)).astype(np.float32))
    mod = ResidualBlocksWithInputConv(features=8, num_blocks=3)
    params = mod.init(jax.random.PRNGKey(5), x)
    want = mod.apply(params, x)

    _force_fused(monkeypatch)
    monkeypatch.setattr(
        cc, "_plan_tiles",
        lambda h, w, c, L, rc, it: (16, 24, L, -(-(L + 1) // 4) * 4))
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_group_split_parity(rng, monkeypatch):
    """Chains longer than one group (group_blocks=2 -> several launches) stay
    exact across the group boundaries."""
    x = jnp.asarray(rng.standard_normal((1, 24, 20, 8)).astype(np.float32))
    mod = ResidualBlocksWithInputConv(features=8, num_blocks=5)
    params = mod.init(jax.random.PRNGKey(4), x)
    want = mod.apply(params, x)

    _force_fused(monkeypatch)
    orig = cc.fused_conv_chain

    def small_groups(x, ks, bs, ops, **kw):
        kw["group_blocks"] = 2
        return orig(x, ks, bs, ops, **kw)

    monkeypatch.setattr(cc, "fused_conv_chain", small_groups)
    import refvsr_tpu.models.blocks as blocks_mod  # noqa: F401
    with pltpu.force_tpu_interpret_mode():
        got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
