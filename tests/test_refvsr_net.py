"""Shape/consistency tests for the RefVSR core network (tiny dims, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.models.matching import tiled_argmax_matmul


def tiny_net(**kw):
    cfg = dict(scale=4, num_blocks=2, mid_channels=8, matching_ksize=2,
               flag_HD_in=False)
    cfg.update(kw)
    return RefVSRNet(**cfg)


N, T, H, W = 1, 3, 16, 16


@pytest.fixture(scope="module")
def train_setup():
    net = tiny_net()
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (N, T, H, W, 3))
    refs = jax.random.uniform(key, (N, T, 2 * H, 2 * W, 3))  # train: ref is 2x
    state = init_stream_state(N, H, W, 8, num_frames=T)
    params = net.init(key, lrs, refs, state)
    return net, params, lrs, refs, state


def test_forward_train_shapes(train_setup):
    net, params, lrs, refs, state = train_setup
    out, new_state = net.apply(params, lrs, refs, state)
    assert out.shape == (N, 4 * H, 4 * W, 3)
    assert new_state.feat_prop.shape == (N, H, W, 8)
    assert new_state.feat_prop_up.shape == (N, 2 * H, 2 * W, 8)
    assert new_state.conf_prop.shape == (N, H, W, 1)
    assert new_state.flow.shape == (N, H, W, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_train_grads_flow(train_setup):
    net, params, lrs, refs, state = train_setup

    def loss_fn(p):
        out, _ = net.apply(p, lrs, refs, state)
        return jnp.mean(out ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the last conv must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    nonzero = [np.abs(np.asarray(v)).sum() > 0 for k, v in flat
               if "conv_last" in jax.tree_util.keystr(k)]
    assert nonzero and all(nonzero)


def test_eval_first_then_stream(train_setup):
    net, params, _, _, _ = train_setup
    key = jax.random.PRNGKey(1)
    lrs = jax.random.uniform(key, (N, T, H, W, 3))
    refs = jax.random.uniform(key, (N, T, H, W, 3))  # eval: ref same size
    out, state, conf_vis = net.apply(params, lrs, refs,
                                     method=RefVSRNet.forward_first)
    assert out.shape == (N, 4 * H, 4 * W, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    out2, state2, _ = net.apply(params, lrs, refs, state,
                                method=RefVSRNet.forward_stream)
    assert out2.shape == (N, 4 * H, 4 * W, 3)
    assert np.isfinite(np.asarray(out2)).all()
    assert state2.feat_prop.shape == state.feat_prop.shape
    assert state2.conf_tail.shape == (N, T - T // 2) + state.conf_tail.shape[2:]


def test_stream_matching_cache_matches_fresh(train_setup):
    """forward_stream with the warm conf/index cache must equal the
    cache-less path (conf_tail=None recomputes every tail matching)."""
    net, params, _, _, _ = train_setup
    key = jax.random.PRNGKey(2)
    # 5 streamed steps cross the RAP ring buffer's wrap boundary twice
    # (TT = T - T//2 = 4 slots; base returns to 0 at step 4)
    frames_lr = jax.random.uniform(key, (N, T + 5, H, W, 3))
    frames_ref = jax.random.uniform(jax.random.PRNGKey(3),
                                    (N, T + 5, H, W, 3))
    _, state, _ = net.apply(params, frames_lr[:, :T], frames_ref[:, :T],
                            method=RefVSRNet.forward_first)
    for s in range(1, 6):
        lrs = frames_lr[:, s:s + T]
        refs = frames_ref[:, s:s + T]
        out_c, state_c, _ = net.apply(params, lrs, refs, state,
                                      method=RefVSRNet.forward_stream)
        # also null the RAP cache so the fresh path recomputes everything
        cold = state.replace(conf_tail=None, index_tail=None,
                             aligned_tail=None, aligned_up_tail=None)
        out_f, _, _ = net.apply(params, lrs, refs, cold,
                                method=RefVSRNet.forward_stream)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_f),
                                   atol=1e-6)
        state = state_c


def test_tiled_argmax_matches_dense(rng):
    n, l_ref, l_lr, d = 2, 100, 37, 8
    ref_p = rng.standard_normal((n, l_ref, d)).astype(np.float32)
    lr_p = rng.standard_normal((n, l_lr, d)).astype(np.float32)
    conf, idx = tiled_argmax_matmul(jnp.asarray(ref_p), jnp.asarray(lr_p),
                                    tile=16)
    dense = np.einsum("nrd,nld->nrl", ref_p, lr_p)
    np.testing.assert_allclose(np.asarray(conf), dense.max(1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), dense.argmax(1))


def test_scale2_variant_builds():
    net = tiny_net(scale=2, matching_ksize=4)
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (1, 3, 16, 16, 3))
    refs = jax.random.uniform(key, (1, 3, 32, 32, 3))
    state = init_stream_state(1, 16, 16, 8, num_frames=3)
    params = net.init(key, lrs, refs, state)
    out, _ = net.apply(params, lrs, refs, state)
    assert out.shape == (1, 32, 32, 3)


def test_tiled_tail_matches_direct(train_setup):
    """Row-tiled 8K tail == direct computation (halo/crop correctness)."""
    net, params, _, _, _ = train_setup
    import jax
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 24, 8))

    direct = net.apply(params, method=lambda m: m._tail(x))
    tiled = net.apply(params, method=lambda m: m._tail_tiled(x))
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               atol=2e-6)


def test_preshuffle_tail_matches_direct(train_setup):
    """Pre-shuffle tiled tail (transformed convs on the 2x grid, one final
    shuffle — the r5 production 8K path) == direct tail, including edge
    tiles and the non-divisible fallback."""
    net, params, _, _, _ = train_setup
    import jax
    for h in (16, 17):  # 17: num_chunks falls back to 1 (direct stage)
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, h, 24, 8))
        direct = net.apply(params, method=lambda m: m._tail(x))
        pre = net.apply(params,
                        method=lambda m: m._tail_preshuffle_tiled(x))
        np.testing.assert_allclose(np.asarray(pre), np.asarray(direct),
                                   atol=2e-6, err_msg=f"h={h}")
