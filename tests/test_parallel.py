"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Covers the two scaling axes of SURVEY.md §2.2:
  - data parallelism (batch sharded, params replicated, XLA-inserted psum)
  - spatial sharding of the streaming step (the 8K long-frame axis: H sharded
    over the 'spatial' mesh axis; XLA GSPMD inserts halo exchanges for convs)"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _net_and_params(h=16, w=16, t=3):
    net = RefVSRNet(scale=4, num_blocks=2, mid_channels=8, matching_ksize=2)
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (2, t, h, w, 3))
    refs = jax.random.uniform(key, (2, t, h, w, 3))
    params = net.init(key, lrs, refs,
                      init_stream_state(2, h, w, 8, num_frames=t))
    return net, params, lrs, refs


def test_data_parallel_eval_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    net, params, lrs, refs = _net_and_params()
    mesh = make_mesh(n_data=2, n_spatial=1)

    def fwd(params, lrs, refs):
        out, _, _ = net.apply(params, lrs, refs,
                              method=RefVSRNet.forward_first)
        return out

    ref_out = jax.jit(fwd)(params, lrs, refs)
    sharded = jax.jit(fwd, in_shardings=(replicate(mesh),
                                         shard_batch(mesh, 5),
                                         shard_batch(mesh, 5)))(
        params, lrs, refs)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref_out),
                               atol=2e-5)


def test_spatial_sharded_stream_compiles_and_matches():
    """H-axis sharding of the streaming step over 4 devices (8K path model)."""
    net, params, lrs, refs = _net_and_params(h=32, w=16)
    state = init_stream_state(2, 32, 16, 8, num_frames=3)
    mesh = make_mesh(n_data=1, n_spatial=4)

    def fwd(params, lrs, refs, state):
        out, new_state, _ = net.apply(params, lrs, refs, state,
                                      method=RefVSRNet.forward_stream)
        return out

    ref_out = jax.jit(fwd)(params, lrs, refs, state)
    spatial = lambda ndim, axis: NamedSharding(
        mesh, P(*[None] * axis, "spatial", *[None] * (ndim - axis - 1)))
    # H is always the third-from-last axis (N,[T,]H,W,C-like leaves)
    state_sh = jax.tree_util.tree_map(
        lambda x: spatial(x.ndim, x.ndim - 3), state)
    out = jax.jit(fwd, in_shardings=(replicate(mesh), spatial(5, 2),
                                     spatial(5, 2), state_sh))(
        params, lrs, refs, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)
