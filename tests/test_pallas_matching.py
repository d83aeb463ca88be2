"""Pallas streaming-argmax matching kernel vs dense oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from refvsr_tpu.ops.pallas.matching_kernel import pallas_argmax_matmul


def test_pallas_matching_matches_dense(rng):
    ref_p = rng.standard_normal((2, 700, 144)).astype(np.float32)
    lr_p = rng.standard_normal((2, 300, 144)).astype(np.float32)
    conf, idx = pallas_argmax_matmul(jnp.asarray(ref_p), jnp.asarray(lr_p),
                                     interpret=True)
    dense = np.einsum("nrd,nld->nrl", ref_p, lr_p)
    np.testing.assert_allclose(np.asarray(conf), dense.max(1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), dense.argmax(1))


def test_pallas_matching_ragged_sizes(rng):
    # non-multiple L_ref/L_lr/D exercise the padding/masking paths
    ref_p = rng.standard_normal((1, 513, 100)).astype(np.float32)
    lr_p = rng.standard_normal((1, 257, 100)).astype(np.float32)
    conf, idx = pallas_argmax_matmul(jnp.asarray(ref_p), jnp.asarray(lr_p),
                                     tile_lr=128, tile_ref=256, interpret=True)
    dense = np.einsum("nrd,nld->nrl", ref_p, lr_p)
    np.testing.assert_allclose(np.asarray(conf), dense.max(1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), dense.argmax(1))


def test_pallas_matching_grad_matches_dense(rng):
    """custom_vjp: cotangent flows to the argmax row only, matching autodiff
    through the dense max formulation (training path uses this)."""
    import jax
    ref_p = jnp.asarray(rng.standard_normal((2, 100, 32)), jnp.float32)
    lr_p = jnp.asarray(rng.standard_normal((2, 60, 32)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((2, 60)), jnp.float32)

    def loss_pallas(ref_p, lr_p):
        conf, _ = pallas_argmax_matmul(ref_p, lr_p, 256, 512, True)
        return jnp.sum(conf * wgt)

    def loss_dense(ref_p, lr_p):
        sim = jnp.einsum("nrd,nld->nrl", ref_p, lr_p)
        return jnp.sum(jnp.max(sim, axis=1) * wgt)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(ref_p, lr_p)
    gd = jax.grad(loss_dense, argnums=(0, 1))(ref_p, lr_p)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
