"""blocked_strided_conv == XLA native strided conv, for every (k, s) the
model uses plus awkward non-multiple spatial sizes."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from refvsr_tpu.ops.conv import blocked_strided_conv


@pytest.mark.parametrize("k,s,h,w,c,o", [
    (5, 8, 64, 96, 16, 8),    # aa2 p_conv_0 geometry (k <= s: pure matmul)
    (5, 4, 64, 96, 16, 8),    # aa1 p_conv_0 geometry (K'=2)
    (3, 2, 33, 47, 8, 12),    # ref_encoder2_0 / EDVR downsample, odd sizes
    (5, 8, 48, 80, 3, 4),
    (1, 2, 16, 24, 4, 4),     # 1x1 stride 2 (pad 0)
])
def test_blocked_matches_native(k, s, h, w, c, o, rng):
    pad = k // 2
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, k, c, o)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((o,)), jnp.float32)

    ref = lax.conv_general_dilated(
        x, kern, window_strides=(s, s), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = jax.jit(lambda x, kk, b: blocked_strided_conv(x, kk, b, s, pad))(
        x, kern, bias)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_width_packed_conv_matches_direct(rng):
    """pack_conv_kernel: the width-packed conv equals the direct 'same' conv
    exactly (chain modules run packed when W is even)."""
    import jax.lax as lax
    from refvsr_tpu.models.blocks import pack_conv_kernel, width_pack, \
        width_unpack
    x = jnp.asarray(rng.standard_normal((2, 12, 20, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 10)) * 0.2, jnp.float32)
    direct = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kp = pack_conv_kernel(k, 2)
    packed = lax.conv_general_dilated(
        width_pack(x, 2), kp, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = width_unpack(packed, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
