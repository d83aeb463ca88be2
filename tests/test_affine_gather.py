"""affine_bilinear_gather vs a direct numpy transcription of the reference's
clamped-corner bilinear formulas (alignment.py:62-89), incl. the boundary
double-count when corners clamp onto each other."""

import jax.numpy as jnp
import numpy as np

from refvsr_tpu.models.matching import affine_bilinear_gather


def _oracle(xp, p_row, p_col):
    n, hp, wp, c = xp.shape
    lt_r = np.floor(p_row); lt_c = np.floor(p_col)
    rb_r, rb_c = lt_r + 1, lt_c + 1
    lt_r_c = np.clip(lt_r, 0, hp - 1).astype(int)
    lt_c_c = np.clip(lt_c, 0, wp - 1).astype(int)
    rb_r_c = np.clip(rb_r, 0, hp - 1).astype(int)
    rb_c_c = np.clip(rb_c, 0, wp - 1).astype(int)
    p_r = np.clip(p_row, 0, hp - 1)
    p_c = np.clip(p_col, 0, wp - 1)
    g_lt = (1 + (lt_r_c - p_r)) * (1 + (lt_c_c - p_c))
    g_rb = (1 - (rb_r_c - p_r)) * (1 - (rb_c_c - p_c))
    g_lb = (1 + (lt_r_c - p_r)) * (1 - (rb_c_c - p_c))
    g_rt = (1 - (rb_r_c - p_r)) * (1 + (lt_c_c - p_c))
    bi = np.arange(n)[:, None, None]

    def gv(r, idx_c):
        return xp[bi, r, idx_c]

    return (gv(lt_r_c, lt_c_c) * g_lt[..., None]
            + gv(rb_r_c, rb_c_c) * g_rb[..., None]
            + gv(lt_r_c, rb_c_c) * g_lb[..., None]
            + gv(rb_r_c, lt_c_c) * g_rt[..., None])


def test_affine_gather_pair_canvas_boundary(rng, monkeypatch):
    """The pair-canvas fallback (quad canvas over budget — the 8K path) must
    not NaN-poison boundary-clamped anchors: its bottom-row gather walks one
    canvas row past a last-row anchor and relies on mode='clip' (ADVICE r1)."""
    import importlib
    warp_mod = importlib.import_module("refvsr_tpu.ops.warp")
    monkeypatch.setattr(warp_mod, "_QUAD_CANVAS_BYTES", 0)
    xp = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
    p_row = (rng.random((2, 4, 5)) * 9 - 2).astype(np.float32)
    p_col = (rng.random((2, 4, 5)) * 10 - 2).astype(np.float32)
    p_row[0, 0, 0] = 5.0   # exact last row -> bottom gather exits the canvas
    p_col[0, 0, 1] = 6.0
    p_row[0, 0, 2] = 7.5
    p_row[0, 0, 3] = 5.9   # anchor floor == last row, fractional
    got = affine_bilinear_gather(jnp.asarray(xp), jnp.asarray(p_row),
                                 jnp.asarray(p_col))
    assert np.isfinite(np.asarray(got)).all()
    want = _oracle(xp, p_row, p_col)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_affine_gather_matches_reference_formula(rng):
    xp = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
    # coords spanning interior, boundaries (incl. exact last row/col -> the
    # double-count), and out-of-range (beyond clamping)
    p_row = (rng.random((2, 4, 5)) * 9 - 2).astype(np.float32)
    p_col = (rng.random((2, 4, 5)) * 10 - 2).astype(np.float32)
    p_row[0, 0, 0] = 5.0   # exact last row
    p_col[0, 0, 1] = 6.0   # exact last col
    p_row[0, 0, 2] = 7.5   # far out of range
    got = affine_bilinear_gather(jnp.asarray(xp), jnp.asarray(p_row),
                                 jnp.asarray(p_col))
    want = _oracle(xp, p_row, p_col)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_head_tiled_parity(rng, monkeypatch):
    """AlignedConv2d._head row-tiled == direct (bit-exact): the tiled path
    re-zeros out-of-image halo rows after every biased op, so tile edges see
    exactly the 'same' zero padding the direct path sees."""
    import jax
    import refvsr_tpu.models.matching as M
    from refvsr_tpu.models.matching import AlignedConv2d

    net = AlignedConv2d(kernel_size=2, stride=2)
    img = jnp.asarray(rng.standard_normal((1, 48, 20, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, method=AlignedConv2d._head)

    direct = net.apply(params, img, method=AlignedConv2d._head)
    monkeypatch.setattr(M, "_HEAD_TILE_PIXELS", 1)
    tiled = net.apply(params, img, method=AlignedConv2d._head)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(direct),
                               rtol=0, atol=2e-6)

    # non-divisible height falls back to direct (num_chunks == 1 -> None)
    img2 = jnp.asarray(rng.standard_normal((1, 7, 20, 3)).astype(np.float32))
    d2 = net.apply(params, img2, method=AlignedConv2d._head)
    assert d2.shape == (1, 7, 20, 32)


def test_affine_gather_chunked_parity(rng, monkeypatch):
    """The chunked scan path (1-D flattened chunks) == unchunked."""
    import refvsr_tpu.models.matching as M
    x = jnp.asarray(rng.standard_normal((1, 20, 12, 5)).astype(np.float32))
    pr = jnp.asarray((rng.random((1, 9, 6, 4)) * 21).astype(np.float32))
    pc = jnp.asarray((rng.random((1, 9, 6, 4)) * 13).astype(np.float32))
    ref = affine_bilinear_gather(x, pr, pc)
    monkeypatch.setattr(M, "_AFFINE_CHUNK_ELEMS", 64)
    chunked = affine_bilinear_gather(x, pr, pc)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_affine_coords_stay_f32_under_bf16(rng):
    """Tap coordinates must be computed in f32 even under a bf16 compute
    dtype: bf16 has 7 mantissa bits, so coords at canvas row >1024 would
    quantize to 8-16 px steps and scatter the taps (matching.py f32 coord
    island). The bf16 run must stay close to the f32 run at a TALL canvas."""
    import jax
    from refvsr_tpu.models.matching import AlignedConv2d
    from refvsr_tpu.utils.precision import cast_floating

    net = AlignedConv2d(kernel_size=2, stride=2)
    n, hx, wx, c = 1, 1280, 16, 4
    x = rng.standard_normal((n, hx, wx, c)).astype(np.float32)
    q = rng.standard_normal((n, hx // 2, wx // 2, 3)).astype(np.float32)
    r = rng.standard_normal((n, hx, wx, 3)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(q),
                      jnp.asarray(r))
    want = np.asarray(net.apply(params, jnp.asarray(x), jnp.asarray(q),
                                jnp.asarray(r)), np.float32)
    pb = cast_floating(params, jnp.bfloat16)
    got = np.asarray(net.apply(pb, jnp.asarray(x, jnp.bfloat16),
                               jnp.asarray(q, jnp.bfloat16),
                               jnp.asarray(r, jnp.bfloat16)),
                     np.float32)
    # bf16 features add noise, but taps must land on the same pixels:
    # pre-fix this diverged by O(feature std) at rows > 1024
    err = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-6)
    assert err < 0.15, f"bf16 affine output diverged (rel err {err:.3f})"


def test_affine_gather_banded_rows_parity(rng):
    """Grid-row-banded gather (per-band quad canvas, the r5 production path
    for large grids) == the plain global gather, including taps that clamp
    at the global top/bottom edges and worst-case affine displacements."""
    from refvsr_tpu.models.matching import (
        affine_bilinear_gather, affine_bilinear_gather_banded_rows)
    n, hp, wp, c = 1, 130, 40, 5
    stride, ks = 8, 8
    gh, gw, ntaps = 16, 5, ks * ks
    xp = jnp.asarray(rng.standard_normal((n, hp, wp, c)), jnp.float32)
    # worst-case displacements: the min_halo bound from AlignedConv2d
    halo = int(np.ceil(1.4143 * (ks / 2 + 0.5) * 3.0)) + stride
    base_r = 1.0 + stride * np.arange(gh)[None, :, None, None]
    base_c = 1.0 + stride * np.arange(gw)[None, None, :, None]
    disp = 1.4142 * (ks / 2 + 0.5) * 3.0  # max |rot|
    pr = jnp.asarray(base_r + rng.uniform(-disp, disp, (n, gh, gw, ntaps)),
                     jnp.float32)
    pc = jnp.asarray(base_c + rng.uniform(-disp, disp, (n, gh, gw, ntaps)),
                     jnp.float32)
    want = affine_bilinear_gather(xp, pr, pc)
    for nch in (2, 3, 8):  # incl. non-dividing chunk counts
        got = affine_bilinear_gather_banded_rows(xp, pr, pc, stride, halo,
                                                 num_chunks=nch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, err_msg=f"chunks={nch}")
