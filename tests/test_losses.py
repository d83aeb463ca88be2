"""Loss-system tests: CX math vs a numpy oracle, DSL variants, prefetcher."""

import jax
import jax.numpy as jnp
import numpy as np

from refvsr_tpu.losses import LossModule, cx_options, parse_loss_spec
from refvsr_tpu.losses.contextual import _cx_core


def _np_cx_cosine(x, y, bw=0.5, x_self_mu=False):
    """Independent numpy oracle of contextual.py:6-54 (NHWC in)."""
    n, h, w, c = y.shape
    y_mu = y.mean(axis=(0, 1, 2), keepdims=True)
    x_mu = x.mean(axis=(0, 1, 2), keepdims=True) if x_self_mu else y_mu
    xc, yc = x - x_mu, y - y_mu
    xn = xc / np.maximum(np.linalg.norm(xc, axis=-1, keepdims=True), 1e-12)
    yn = yc / np.maximum(np.linalg.norm(yc, axis=-1, keepdims=True), 1e-12)
    d = np.clip(1 - np.einsum("nxc,nyc->nxy", xn.reshape(n, -1, c),
                              yn.reshape(n, -1, c)), 0, None)
    dt = d / (d.min(axis=2, keepdims=True) + 1e-5)
    wgt = np.exp((1 - dt) / bw)
    cx = wgt / (wgt.sum(axis=2, keepdims=True) + 1e-5)
    r_val = cx.max(axis=1)
    r_idx = cx.argmax(axis=1)
    sim = np.exp((1 - d) / 0.5)
    cmap = np.take_along_axis(sim, r_idx[:, None, :], axis=1)[:, 0]
    agg = (r_val * cmap).sum(1) / cmap.sum(1)
    return np.mean(-np.log(agg + 1e-5))


def test_cx_core_matches_numpy_oracle(rng):
    x = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    y = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    for x_self_mu in (False, True):
        got, cmap = _cx_core(jnp.asarray(x), jnp.asarray(y), 0.5, x_self_mu)
        want = _np_cx_cosine(x, y, x_self_mu=x_self_mu)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)
        assert cmap.shape == (2, 4, 5, 1)


def test_cx_variants_run(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    for kw in (dict(loss_type="L2"), dict(is_cobi=True),
               dict(is_cobi=True, x_self_mu=True), dict(loss_type="L1")):
        loss, _ = _cx_core(x, y, 0.5, kw.pop("x_self_mu", False), **kw)
        assert np.isfinite(float(loss))


def test_dsl_variant_decoding():
    assert cx_options("MFID_ref_CoBi_X_mu") == dict(
        is_cobi=True, loss_type="cosine", x_self_mu=True)
    assert cx_options("FID_ref_L2") == dict(
        is_cobi=False, loss_type="L2", x_self_mu=False)
    assert cx_options("FID_hr") == dict(
        is_cobi=False, loss_type="cosine", x_self_mu=False)
    assert cx_options("L1_lf") is None
    terms = parse_loss_spec("1*L1_lf+0.05*MFID_ref_CoBi+0.1*FID_ref_L2")
    assert [t[1] for t in terms] == ["L1_lf", "MFID_ref_CoBi", "FID_ref_L2"]


def test_loss_module_full_spec(rng):
    spec = "1*L1_lf+0.05*MFID_ref_X_mu+0.01*FID_hr"
    mod = LossModule(spec=spec, scale=4)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sr = jax.random.uniform(k1, (1, 16, 16, 3))
    hr = jax.random.uniform(k2, (1, 16, 16, 3))
    refs = jax.random.uniform(k3, (1, 2, 16, 16, 3))
    params = mod.init(key, sr, hr, refs)
    errs = mod.apply(params, sr, hr, refs)
    for k in ("L1_lf", "MFID_ref_X_mu", "FID_hr", "total", "PSNR"):
        assert k in errs and np.isfinite(float(errs[k])), k
    # total is the weighted sum of the terms
    np.testing.assert_allclose(
        float(errs["total"]),
        float(errs["L1_lf"] + errs["MFID_ref_X_mu"] + errs["FID_hr"]),
        rtol=1e-6)


def test_loss_vis_maps(rng):
    """Loss-side CX confidence visualizations (Loss.py:112/123/133 +
    norm_res_vis): right keys, feature-grid shapes, [0,1] range."""
    spec = "1*L1_lf+0.05*MFID_ref_X_mu+0.01*FID_hr"
    mod = LossModule(spec=spec, scale=4)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sr = jax.random.uniform(k1, (1, 16, 16, 3))
    hr = jax.random.uniform(k2, (1, 16, 16, 3))
    refs = jax.random.uniform(k3, (1, 2, 16, 16, 3))
    params = mod.init(key, sr, hr, refs)
    vis = mod.apply(params, sr, hr, refs, method=LossModule.vis_maps)
    assert set(vis) == {"contextual_ref_MFID_C", "contextual_hr_C_sh"}
    for k, v in vis.items():
        v = np.asarray(v)
        assert v.ndim == 4 and v.shape[-1] == 1, (k, v.shape)
        assert np.isfinite(v).all()
        assert v.min() >= 0.0 and v.max() <= 1.0 + 1e-6, k
    # MFID maps are per (batch x ref-frame)
    assert vis["contextual_ref_MFID_C"].shape[0] == 2


def test_prefetch_iterator():
    from refvsr_tpu.data.prefetch import prefetch
    assert list(prefetch(range(10), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    import pytest
    it = iter(prefetch(boom(), depth=1))
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
