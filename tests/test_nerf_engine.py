import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnc_tpu.models import nerf
from nnc_tpu.ops.posenc import positional_encoding, embed_dim
from nnc_tpu.ops.sampling import sample_pdf, stratified_samples
from nnc_tpu.render import renderer
from nnc_tpu.render.volume import raw2outputs
from nnc_tpu.render.rays import get_rays, get_rays_np


def test_posenc_dims_and_order():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = positional_encoding(x, 10)
    assert enc.shape == (1, 63)
    assert embed_dim(10) == 63 and embed_dim(4) == 27
    # layout: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]
    np.testing.assert_allclose(enc[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(enc[0, 3:6], np.sin(x[0]), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 6:9], np.cos(x[0]), rtol=1e-6)
    np.testing.assert_allclose(enc[0, 9:12], np.sin(2 * x[0]), rtol=1e-6)


def test_mlp_shapes_and_layout_roundtrip():
    cfg = nerf.NeRFConfig(W=32, input_ch=63, input_ch_views=27)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (7, 5, 27))
    raw = nerf.apply_mlp(params, pts, views, cfg)
    assert raw.shape == (7, 5, 4)

    sd = nerf.params_to_state_dict(params, "model.")
    assert sd["model.pts_linears.0.weight"].shape == (32, 63)  # torch layout
    params2, ls2 = nerf.params_from_state_dict(sd, "model.", cfg)
    assert ls2 is None
    raw2 = nerf.apply_mlp(params2, pts, views, cfg)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(raw2), atol=1e-6)


def test_lsa_scale_semantics():
    """ls * w must equal scaling the layer output pre-bias."""
    cfg = nerf.NeRFConfig(W=16, D=2, skips=(), input_ch=8, input_ch_views=4)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg)
    ls = nerf.init_lsa_scales(cfg)
    ls = {k: v * 2.0 for k, v in ls.items()}  # scale everything by 2
    pts = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    views = jax.random.normal(jax.random.PRNGKey(2), (3, 4))
    raw_scaled = nerf.apply_mlp(params, pts, views, cfg, ls=ls)
    folded = nerf.fold_lsa(params, ls)
    raw_folded = nerf.apply_mlp(folded, pts, views, cfg)
    np.testing.assert_allclose(np.asarray(raw_scaled), np.asarray(raw_folded),
                               rtol=1e-5, atol=1e-5)


def np_sample_pdf(bins, weights, u):
    """independent numpy reference for inverse-CDF sampling."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    out = np.zeros(u.shape, np.float32)
    for r in range(u.shape[0]):
        for s in range(u.shape[1]):
            idx = np.searchsorted(cdf[r], u[r, s], side="right")
            below, above = max(0, idx - 1), min(cdf.shape[-1] - 1, idx)
            c0, c1 = cdf[r, below], cdf[r, above]
            b0 = bins[r, min(below, bins.shape[-1] - 1)]
            b1 = bins[r, min(above, bins.shape[-1] - 1)]
            denom = c1 - c0 if (c1 - c0) >= 1e-5 else 1.0
            t = (u[r, s] - c0) / denom
            out[r, s] = b0 + t * (b1 - b0)
    return out


def test_sample_pdf_matches_numpy_reference():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(2, 6, (4, 63)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (4, 62)).astype(np.float32)
    n_importance = 16
    got = sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                     jnp.asarray(weights), n_importance, det=True)
    u = np.broadcast_to(np.linspace(0, 1, n_importance, dtype=np.float32),
                        (4, n_importance))
    want = np_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_sample_pdf_concentrates_mass():
    """samples should land in high-weight bins."""
    bins = jnp.linspace(0.0, 1.0, 65)[None, :].repeat(2, 0)
    weights = jnp.zeros((2, 64)).at[:, 30:34].set(10.0)
    s = sample_pdf(jax.random.PRNGKey(1), bins, weights, 32, det=True)
    frac_inside = np.mean((np.asarray(s) > 0.4) & (np.asarray(s) < 0.6))
    assert frac_inside > 0.9


def test_stratified_bounds():
    z = stratified_samples(jax.random.PRNGKey(0), 2.0, 6.0, 64, 8, True)
    assert z.shape == (8, 64)
    assert float(z.min()) >= 2.0 and float(z.max()) <= 6.0
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)


def test_raw2outputs_analytic():
    R, S = 2, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1))
    # opaque first sample: huge sigma, rgb logit -> sigmoid(~10) ~ 1 (red)
    raw = jnp.zeros((R, S, 4))
    raw = raw.at[:, 0, 3].set(1e8).at[:, 0, 0].set(10.0)
    raw = raw.at[:, 0, 1].set(-10.0).at[:, 0, 2].set(-10.0)
    out = raw2outputs(raw, z, rays_d)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb_map"][:, 0]), 1.0,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rgb_map"][:, 1:]), 0.0,
                               atol=1e-3)
    # empty space -> zero acc; white background fills with 1
    raw0 = jnp.full((R, S, 4), -1e8)
    out0 = raw2outputs(raw0, z, rays_d, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out0["acc_map"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out0["rgb_map"]), 1.0, atol=1e-5)


def test_weights_sum_to_at_most_one():
    rng = jax.random.PRNGKey(3)
    raw = jax.random.normal(rng, (16, 32, 4))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 32), (16, 32))
    rays_d = jnp.ones((16, 3))
    out = raw2outputs(raw, z, rays_d)
    w = np.asarray(out["weights"])
    assert np.all(w >= 0)
    assert np.all(w.sum(-1) <= 1.0 + 1e-5)


def test_get_rays_consistency():
    H, W, f = 8, 12, 20.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3, :4]
    ro, rd = get_rays(H, W, K, c2w)
    ro_np, rd_np = get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_np, atol=1e-6)
    # center pixel looks along -z
    center = np.asarray(rd)[H // 2, W // 2]
    assert center[2] < 0


@pytest.mark.parametrize("n_importance", [0, 8])
def test_render_rays_shapes(n_importance):
    cfg = nerf.NeRFConfig(W=16, input_ch=63, input_ch_views=27)
    rc = renderer.RenderConfig(mlp=cfg, n_samples=8,
                               n_importance=n_importance, chunk=32)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg)
    params_fine = nerf.init_params(jax.random.PRNGKey(1), cfg)
    R = 16
    ro = jnp.zeros((R, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1))
    out = renderer.render_chunk(params, params_fine, None, None, ro, rd,
                                2.0, 6.0, jax.random.PRNGKey(2), rc, True)
    assert out["rgb_map"].shape == (R, 3)
    assert out["disp_map"].shape == (R,)
    if n_importance:
        assert out["rgb0"].shape == (R, 3)


def test_render_image_chunking_matches_single():
    cfg = nerf.NeRFConfig(W=16)
    params = nerf.init_params(jax.random.PRNGKey(0), cfg)
    rc_small = renderer.RenderConfig(mlp=cfg, n_samples=8, n_importance=4,
                                     chunk=8)
    rc_big = renderer.RenderConfig(mlp=cfg, n_samples=8, n_importance=4,
                                   chunk=64)
    rng = np.random.default_rng(0)
    ro = rng.normal(0, 1, (20, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (20, 3)).astype(np.float32)
    out1 = renderer.render_image(params, None, None, None, ro, rd, 2.0, 6.0,
                                 rc_small)
    out2 = renderer.render_image(params, None, None, None, ro, rd, 2.0, 6.0,
                                 rc_big)
    np.testing.assert_allclose(out1["rgb_map"], out2["rgb_map"], atol=1e-5)
