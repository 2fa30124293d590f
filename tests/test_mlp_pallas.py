"""Fused Pallas MLP: interpret-mode correctness on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnc_tpu.models import nerf
from nnc_tpu.ops import mlp_pallas


def test_supports_only_flagship():
    assert mlp_pallas.supports(nerf.NeRFConfig())
    assert not mlp_pallas.supports(nerf.NeRFConfig(W=32))


def test_fused_matches_reference_interpret():
    mlp = nerf.NeRFConfig()  # f32 compute
    key = jax.random.PRNGKey(0)
    params = nerf.init_params(key, mlp)
    ls = nerf.init_lsa_scales(mlp, std=0.1, key=jax.random.PRNGKey(5))
    N = mlp_pallas.TILE  # one tile to keep interpret mode fast
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (N, 27))

    ref = np.asarray(nerf.apply_mlp(params, pts, views, mlp, ls=ls))
    got = np.asarray(mlp_pallas.fused_nerf_mlp(params, ls, pts, views, mlp))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_fallback_for_unsupported_config():
    mlp = nerf.NeRFConfig(W=32)
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (4, 27))
    out = mlp_pallas.fused_nerf_mlp(params, None, pts, views, mlp)
    assert out.shape == (4, 4)


def test_fused_padding_tail():
    """Non-tile-multiple N pads and slices correctly."""
    mlp = nerf.NeRFConfig()
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    N = 33
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (N, 27))
    ref = np.asarray(nerf.apply_mlp(params, pts, views, mlp))
    got = np.asarray(mlp_pallas.fused_nerf_mlp(params, None, pts, views, mlp))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_fused_from_points_matches_reference_interpret():
    from nnc_tpu.ops.posenc import positional_encoding
    mlp = nerf.NeRFConfig()  # f32
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    N = mlp_pallas.TILE
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    vd = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    ref = np.asarray(nerf.apply_mlp(params, positional_encoding(pts, 10),
                                    positional_encoding(vd, 4), mlp))
    got = np.asarray(mlp_pallas.fused_nerf_mlp_from_points(
        params, None, pts, vd, mlp))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
