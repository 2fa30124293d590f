"""Fused Pallas MLP: interpret-mode correctness on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
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


def test_fused_render_pass_matches_raw2outputs_interpret():
    """Experimental full-fusion (MLP + compositing) kernel: exact in
    interpret mode (compiled TPU path pending a Mosaic fix; see CLAUDE.md)."""
    from nnc_tpu.ops.mlp_pallas import fused_render_pass
    from nnc_tpu.ops.posenc import positional_encoding
    from nnc_tpu.render.volume import raw2outputs

    mlp = nerf.NeRFConfig()
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    R, S = 8, 16
    key = jax.random.PRNGKey(1)
    ro = jax.random.normal(key, (R, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3)) * 0.2 + \
        jnp.array([0, 0, -1.0])
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 2),
                                    (R, S)) * 4 + 2, axis=-1)
    out = fused_render_pass(params, None, ro, rd, vd, z, mlp)

    pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
    pe = positional_encoding(pts, 10)
    ve = positional_encoding(jnp.broadcast_to(vd[:, None, :], pts.shape), 4)
    ref = raw2outputs(nerf.apply_mlp(params, pe, ve, mlp), z, rd)
    for k in ("rgb_map", "acc_map", "depth_map", "weights"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5)
