"""Volume rendering: raw MLP outputs -> composited rgb/disp/acc/depth maps.

(reference semantics: framework/nerf_model/run_nerf.py:285-345 raw2outputs.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, rays_d, raw_noise_std=0.0, white_bkgd=False,
                noise_key=None, dists=None):
    """Composite raw predictions along rays.

    raw: (R, S, 4); z_vals: (R, S); rays_d: (R, 3). ``dists`` overrides the
    per-sample integration span (occupancy-selected sampling passes masked
    candidate spacings; entries of 0 contribute exactly nothing).
    Returns dict(rgb_map, disp_map, acc_map, weights, depth_map).
    """
    if dists is None:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + raw_noise_std * jax.random.normal(noise_key,
                                                          sigma.shape)

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)          # (R, S)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                         1.0 - alpha + 1e-10], axis=-1), axis=-1)[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map,
                                                                1e-10))
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {"rgb_map": rgb_map, "disp_map": disp_map, "acc_map": acc_map,
            "weights": weights, "depth_map": depth_map}
