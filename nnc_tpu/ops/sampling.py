"""Ray sampling: stratified coarse samples + inverse-CDF importance sampling.

TPU-friendly formulations: fixed sample counts (static shapes), searchsorted
realized as a comparison matrix on the VPU instead of a data-dependent loop.
(reference semantics: framework/nerf_model/run_nerf.py:378-408 stratified;
run_nerf_helpers.py:119-163 sample_pdf.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_samples(key, near, far, n_samples: int, n_rays: int,
                       perturb: bool, lindisp: bool = False):
    """z_vals: (n_rays, n_samples). near/far: scalars or (n_rays, 1)."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n_rays, 1))
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n_rays, 1))
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def searchsorted_right(cdf, u):
    """Batched searchsorted(side='right') via comparison matrix.

    cdf: (..., B), u: (..., N) -> indices in [0, B]."""
    return jnp.sum(u[..., :, None] >= cdf[..., None, :], axis=-1)


def sample_pdf(key, bins, weights, n_samples: int, det: bool):
    """Inverse-CDF sampling of ``n_samples`` new z values per ray.

    bins: (R, B+1) bin edges (z_vals_mid), weights: (R, B).
    Returns (R, n_samples)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (R, B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = searchsorted_right(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1),
                                  axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1),
                                  axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
