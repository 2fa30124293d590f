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

    # TPU-friendly interval lookup: instead of index gathers (slow
    # scatter/gather path on the VPU), exploit monotonicity of cdf and bins
    # and compute the bracketing values as masked max/min reductions over the
    # (N, B+1) comparison matrix — pure vectorized ops that XLA fuses.
    mask = u[..., :, None] >= cdf[..., None, :]       # (..., N, B+1)
    neg, pos = -jnp.inf, jnp.inf
    cdf_b = cdf[..., None, :]
    cdf_g0 = jnp.max(jnp.where(mask, cdf_b, neg), axis=-1)       # cdf[below]
    cdf_g1 = jnp.min(jnp.where(mask, pos, cdf_b), axis=-1)       # cdf[above]
    cdf_g1 = jnp.where(jnp.isfinite(cdf_g1), cdf_g1, cdf[..., -1:])

    # bins shares the cdf index space (B+1 edges each)
    bins_b = bins[..., None, :]
    bins_g0 = jnp.max(jnp.where(mask, bins_b, neg), axis=-1)
    bins_g0 = jnp.where(jnp.isfinite(bins_g0), bins_g0, bins[..., :1])
    bins_g1 = jnp.min(jnp.where(mask, pos, bins_b), axis=-1)
    bins_g1 = jnp.where(jnp.isfinite(bins_g1), bins_g1, bins[..., -1:])

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
