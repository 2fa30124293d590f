"""Ray generation and NDC warping.

(reference semantics: framework/nerf_model/run_nerf_helpers.py:71-115.)
OpenGL-style camera: x right, y up, z backwards (rays look along -z).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w):
    """Rays for every pixel. K: (3,3) intrinsics; c2w: (3,4) pose.
    Returns (rays_o, rays_d) each (H, W, 3)."""
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - K[0, 2]) / K[0, 0],
                      -(j - K[1, 2]) / K[1, 1],
                      -jnp.ones_like(i)], axis=-1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """numpy twin of get_rays (used for host-side ray-pool precompute)."""
    K = np.asarray(K)
    c2w = np.asarray(c2w)
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - K[0, 2]) / K[0, 0],
                     -(j - K[1, 2]) / K[1, 1],
                     -np.ones_like(i)], axis=-1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape).copy()
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Shift to near plane and warp to normalized device coordinates
    (for forward-facing LLFF scenes)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * \
        (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * \
        (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = jnp.stack([o0, o1, o2], axis=-1)
    rays_d = jnp.stack([d0, d1, d2], axis=-1)
    return rays_o, rays_d
