"""Positional encoding (NeRF frequency embedding).

Channel ordering matches nerf-pytorch's Embedder so that weights converted
from reference checkpoints act on identical input layouts
(reference: framework/nerf_model/run_nerf_helpers.py:18-67):
``[x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]`` with
``f_i = 2**i`` (log sampling). multires=10 -> 63 channels for xyz;
multires_views=4 -> 27 channels for view dirs.
"""
from __future__ import annotations

import jax.numpy as jnp


def embed_dim(multires: int, input_dims: int = 3,
              include_input: bool = True) -> int:
    return input_dims * (include_input + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int,
                        include_input: bool = True) -> jnp.ndarray:
    """Encode last axis. x: (..., D) -> (..., D*(include+2*multires))."""
    if multires == 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # (F,)
    xb = x[..., None, :] * freqs[:, None]               # (..., F, D)
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    enc = jnp.stack([sin, cos], axis=-2)                # (..., F, 2, D)
    enc = enc.reshape(*x.shape[:-1], -1)                # (..., F*2*D)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
