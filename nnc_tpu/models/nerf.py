"""NeRF MLP as a functional JAX model with first-class LSA scales.

The parameter pytree stores weights in (in, out) layout so the forward pass
is ``x @ w + b`` (MXU-friendly). Conversion helpers map to/from the torch
state-dict layout (out, in) used by the codec and reference checkpoints
(reference model: utils.py:18-80; wrapper: utils.py:84-106).

Architecture (D=8, W=256, skip at layer 4, viewdir head):
  pts_linears: 63 -> 256 -> ... (skip concat at layer index 4 input) -> 256
  alpha_linear: 256 -> 1 ; feature_linear: 256 -> 256
  views_linears[0]: 256+27 -> 128 ; rgb_linear: 128 -> 3

LSA ("Local Scaling Adaptation") attaches one scale per output channel to
every Linear weight; the effective weight is ``ls * w`` (per out-channel),
matching the reference's ScaledLinear
(reference: framework/applications/utils/transforms.py:84-111).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 4
    skips: tuple = (4,)
    use_viewdirs: bool = True
    compute_dtype: Any = jnp.float32  # set jnp.bfloat16 for MXU fast path


Params = Dict[str, Dict[str, jnp.ndarray]]

# torch module names of each linear layer inside one NeRF MLP
def layer_names(config: NeRFConfig):
    names = [f"pts_linears.{i}" for i in range(config.D)]
    if config.use_viewdirs:
        names += ["feature_linear", "alpha_linear", "views_linears.0",
                  "rgb_linear"]
    else:
        names += ["output_linear"]
    return names


def _layer_dims(config: NeRFConfig):
    dims = {}
    in_dim = config.input_ch
    for i in range(config.D):
        dims[f"pts_linears.{i}"] = (in_dim, config.W)
        in_dim = config.W + (config.input_ch if i in config.skips else 0)
    if config.use_viewdirs:
        dims["feature_linear"] = (config.W, config.W)
        dims["alpha_linear"] = (config.W, 1)
        dims["views_linears.0"] = (config.W + config.input_ch_views,
                                   config.W // 2)
        dims["rgb_linear"] = (config.W // 2, 3)
    else:
        dims["output_linear"] = (config.W, config.output_ch)
    return dims


def init_params(key, config: NeRFConfig) -> Params:
    """Kaiming-uniform init (matches torch nn.Linear defaults closely)."""
    params = {}
    for name, (din, dout) in _layer_dims(config).items():
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(din)
        params[name] = {
            "w": jax.random.uniform(k1, (din, dout), jnp.float32,
                                    -bound, bound),
            "b": jax.random.uniform(k2, (dout,), jnp.float32, -bound, bound),
        }
    return params


def init_lsa_scales(config: NeRFConfig, std: float = 1e-5,
                    key=None) -> Params:
    """One scale per output channel per layer, init N(1, std^2).
    (reference: transforms.py:97-101)"""
    scales = {}
    for i, (name, (_din, dout)) in enumerate(_layer_dims(config).items()):
        if key is not None:
            sub = jax.random.fold_in(key, i)
            noise = std * jax.random.normal(sub, (dout,), jnp.float32)
        else:
            noise = jnp.zeros((dout,), jnp.float32)
        scales[name] = 1.0 + noise
    return scales


def apply_mlp(params: Params, pts_emb: jnp.ndarray,
              views_emb: Optional[jnp.ndarray], config: NeRFConfig,
              ls: Optional[Params] = None) -> jnp.ndarray:
    """Forward the NeRF MLP on embedded points (+ embedded view dirs).

    pts_emb: (..., input_ch); views_emb: (..., input_ch_views).
    Returns raw (..., 4) = (rgb logits, sigma). float32 outputs regardless of
    compute dtype.
    """
    cdt = config.compute_dtype

    def dense(name, x):
        w = params[name]["w"]
        if ls is not None and name in ls:
            w = w * ls[name][None, :]
        y = jnp.dot(x.astype(cdt), w.astype(cdt),
                    preferred_element_type=jnp.float32)
        return y + params[name]["b"]

    h = pts_emb
    for i in range(config.D):
        h = jax.nn.relu(dense(f"pts_linears.{i}", h))
        if i in config.skips:
            h = jnp.concatenate([pts_emb, h], axis=-1)

    if config.use_viewdirs:
        alpha = dense("alpha_linear", h)
        feature = dense("feature_linear", h)
        h = jnp.concatenate([feature, views_emb], axis=-1)
        h = jax.nn.relu(dense("views_linears.0", h))
        rgb = dense("rgb_linear", h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return dense("output_linear", h)


# ---------------------------------------------------------------------------
# torch state-dict layout conversion
# ---------------------------------------------------------------------------
def config_from_state_dict(state_dict: Dict[str, np.ndarray],
                           prefix: str = "model.") -> NeRFConfig:
    """Infer the MLP architecture from a flat torch-layout state dict.

    The reference only ever instantiates the fixed 8x256 NeRF
    (utils.py:18-80); inferring D/W/skips/viewdirs here lets the codec
    accept any checkpoint size without an explicit mlp_config.
    """
    pts = sorted(int(k[len(prefix) + 12:-7]) for k in state_dict
                 if k.startswith(prefix + "pts_linears.")
                 and k.endswith(".weight"))
    if not pts:
        raise KeyError(f"no '{prefix}pts_linears.*.weight' keys")
    D = max(pts) + 1
    w0 = np.asarray(state_dict[prefix + "pts_linears.0.weight"])
    W, input_ch = w0.shape  # torch layout (out, in)
    skips = tuple(
        i for i in range(D - 1)
        if np.asarray(
            state_dict[prefix + f"pts_linears.{i + 1}.weight"]).shape[1]
        == W + input_ch)
    use_viewdirs = (prefix + "alpha_linear.weight") in state_dict
    input_ch_views = 0
    output_ch = 4
    if use_viewdirs:
        input_ch_views = int(np.asarray(
            state_dict[prefix + "views_linears.0.weight"]).shape[1]) - W
    else:
        output_ch = int(np.asarray(
            state_dict[prefix + "output_linear.weight"]).shape[0])
    return NeRFConfig(D=D, W=int(W), input_ch=int(input_ch),
                      input_ch_views=input_ch_views, output_ch=output_ch,
                      skips=skips, use_viewdirs=use_viewdirs)


def params_from_state_dict(state_dict: Dict[str, np.ndarray], prefix: str,
                           config: NeRFConfig):
    """Build (params, ls) from a flat numpy state dict with torch layout.

    Keys: ``{prefix}{layer}.weight`` (out,in), ``.bias`` (out,), optional
    ``.weight_scaling`` (out,) or (out,1)."""
    params, scales = {}, {}
    has_ls = False
    for name in layer_names(config):
        w = np.asarray(state_dict[prefix + name + ".weight"], np.float32)
        b = np.asarray(state_dict[prefix + name + ".bias"], np.float32)
        params[name] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
        ls_key = prefix + name + ".weight_scaling"
        if ls_key in state_dict:
            has_ls = True
            scales[name] = jnp.asarray(
                np.asarray(state_dict[ls_key], np.float32).reshape(-1))
        else:
            scales[name] = jnp.ones((w.shape[0],), jnp.float32)
    return params, (scales if has_ls else None)


def params_to_state_dict(params: Params, prefix: str,
                         ls: Optional[Params] = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict` (torch layout)."""
    out = {}
    for name, p in params.items():
        out[prefix + name + ".weight"] = np.asarray(p["w"]).T.copy()
        out[prefix + name + ".bias"] = np.asarray(p["b"]).copy()
        if ls is not None and name in ls:
            out[prefix + name + ".weight_scaling"] = \
                np.asarray(ls[name]).reshape(-1, 1).copy()
    return out


def fold_lsa(params: Params, ls: Params) -> Params:
    """Bake LSA scales into weights (functional apply_lsa)."""
    return {name: {"w": p["w"] * ls[name][None, :], "b": p["b"]}
            for name, p in params.items()}
