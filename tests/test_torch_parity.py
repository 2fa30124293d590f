"""Cross-framework parity: our JAX NeRF must exactly reproduce a torch NeRF
forward pass given the same (reference-format) checkpoint weights.

The torch module below follows the vanilla nerf-pytorch architecture spec
(D=8 W=256, skip concat after layer 4, viewdir heads; reference layout
documented at utils.py:18-80) and acts as an independent oracle for weight
layout, posenc channel order, and skip wiring.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from nnc_tpu.models import nerf
from nnc_tpu.ops.posenc import positional_encoding


class TorchNeRF(torch.nn.Module):
    def __init__(self, D=8, W=32, input_ch=63, input_ch_views=27, skips=(4,)):
        super().__init__()
        self.skips = skips
        self.input_ch = input_ch
        self.input_ch_views = input_ch_views
        layers = [torch.nn.Linear(input_ch, W)]
        for i in range(D - 1):
            in_dim = W + input_ch if i in skips else W
            layers.append(torch.nn.Linear(in_dim, W))
        self.pts_linears = torch.nn.ModuleList(layers)
        self.views_linears = torch.nn.ModuleList(
            [torch.nn.Linear(input_ch_views + W, W // 2)])
        self.feature_linear = torch.nn.Linear(W, W)
        self.alpha_linear = torch.nn.Linear(W, 1)
        self.rgb_linear = torch.nn.Linear(W // 2, 3)

    def forward(self, x):
        input_pts, input_views = torch.split(
            x, [self.input_ch, self.input_ch_views], dim=-1)
        h = input_pts
        for i, layer in enumerate(self.pts_linears):
            h = F.relu(layer(h))
            if i in self.skips:
                h = torch.cat([input_pts, h], -1)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        h = torch.cat([feature, input_views], -1)
        for layer in self.views_linears:
            h = F.relu(layer(h))
        rgb = self.rgb_linear(h)
        return torch.cat([rgb, alpha], -1)


def torch_posenc(x, multires):
    """nerf-pytorch Embedder semantics: [x, sin(f0 x), cos(f0 x), ...]."""
    out = [x]
    for i in range(multires):
        f = 2.0 ** i
        out.append(torch.sin(x * f))
        out.append(torch.cos(x * f))
    return torch.cat(out, -1)


def test_posenc_matches_torch():
    x = torch.randn(5, 3)
    want = torch_posenc(x, 10).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x.numpy()), 10))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mlp_forward_matches_torch_checkpoint():
    torch.manual_seed(451)
    tm = TorchNeRF(W=32)
    sd = {("model." + k): v.detach().numpy() for k, v in
          tm.state_dict().items()}
    cfg = nerf.NeRFConfig(W=32)
    params, ls = nerf.params_from_state_dict(sd, "model.", cfg)
    assert ls is None

    pts = torch.randn(17, 3)
    views = torch.randn(17, 3)
    views = views / views.norm(dim=-1, keepdim=True)
    x = torch.cat([torch_posenc(pts, 10), torch_posenc(views, 4)], -1)
    want = tm(x).detach().numpy()

    pe = positional_encoding(jnp.asarray(pts.numpy()), 10)
    ve = positional_encoding(jnp.asarray(views.numpy()), 4)
    got = np.asarray(nerf.apply_mlp(params, pe, ve, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roundtrip_back_to_torch():
    """state dict -> JAX params -> state dict loads back into torch."""
    torch.manual_seed(7)
    tm = TorchNeRF(W=32)
    sd = {("model." + k): v.detach().numpy() for k, v in
          tm.state_dict().items()}
    cfg = nerf.NeRFConfig(W=32)
    params, _ = nerf.params_from_state_dict(sd, "model.", cfg)
    sd2 = nerf.params_to_state_dict(params, "model.")
    tm2 = TorchNeRF(W=32)
    tm2.load_state_dict({k[len("model."):]: torch.from_numpy(v.copy())
                         for k, v in sd2.items()})
    x = torch.randn(4, 63 + 27)
    np.testing.assert_allclose(tm(x).detach().numpy(),
                               tm2(x).detach().numpy(), atol=1e-6)


def test_scaled_linear_semantics_match_torch():
    """ls * W (per out-channel) == reference ScaledLinear forward
    (transforms.py:104-111: F.linear(x, weight_scaling * weight, bias))."""
    torch.manual_seed(3)
    lin = torch.nn.Linear(8, 5)
    ws = torch.randn(5, 1) * 0.1 + 1.0
    x = torch.randn(6, 8)
    want = F.linear(x, ws * lin.weight, lin.bias).detach().numpy()

    w_jax = jnp.asarray(lin.weight.detach().numpy().T)     # (in, out)
    b_jax = jnp.asarray(lin.bias.detach().numpy())
    ls = jnp.asarray(ws.detach().numpy().reshape(-1))
    got = np.asarray(x.numpy() @ (w_jax * ls[None, :]) + b_jax)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
