"""LSA must recover reconstruction quality lost to coarse quantization.

This is the core claim of the pipeline (reference README.md:5-8): per-output-
channel scales, trained by rendering rays against ground truth, compensate
quantization error of the underlying weights.
"""
import numpy as np
import jax
import pytest

import nnc_tpu
from nnc_tpu.data import synthetic
from nnc_tpu.data.rays import RayBatcher
from nnc_tpu.models import nerf
from nnc_tpu.render import renderer
from nnc_tpu.train import lsa

MLP = nerf.NeRFConfig(W=16)
RC = renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4, chunk=256,
                           perturb=True)


def quantize_params(params, step=0.01, seed=0):
    """Simulated aggressive quantization: elementwise rounding noise plus a
    systematic per-output-channel magnitude error (the component LSA's
    per-channel scales can actually invert)."""
    key = jax.random.PRNGKey(seed)
    out = {}
    for i, (name, p) in enumerate(params.items()):
        k = jax.random.fold_in(key, i)
        ch_err = 1.0 + 0.15 * jax.random.normal(k, (p["w"].shape[1],))
        w = jax.numpy.round(p["w"] / step) * step * ch_err[None, :]
        out[name] = {"w": w, "b": p["b"]}
    return out


def scene_psnr(scene, params_c, params_f, ls_c, ls_f):
    from nnc_tpu.render.rays import get_rays_np
    from nnc_tpu.utils.logging import mse2psnr
    psnrs = []
    for vi in scene["i_test"]:
        ro, rd = get_rays_np(scene["H"], scene["W"], scene["K"],
                             scene["poses"][vi, :3, :4])
        out = renderer.render_image(params_c, params_f, ls_c, ls_f, ro, rd,
                                    scene["near"], scene["far"], RC)
        psnrs.append(mse2psnr(float(np.mean(
            (out["rgb_map"] - scene["images"][vi]) ** 2))))
    return float(np.mean(psnrs))


def test_lsa_recovers_quantization_loss():
    scene, (tc, tf_) = synthetic.make_scene(n_images=4, H=16, W=16, mlp=MLP,
                                            rc=RC, seed=3)
    qc, qf = quantize_params(tc), quantize_params(tf_)

    psnr_clean = scene_psnr(scene, tc, tf_, None, None)
    psnr_quant = scene_psnr(scene, qc, qf, None, None)
    assert psnr_quant < psnr_clean - 0.5  # quantization visibly hurts

    batcher = RayBatcher(scene["images"], scene["poses"], scene["K"],
                         scene["i_train"], 128, seed=0)
    ls_c = nerf.init_lsa_scales(MLP)
    ls_f = nerf.init_lsa_scales(MLP)
    ls_c, ls_f, _p, _l, _s = lsa.tune_lsa_scales(
        qc, qf, ls_c, ls_f, batcher, RC, scene["near"], scene["far"],
        learning_rate=5e-3, learning_rate_decay=0, epochs=1, n_iters=150,
        verbose=False)

    psnr_lsa = scene_psnr(scene, qc, qf, ls_c, ls_f)
    print(f"clean {psnr_clean:.2f} quant {psnr_quant:.2f} lsa {psnr_lsa:.2f}")
    assert psnr_lsa > psnr_quant + 0.3  # LSA recovers a visible margin
