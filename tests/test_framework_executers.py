"""Torch-module executer, Keras executer, and the NeRF use-case train hook."""
import numpy as np
import pytest

import nnc_tpu


def _xy_loader(seed=0, n_batches=4, batch=32, dim=8, classes=4):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(0, 1, (dim, classes)).astype(np.float32)
    def loader():
        r = np.random.default_rng(seed + 1)
        for _ in range(n_batches):
            x = r.normal(0, 1, (batch, dim)).astype(np.float32)
            y = np.argmax(x @ w_true, axis=1)
            yield x, y
    return loader


def test_torch_module_executer_lsa_roundtrip(tmp_path):
    """compress(lsa=True) with an arbitrary torch nn.Module: scales are
    tuned through torch autograd and land in the bitstream."""
    import torch.nn as nn

    torch_model = nn.Sequential(nn.Linear(8, 16), nn.ReLU(),
                                nn.Linear(16, 4))
    from nnc_tpu.framework.torch_executer import TorchModuleExecuter
    loader = _xy_loader()
    ex = TorchModuleExecuter(torch_model, loader, learning_rate=5e-3,
                             epochs=2, max_batches=4, verbose=False)
    sd = {k: v.numpy() for k, v in ex.model.state_dict().items()}
    base = ex.eval_model(sd)
    assert len(base) == 3

    lsa_params, ft_params = ex.tune_model(parameters=sd, lsa_flag=True,
                                          ft_flag=False)
    assert lsa_params and not ft_params
    assert all(k.endswith("weight_scaling") for k in lsa_params)
    moved = sum(float(np.abs(v - 1.0).max()) for v in lsa_params.values())
    assert moved > 0.0


def test_torch_module_executer_ft_tunes_biases():
    import torch.nn as nn

    torch_model = nn.Sequential(nn.Linear(8, 16), nn.ReLU(),
                                nn.Linear(16, 4))
    from nnc_tpu.framework.torch_executer import TorchModuleExecuter
    ex = TorchModuleExecuter(torch_model, _xy_loader(), learning_rate=5e-3,
                             epochs=1, max_batches=4, verbose=False)
    sd = {k: v.numpy() for k, v in ex.model.state_dict().items()}
    _lsa, ft = ex.tune_model(parameters=sd, lsa_flag=False, ft_flag=True)
    assert ft and all(k.endswith(".bias") for k in ft)


def test_torch_executer_early_stopping(capsys):
    import torch.nn as nn

    torch_model = nn.Sequential(nn.Linear(8, 4))
    from nnc_tpu.framework.torch_executer import TorchModuleExecuter
    # huge lr so val loss degrades -> patience triggers before epochs end
    ex = TorchModuleExecuter(torch_model, _xy_loader(), learning_rate=50.0,
                             learning_rate_decay=0, epochs=8, patience=1,
                             max_batches=4, verbose=True)
    sd = {k: v.numpy() for k, v in ex.model.state_dict().items()}
    ex.tune_model(parameters=sd, lsa_flag=True)
    out = capsys.readouterr().out
    assert "early stopping" in out


def test_keras_executer_eval():
    tf = pytest.importorskip("tensorflow")
    from tensorflow import keras

    model = keras.Sequential([keras.layers.Input((8,)),
                              keras.layers.Dense(4)])
    from nnc_tpu.framework.tf_io import KerasModelExecuter
    ex = KerasModelExecuter(model, _xy_loader(), max_batches=2,
                            verbose=False)
    params = {w.name: w.numpy() for w in model.weights}
    top1, top5, loss = ex.eval_model(params)
    assert 0.0 <= top1 <= 1.0 and np.isfinite(loss)
    assert not ex.has_tune_lsa() and not ex.has_tune_ft()


def test_nerf_use_case_train_hook():
    """The registry's NeRFModelSetting.train runs a real epoch and updates
    weight_scaling in the wrapper dict (was a NotImplementedError stub)."""
    from nnc_tpu.data import synthetic
    from nnc_tpu.framework.use_cases import use_cases
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer

    MLP = nerf.NeRFConfig(W=16)
    RC = renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                               chunk=64, perturb=True)
    scene, (tc, tf_) = synthetic.make_scene(n_images=2, H=8, W=8, mlp=MLP,
                                            rc=RC, seed=3)
    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model.",
                                        nerf.init_lsa_scales(MLP)))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine.",
                                        nerf.init_lsa_scales(MLP)))
    handler = use_cases["NERF_JAX"]()
    psnr, loss = handler.train(nerf_wrapper=sd, scene=scene, rc=RC,
                               N_iters=5, learning_rate=5e-3, n_rand=32)
    assert np.isfinite(psnr) and np.isfinite(loss)
    ls_keys = [k for k in sd if k.endswith("weight_scaling")]
    assert ls_keys
    moved = sum(float(np.abs(sd[k] - 1.0).max()) for k in ls_keys)
    assert moved > 0.0


def test_scaled_conv2d_preserves_padding_mode():
    import torch
    import torch.nn as nn
    from nnc_tpu.framework.torch_executer import add_lsa_scaling

    torch.manual_seed(0)
    for mode in ("zeros", "reflect", "circular", "replicate"):
        conv = nn.Conv2d(3, 4, 3, padding=1, padding_mode=mode)
        wrapped = add_lsa_scaling(nn.Sequential(conv))
        # force identity scales for an exact comparison
        with torch.no_grad():
            wrapped[0].weight_scaling.fill_(1.0)
        ref = nn.Conv2d(3, 4, 3, padding=1, padding_mode=mode)
        ref.load_state_dict({"weight": wrapped[0].weight,
                             "bias": wrapped[0].bias})
        x = torch.randn(2, 3, 8, 8)
        torch.testing.assert_close(wrapped(x), ref(x))


def test_ndc_teacher_scene_self_consistent():
    """The forward-facing NDC teacher (LLFF-geometry analog) renders its
    own training images back at near-lossless PSNR through the executer's
    NDC path (NDCBatcher + warped test renders)."""
    import numpy as np
    from nnc_tpu.data import synthetic
    from nnc_tpu.framework.executer import NeRFModelExecuter
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer

    mlp = nerf.NeRFConfig(W=16)
    scene, (tc, tf_) = synthetic.make_scene_ndc(n_images=2, H=8, W=8,
                                                mlp=mlp)
    assert scene["ndc"] and scene["near"] == 0.0 and scene["far"] == 1.0
    assert np.isfinite(scene["images"]).all()
    rc = renderer.RenderConfig(mlp=mlp, n_samples=16, n_importance=8,
                               chunk=64)
    ex = NeRFModelExecuter(scene, rc, n_iters=2, i_save=0, n_rand=32,
                           verbose=False)
    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))
    assert ex.test_model(sd) > 60.0
    assert ex.eval_model(sd)[0] > 60.0
