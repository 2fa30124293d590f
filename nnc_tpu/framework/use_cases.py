"""Use-case registry: bundles of {transforms, train, evaluate, dataset}
handlers per task, keyed like the reference registry
(reference: framework/use_case_init/__init__.py:10-232 with keys
'NNR_PYT'/'NNR_TEF'/'NERF_PYT'; here the JAX-native equivalents).
"""
from __future__ import annotations

from typing import Callable, Optional


class DummyDataset:
    """Placeholder satisfying loader interfaces when a task needs no data.
    (reference: use_case_init/__init__.py:164-182)"""

    def __init__(self, n=1):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return 0, 0


class DummyDataLoader:
    def __init__(self, dataset=None):
        self.dataset = dataset or DummyDataset()

    def __iter__(self):
        return iter(())

    def __len__(self):
        return 0


class ModelSetting:
    """Classification-style handler: loaders + train/eval callables."""

    def __init__(self, model_transform=None, evaluate=None, train=None,
                 dataset=None, criterion=None):
        self.model_transform = model_transform
        self.evaluate = evaluate
        self.train = train
        self.dataset = dataset
        self.criterion = criterion

    def init_training(self, dataset_path, batch_size, num_workers):
        return DummyDataLoader()

    def init_validation(self, dataset_path, batch_size, num_workers):
        return DummyDataLoader()

    def init_test(self, dataset_path, batch_size, num_workers):
        return DummyDataLoader()


class NeRFModelSetting:
    """NeRF handler: only `.train` exists (reference NeRFModelSetting has no
    `.evaluate`; use_case_init/__init__.py:185-211). ``train`` runs one
    epoch of LSA tuning over a scene and updates the wrapper state dict in
    place, mirroring train_nerf.train_nerf_model -> run_nerf.train
    (reference: train_nerf.py:14-74; run_nerf.py:461-799)."""

    def train(self, nerf_wrapper=None, dataset_type="blender",
              freeze_batch_norm=True, basedir_save=None, N_iters=1000,
              i_save=0, scene=None, dataset_path=None, rc=None,
              learning_rate=1e-4, n_rand=1024, seed=451, **kwargs):
        """One epoch over the scene. ``nerf_wrapper``: flat state dict with
        ``model.*``/``model_fine.*`` keys (weight_scaling entries tuned in
        place). Returns (mean_psnr, mean_loss)."""
        import numpy as np

        from ..models import nerf
        from ..train import lsa
        from ..train.presets import load_scene, make_render_config

        assert nerf_wrapper is not None, "nerf_wrapper (state dict) required"
        if scene is None:
            scene = load_scene(dataset_type, dataset_path)
        if rc is None:
            rc = make_render_config(scene)

        cfg = rc.mlp
        params_c, ls_c = nerf.params_from_state_dict(nerf_wrapper, "model.",
                                                     cfg)
        params_f, ls_f = nerf.params_from_state_dict(nerf_wrapper,
                                                     "model_fine.", cfg)
        ls_c = ls_c if ls_c is not None else nerf.init_lsa_scales(cfg)
        ls_f = ls_f if ls_f is not None else nerf.init_lsa_scales(cfg)

        from ..data.rays import RayBatcher
        batcher = RayBatcher(scene["images"], scene["poses"], scene["K"],
                             scene["i_train"], n_rand,
                             mode=scene.get("batching_mode", "image"),
                             seed=seed)
        ls_c, ls_f, mean_psnr, mean_loss, _step, _b = lsa.tune_lsa_scales(
            params_c, params_f, ls_c, ls_f, batcher, rc,
            scene["near"], scene["far"], learning_rate=learning_rate,
            learning_rate_decay=0, epochs=1, n_iters=N_iters, i_save=i_save,
            basedir_save=basedir_save, seed=seed, verbose=False)
        for name, v in ls_c.items():
            nerf_wrapper["model." + name + ".weight_scaling"] = \
                np.asarray(v).reshape(-1, 1)
        for name, v in ls_f.items():
            nerf_wrapper["model_fine." + name + ".weight_scaling"] = \
                np.asarray(v).reshape(-1, 1)
        return mean_psnr, mean_loss

    def init_training(self, *a, **k):
        return DummyDataLoader()

    init_validation = init_training
    init_test = init_training


def _classification_setting():
    from ..train import classification
    return ModelSetting(
        evaluate=classification.evaluate_classification_model,
        train=classification.train_classification_model,
        criterion=classification.cross_entropy,
    )


use_cases = {
    "NNR_JAX": _classification_setting,
    "NNR_PYT": _classification_setting,  # torch state dicts enter via torch_io
    "NNR_TEF": _classification_setting,  # h5 weights enter via tf_io
    "NERF_JAX": NeRFModelSetting,
    "NERF_PYT": NeRFModelSetting,
}
