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
    `.evaluate`; use_case_init/__init__.py:185-211). Training drives the full
    LSA loop through nnc_tpu.train."""

    def train(self, nerf_wrapper=None, dataset_type="blender",
              freeze_batch_norm=True, basedir_save=None, N_iters=1000,
              i_save=0, **kwargs):
        raise NotImplementedError(
            "Use nnc_tpu.train.presets.create_nerf_model_executer + "
            "tune_model; the registry entry exists for API parity.")

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
