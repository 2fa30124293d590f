"""TensorFlow/Keras-ecosystem adapter: h5 weight files <-> codec dicts.

Only file-level interop is needed (the compute path is JAX): h5 weight files
are read/written with h5py, parameter types inferred from Keras naming
(kernel/beta/gamma/moving_mean/moving_variance). As in the reference, TF
models can be compressed/decompressed but not LSA-tuned
(reference: framework/tensorflow_model/__init__.py:14-578; lsa force-off at
nnc/compression.py:136-138).
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np

from .. import hls
from ..core.model import NNRModel


def is_tef_model(obj) -> bool:
    """True for h5 paths or objects exposing a Keras-style get_weights."""
    if isinstance(obj, str):
        return obj.endswith((".h5", ".hdf5"))
    return hasattr(obj, "get_weights") and hasattr(obj, "weights")


def load_h5_weights(path) -> "OrderedDict[str, np.ndarray]":
    import h5py
    out = OrderedDict()

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    return out


def save_to_tensorflow_file(parameters, path):
    """Write a flat parameter dict into an h5 file, one dataset per tensor
    under its full name. (reference: tensorflow_model/__init__.py:18-43)"""
    import h5py
    with h5py.File(path, "w") as f:
        for name, value in parameters.items():
            f.create_dataset(name, data=np.asarray(value))


def infer_tef_param_type(name: str, ndim: int) -> str:
    base = name.split("/")[-1].split(":")[0]
    if ndim > 1 and "kernel" in base:
        return "weight"
    if ndim > 1:
        return "weight"
    if ndim == 1:
        if "bias" in base or "beta" in base:
            return "bias"
        if "moving_mean" in base:
            return "bn.mean"
        if "moving_variance" in base:
            return "bn.var"
        if "gamma" in base:
            return "bn.gamma"
    return "unspecified"


class TensorFlowModel(NNRModel):
    """NNRModel over Keras h5 weights / model objects."""

    def __init__(self, model=None):
        super().__init__()
        self._mi = None
        if model is not None:
            self.init_model_from_model_object(model)

    def init_model_from_model_object(self, model):
        if isinstance(model, str):
            weights = load_h5_weights(model)
        else:
            weights = OrderedDict(
                (w.name, np.asarray(v))
                for w, v in zip(model.weights, model.get_weights()))
        return self.init_model_from_dict(weights)

    def init_model_from_dict(self, model_dict):
        parameters = {}
        model_info = {
            "parameter_type": {},
            "parameter_dimensions": {},
            "parameter_index": {},
            "block_identifier": {},
            "topology_storage_format": hls.TopologyStorageFormat.NNR_TPL_TEF,
            "topology_compression_format":
                hls.TopologyCompressionFormat.NNR_PT_RAW,
        }
        original_size = 0
        for i, name in enumerate(model_dict):
            arr = np.asarray(model_dict[name])
            original_size += arr.nbytes
            arr = arr.astype(np.int32) if arr.dtype.kind in "iu" \
                else arr.astype(np.float32)
            if arr.ndim == 0:
                arr = arr.reshape(1).astype(np.float32)
            parameters[name] = arr
            model_info["parameter_dimensions"][name] = arr.shape
            model_info["parameter_index"][name] = i
            model_info["parameter_type"][name] = infer_tef_param_type(
                name, arr.ndim)
        model_info["original_size"] = original_size
        self._mi = model_info
        return parameters

    @property
    def model_info(self):
        return self._mi

    def guess_block_id_and_param_type(self, model_parameters):
        """Group per layer path (everything before the final '/') with BN
        merging by channel count, mirroring the torch adapter's logic."""
        from .torch_io import TorchModel
        remapped = OrderedDict()
        alias = {}
        for name in model_parameters:
            py_name = name.replace("/", ".").replace(":0", "")
            py_name = (py_name
                       .replace("kernel", "weight")
                       .replace("moving_mean", "running_mean")
                       .replace("moving_variance", "running_var"))
            alias[py_name] = name
            remapped[py_name] = model_parameters[name]
        guessed = TorchModel().guess_block_id_and_param_type(remapped)
        if guessed is None:
            return None
        return {
            "block_identifier": {alias[k]: v for k, v in
                                 guessed["block_identifier"].items()},
            "parameter_type": {alias[k]: v for k, v in
                               guessed["parameter_type"].items()},
        }


def create_NNC_model_instance_from_file(path):
    mdl = TensorFlowModel()
    params = mdl.init_model_from_dict(load_h5_weights(path))
    return mdl, params


def create_NNC_model_instance_from_object(model):
    mdl = TensorFlowModel()
    params = mdl.init_model_from_model_object(model)
    return mdl, params
