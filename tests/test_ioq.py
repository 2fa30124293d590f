"""Inference-optimised quantization (IOQ) smoke test."""
import numpy as np

import nnc_tpu
from nnc_tpu.train.classification import (ClassificationExecuter,
                                          mlp_classifier_builder)


def test_ioq_runs_and_keeps_accuracy(tmp_path):
    rng = np.random.default_rng(0)
    d = {
        "fc1.weight": rng.normal(0, 0.3, (16, 8)).astype(np.float32),
        "fc1.bias": np.zeros(16, np.float32),
        "fc2.weight": rng.normal(0, 0.3, (4, 16)).astype(np.float32),
        "fc2.bias": np.zeros(4, np.float32),
    }
    x = rng.normal(0, 1, (64, 8)).astype(np.float32)
    y = rng.integers(0, 4, 64)

    def loader():
        yield x, y

    ex = ClassificationExecuter(mlp_classifier_builder(["fc1", "fc2"]),
                                loader, verbose=False)
    base_top1 = ex.eval_model(d)[0]

    bs = str(tmp_path / "ioq.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=-38, ioq=True,
                     model_executer=ex, verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    top1 = ex.eval_model(rec)[0]
    assert top1 >= base_top1 - 0.05  # IOQ must not tank accuracy
