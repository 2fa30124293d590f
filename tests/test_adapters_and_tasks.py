"""TF adapter, classification executer, BN folding, grapher, use cases."""
import os

import numpy as np
import pytest

import nnc_tpu
from nnc_tpu.framework import tf_io, torch_io
from nnc_tpu.core import approximator, model as nnr_model


def make_conv_bn_dict(rng):
    """conv + bn + linear classifier state dict (torch naming)."""
    return {
        "features.0.weight": rng.normal(0, 0.1, (8, 3, 3, 3)).astype(np.float32),
        "features.0.bias": rng.normal(0, 0.01, (8,)).astype(np.float32),
        "features.1.weight": rng.uniform(0.5, 1.5, (8,)).astype(np.float32),  # bn gamma
        "features.1.bias": rng.normal(0, 0.01, (8,)).astype(np.float32),      # bn beta
        "features.1.running_mean": rng.normal(0, 0.1, (8,)).astype(np.float32),
        "features.1.running_var": rng.uniform(0.5, 2.0, (8,)).astype(np.float32),
        "classifier.weight": rng.normal(0, 0.1, (10, 8)).astype(np.float32),
        "classifier.bias": rng.normal(0, 0.01, (10,)).astype(np.float32),
    }


def test_guess_blocks_merges_bn():
    rng = np.random.default_rng(0)
    d = make_conv_bn_dict(rng)
    guessed = torch_io.TorchModel().guess_block_id_and_param_type(d)
    assert guessed is not None
    bi = guessed["block_identifier"]
    # bn params merged into the conv weight's block
    assert bi["features.1.running_mean"] == bi["features.0.weight"]
    assert guessed["parameter_type"]["features.1.weight"] == "bn.gamma"
    assert guessed["parameter_type"]["features.1.running_var"] == "bn.var"
    assert nnr_model.sanity_check_block_id_and_param_type(guessed, d)


def test_bnf_roundtrip(tmp_path):
    """BN folding: compress with bnf=True; decode yields the folded model
    (BN absorbed into weight scale + bias, matching reference behavior —
    the decoded bitstream carries no BN tensors)."""
    rng = np.random.default_rng(1)
    d = make_conv_bn_dict(rng)
    bs = str(tmp_path / "b.nnc")
    nnc_tpu.compress_model(d, bitstream_path=bs, qp=-40, bnf=True,
                           verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    bn_keys = {k for k in d if ".1." in k}
    assert set(rec.keys()) == set(d.keys()) - bn_keys
    # composite conv output preserved: y = g*(conv+b - mean) + beta
    g = d["features.1.weight"] / np.sqrt(d["features.1.running_var"] + 1e-5)
    eff_bias = (d["features.0.bias"] - d["features.1.running_mean"]) * g + \
        d["features.1.bias"]
    eff_w = d["features.0.weight"] * g[:, None, None, None]
    np.testing.assert_allclose(rec["features.0.bias"], eff_bias, atol=1e-2)
    np.testing.assert_allclose(rec["features.0.weight"], eff_w, atol=1e-2)


def test_fold_unfold_bn_inverse():
    """Encoder-side fold/unfold are inverses on the structural level when
    model_info retains the BN names."""
    rng = np.random.default_rng(7)
    d = make_conv_bn_dict(rng)
    from nnc_tpu.framework.torch_io import TorchModel
    mdl = TorchModel()
    params = mdl.init_model_from_dict(d)
    bmap = mdl.guess_block_id_and_param_type(params)
    nnr_model.set_block_id_and_param_type(mdl.model_info, bmap)
    ad = approximator.init_approx_data(params, mdl.model_info, 2, 0)
    ap = approximator.ApproxInfo(ad, mdl.model_info, "uniform", 0, -38,
                                 False, False, 10, 0.0)
    approximator.fold_bn(mdl.model_info, ad, ap)
    assert "features.1.weight" not in ad["parameters"]  # gamma folded away
    assert "features.0.weight_scaling" in ad["parameters"]  # alpha created
    approximator.unfold_bn(mdl.model_info, ad)
    # identity BN tensors restored
    np.testing.assert_allclose(ad["parameters"]["features.1.weight"], 1.0)
    np.testing.assert_allclose(
        ad["parameters"]["features.1.running_mean"], 0.0)


def test_tf_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    weights = {
        "dense/kernel:0": rng.normal(0, 0.1, (16, 8)).astype(np.float32),
        "dense/bias:0": rng.normal(0, 0.01, (8,)).astype(np.float32),
    }
    h5_path = str(tmp_path / "model.h5")
    tf_io.save_to_tensorflow_file(weights, h5_path)
    assert tf_io.is_tef_model(h5_path)

    bs = str(tmp_path / "tf.nnc")
    nnc_tpu.compress_model(h5_path, bitstream_path=bs, qp=-38, verbose=False)
    rec, info = nnc_tpu.decompress(bs, verbose=False,
                                   return_model_information=True)
    from nnc_tpu import hls
    assert info["topology_storage_format"] == \
        hls.TopologyStorageFormat.NNR_TPL_TEF
    for k in weights:
        assert np.abs(rec[k] - weights[k]).max() < 2e-3

    out_h5 = str(tmp_path / "rec.h5")
    nnc_tpu.decompress_model(bs, model_path=out_h5, verbose=False)
    loaded = tf_io.load_h5_weights(out_h5)
    assert set(loaded.keys()) == set(weights.keys())


def test_tf_lsa_disabled(tmp_path, capsys):
    weights = {"dense/kernel:0": np.ones((4, 4), np.float32)}
    h5_path = str(tmp_path / "m.h5")
    tf_io.save_to_tensorflow_file(weights, h5_path)
    nnc_tpu.compress_model(h5_path, bitstream_path=str(tmp_path / "o.nnc"),
                           lsa=True, verbose=False)
    assert "not supported for TensorFlow" in capsys.readouterr().out


def test_classification_executer_lsa():
    from nnc_tpu.train.classification import (ClassificationExecuter,
                                              mlp_classifier_builder)
    rng = np.random.default_rng(3)
    d = {
        "fc1.weight": rng.normal(0, 0.3, (16, 8)).astype(np.float32),
        "fc1.bias": np.zeros(16, np.float32),
        "fc2.weight": rng.normal(0, 0.3, (4, 16)).astype(np.float32),
        "fc2.bias": np.zeros(4, np.float32),
    }
    x = rng.normal(0, 1, (64, 8)).astype(np.float32)
    y = rng.integers(0, 4, 64)

    def loader():
        for i in range(0, 64, 16):
            yield x[i:i + 16], y[i:i + 16]

    ex = ClassificationExecuter(mlp_classifier_builder(["fc1", "fc2"]),
                                loader, epochs=2, learning_rate=1e-2,
                                verbose=False)
    lsa_params, ft = ex.tune_model(parameters=d, param_types={},
                                   lsa_flag=True, ft_flag=False)
    assert set(lsa_params) == {"fc1.weight_scaling", "fc2.weight_scaling"}
    assert not ft
    # scales moved away from 1 (they were optimized)
    assert np.abs(lsa_params["fc1.weight_scaling"] - 1).max() > 1e-4
    top1, top5, loss = ex.eval_model(d)
    assert 0 <= top1 <= 1 and np.isfinite(loss)


def test_opt_qp_changes_qps():
    rng = np.random.default_rng(4)
    d = {"a.weight": rng.normal(0, 0.1, (32, 32)).astype(np.float32),
         "b.weight": rng.normal(0, 0.01, (4, 4)).astype(np.float32)}
    mdl = nnr_model.NNRModel(d)
    params = mdl.init_model_from_dict(d)
    ad = approximator.init_approx_data(params, mdl.model_info, 2, 0)
    base = approximator.ApproxInfo(ad, mdl.model_info, "uniform", 0, -38,
                                   False, False, 10, 0.0)
    opt = approximator.ApproxInfo(ad, mdl.model_info, "uniform", 0, -38,
                                  True, False, 10, 0.0)
    assert base.approx_info["qp"] != opt.approx_info["qp"]


def test_grapher_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import grapher
    p = str(tmp_path / "result.txt")
    with open(p, "w") as f:
        f.write("psnr : [20.0, 21.0, nan, 23.0]\nloss : [0.1, 0.09, 0.08, oops]\n")
    data = grapher.read_file(p)
    assert grapher.check_anomalies(data["psnr"]) == [2]
    assert grapher.check_anomalies(data["loss"]) == [3]
    assert not grapher.sanity_checker(p)
    avg = grapher.average_every_step([1.0, 2.0, 3.0, 4.0], 2)
    np.testing.assert_allclose(avg, [1.5, 3.5])
    out = grapher.plot_data(p, window=1)
    assert os.path.exists(out)


def test_use_case_registry():
    from nnc_tpu.framework.use_cases import use_cases, DummyDataLoader
    assert "NERF_PYT" in use_cases and "NNR_TEF" in use_cases
    assert len(DummyDataLoader()) == 0
