"""Low-rank (DC / G,H) decomposition: producer + bitstream round trip."""
import numpy as np
import pytest

import nnc_tpu
from nnc_tpu.core import approximator, model as nnr_model
from nnc_tpu import hls


def low_rank_dict(rng, out=24, inner=16, r_true=3):
    g = rng.normal(0, 0.3, (out, r_true)).astype(np.float32)
    h = rng.normal(0, 0.3, (r_true, inner)).astype(np.float32)
    return {
        "layer.weight": (g @ h).astype(np.float32),
        "layer.bias": rng.normal(0, 0.01, (out,)).astype(np.float32),
    }


def block_map(d):
    return {"block_identifier": {"layer.weight": "layer",
                                 "layer.bias": "layer"},
            "parameter_type": {"layer.weight": "weight",
                               "layer.bias": "bias"}}


def test_decompose_producer():
    rng = np.random.default_rng(0)
    d = low_rank_dict(rng)
    mdl = nnr_model.NNRModel(d)
    params = mdl.init_model_from_dict(d)
    nnr_model.set_block_id_and_param_type(mdl.model_info, block_map(d))
    ad = approximator.init_approx_data(params, mdl.model_info, 2, 0)
    approximator.decompose_params(mdl.model_info, ad, energy=0.999)
    assert "layer.weight_G" in ad["parameters"]
    assert "layer.weight_H" in ad["parameters"]
    assert "layer.weight" not in ad["parameters"]
    cpt = ad["compressed_parameter_types"]["layer"]
    assert cpt & hls.BlockParameterTypes.NNR_CPT_DC
    r = ad["decomposition_rank"]["layer"]
    assert r <= 4  # true rank 3 (+ numerical slack)
    g, h = ad["parameters"]["layer.weight_G"], ad["parameters"]["layer.weight_H"]
    np.testing.assert_allclose(g @ h, d["layer.weight"], atol=1e-4)


def test_decomposed_bitstream_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    d = low_rank_dict(rng)
    bs = str(tmp_path / "dc.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=-40,
                     block_id_and_param_type=block_map(d),
                     decompose_energy=0.999, verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    # recompose restored the full weight under its original name/shape
    assert set(rec.keys()) == set(d.keys())
    assert rec["layer.weight"].shape == d["layer.weight"].shape
    assert np.abs(rec["layer.weight"] - d["layer.weight"]).max() < 5e-3
    # and the factorized bitstream is smaller than the dense one
    bs2 = str(tmp_path / "dense.nnc")
    nnc_tpu.compress(d, bitstream_path=bs2, qp=-40,
                     block_id_and_param_type=block_map(d), verbose=False)
    import os
    assert os.path.getsize(bs) < os.path.getsize(bs2)


def test_decomposed_codebook_mode2_pairs_stay_consistent(tmp_path):
    """G/H pairs share one codebook_present_flag in the NDU syntax, so the
    mode-2 RD choice must be joint — a diverging per-tensor choice made the
    unit unencodable (found by fuzzing: AssertionError in compile_ndu)."""
    rng = np.random.default_rng(3)
    d = low_rank_dict(rng)
    for seed in range(4):
        rng2 = np.random.default_rng(seed)
        d2 = {k: (v * (1 + 0.5 * rng2.random())).astype(np.float32)
              for k, v in d.items()}
        bs = str(tmp_path / f"cb{seed}.nnc")
        nnc_tpu.compress(d2, bitstream_path=bs, qp=-27,
                         block_id_and_param_type=block_map(d2),
                         decompose_energy=0.999, codebook_mode=2,
                         scan_order=1, verbose=False)
        rec = nnc_tpu.decompress(bs, verbose=False)
        assert rec["layer.weight"].shape == d2["layer.weight"].shape
        assert np.isfinite(rec["layer.weight"]).all()


def test_decompose_skips_when_not_worth_it():
    rng = np.random.default_rng(2)
    d = {"layer.weight": rng.normal(0, 0.3, (8, 8)).astype(np.float32),
         "layer.bias": np.zeros(8, np.float32)}
    mdl = nnr_model.NNRModel(d)
    params = mdl.init_model_from_dict(d)
    nnr_model.set_block_id_and_param_type(mdl.model_info, block_map(d))
    ad = approximator.init_approx_data(params, mdl.model_info, 2, 0)
    approximator.decompose_params(mdl.model_info, ad, energy=0.999)
    # full-rank 8x8: factorization bigger than dense -> left untouched
    assert "layer.weight" in ad["parameters"]
