import numpy as np
import pytest

from nnc_tpu import coder, hls
from nnc_tpu.core import approximator, common, model as nnr_model


def make_mlp_dict(rng, layers=3, width=16, in_dim=8):
    """A small MLP state dict (torch-like naming/layout)."""
    d = {}
    last = in_dim
    for i in range(layers):
        d[f"net.{i}.weight"] = rng.normal(0, 0.05, (width, last)).astype(np.float32)
        d[f"net.{i}.bias"] = rng.normal(0, 0.01, (width,)).astype(np.float32)
        last = width
    return d


def make_block_map(param_dict):
    bid, ptype = {}, {}
    for name in param_dict:
        base = name.rsplit(".", 1)[0]
        if name.endswith(".weight"):
            bid[name] = base
            ptype[name] = "weight"
        elif name.endswith(".bias"):
            bid[name] = base
            ptype[name] = "bias"
        elif name.endswith("weight_scaling"):
            bid[name] = base
            ptype[name] = "weight.ls"
    return {"block_identifier": bid, "parameter_type": ptype}


def compress_params(param_dict, qp=-32, qp_density=2, use_dq=True,
                    scan_order=0, codebook_mode=0, block_map=None,
                    lsa_params=None):
    nnc_mdl = nnr_model.NNRModel(param_dict)
    params = nnc_mdl.init_model_from_dict(param_dict)
    model_info = nnc_mdl.model_info
    model_info["topology_storage_format"] = hls.TopologyStorageFormat.NNR_TPL_PYT
    if block_map:
        nnr_model.set_block_id_and_param_type(model_info, block_map)

    approx_data = approximator.init_approx_data(params, model_info, qp_density,
                                                scan_order)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", codebook_mode, qp, False,
        not use_dq, 10, 0.0)
    if lsa_params:
        approximator.set_lsa(model_info, approx_data, lsa_params)
        ap_info.set_ls_qps(model_info, approx_data, 1 if use_dq else 0)

    approx_data_enc = approximator.approx(ap_info.approx_info, model_info,
                                          approx_data, verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    bitstream = coder.encode(enc_info, model_info, approx_data_enc)
    return bitstream, model_info, approx_data_enc


@pytest.mark.parametrize("use_dq", [False, True])
@pytest.mark.parametrize("with_blocks", [False, True])
def test_roundtrip_uniform(use_dq, with_blocks):
    rng = np.random.default_rng(0)
    d = make_mlp_dict(rng)
    block_map = make_block_map(d) if with_blocks else None
    qp, qpd = -30, 2
    bitstream, model_info, ad_enc = compress_params(
        d, qp=qp, qp_density=qpd, use_dq=use_dq, block_map=block_map)

    dec_info, ad_dec = coder.decode(bitstream)
    assert set(ad_dec["parameters"].keys()) == set(d.keys())
    # decoded int32 levels match the encoder's exactly
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name
        assert int(ad_dec["qp"][name]) == int(ad_enc["qp"][name])

    approximator.rec(ad_dec)
    delta_w = common.get_stepsize_from_qp(qp, qpd)
    for name in d:
        err = np.abs(ad_dec["parameters"][name] - d[name])
        is_weight = dec_info["parameter_type"][name] == "weight"
        bound = delta_w if is_weight else common.get_stepsize_from_qp(
            qp - (2 << qpd), qpd)
        assert err.max() <= bound + 1e-7, name


def test_roundtrip_preserves_order_and_dims():
    rng = np.random.default_rng(1)
    d = make_mlp_dict(rng)
    bitstream, _, _ = compress_params(d, block_map=make_block_map(d))
    dec_info, ad_dec = coder.decode(bitstream)
    approximator.rec(ad_dec)
    ad_final = approximator.recompose_params(dec_info, ad_dec)
    assert list(ad_final["parameters"].keys()) == list(d.keys())
    for name in d:
        assert ad_final["parameters"][name].shape == d[name].shape


def test_roundtrip_with_lsa_scales():
    rng = np.random.default_rng(2)
    d = make_mlp_dict(rng)
    lsa = {f"net.{i}.weight_scaling":
           (1 + rng.normal(0, 0.01, (16,))).astype(np.float32)
           for i in range(3)}
    d.update(lsa)  # scales live in the parameter dict from the start
    block_map = make_block_map(d)

    bitstream, model_info, _ = compress_params(d, block_map=block_map,
                                               lsa_params=lsa)
    dec_info, ad_dec = coder.decode(bitstream)
    ls_names = [n for n in ad_dec["parameters"] if n.endswith("_scaling")]
    assert len(ls_names) == 3
    approximator.rec(ad_dec)
    # apply_lsa folds scales into weights and drops the ls params
    approximator.apply_lsa(dec_info, ad_dec)
    assert not any(n.endswith("_scaling") for n in ad_dec["parameters"])
    for i in range(3):
        w = ad_dec["parameters"][f"net.{i}.weight"]
        expect = d[f"net.{i}.weight"] * lsa[f"net.{i}.weight_scaling"][:, None]
        assert np.abs(w - expect).max() < 0.02


def test_roundtrip_scan_order_entry_points():
    rng = np.random.default_rng(3)
    d = {"w": rng.normal(0, 0.05, (64, 32)).astype(np.float32)}
    bitstream, _, ad_enc = compress_params(d, scan_order=1)
    dec_info, ad_dec = coder.decode(bitstream)
    assert np.array_equal(ad_dec["parameters"]["w"], ad_enc["parameters"]["w"])
    assert int(ad_dec["scan_order"]["w"]) == 1


def test_roundtrip_codebook_mode1():
    rng = np.random.default_rng(4)
    d = make_mlp_dict(rng, layers=2, width=8, in_dim=4)
    bitstream, _, ad_enc = compress_params(d, qp=-20, codebook_mode=1,
                                           block_map=make_block_map(d))
    dec_info, ad_dec = coder.decode(bitstream)
    # weights decoded via codebook
    assert ad_dec["approx_method"]["net.0.weight"] == "codebook"
    approximator.rec(ad_dec)
    delta = common.get_stepsize_from_qp(-20 - 4, 2)  # dq-equivalent offset
    for i in range(2):
        err = np.abs(ad_dec["parameters"][f"net.{i}.weight"] -
                     d[f"net.{i}.weight"])
        assert err.max() <= delta / 2 + 1e-7


def test_roundtrip_int_skip():
    d = {"counts": np.arange(-5, 5, dtype=np.int32),
         "w": np.random.default_rng(5).normal(0, 0.1, (8, 8)).astype(np.float32)}
    bitstream, _, _ = compress_params(d)
    dec_info, ad_dec = coder.decode(bitstream)
    assert ad_dec["approx_method"]["counts"] == "skip"
    approximator.rec(ad_dec)
    assert np.array_equal(ad_dec["parameters"]["counts"], d["counts"])


def test_compression_ratio_reasonable():
    rng = np.random.default_rng(6)
    d = make_mlp_dict(rng, layers=4, width=64, in_dim=64)
    raw = sum(v.nbytes for v in d.values())
    bitstream, _, _ = compress_params(d, qp=-24, block_map=make_block_map(d))
    assert len(bitstream) < raw / 3  # should compress far below fp32


@pytest.mark.parametrize("codebook_mode", [0, 1, 2])
@pytest.mark.parametrize("use_dq", [False, True])
@pytest.mark.parametrize("scan_order", [0, 1])
@pytest.mark.parametrize("with_blocks", [False, True])
def test_roundtrip_matrix(codebook_mode, use_dq, scan_order, with_blocks):
    """Exhaustive config cross product; guards the EP-list dq desync that a
    codebook weight + DQ companions + scan_order>0 block once triggered."""
    rng = np.random.default_rng(7)
    d = make_mlp_dict(rng, layers=2, width=40, in_dim=24)
    block_map = make_block_map(d) if with_blocks else None
    bitstream, _, ad_enc = compress_params(
        d, qp=-24, use_dq=use_dq, scan_order=scan_order,
        codebook_mode=codebook_mode, block_map=block_map)
    dec_info, ad_dec = coder.decode(bitstream)
    assert set(ad_dec["parameters"].keys()) == set(d.keys())
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name
        assert ad_dec["approx_method"][name] == \
            ad_enc["approx_method"][name], name
    approximator.rec(ad_dec)
    for name in d:
        assert np.isfinite(ad_dec["parameters"][name]).all(), name


@pytest.mark.parametrize("scan_order", [0, 1])
def test_roundtrip_dc_block_with_codebook_and_dq(scan_order):
    """DC (G/H) factors + codebook + DQ companions + entry points."""
    rng = np.random.default_rng(8)
    # low-rank-ish weight so decompose_params keeps the factorization
    u = rng.normal(0, 0.3, (48, 4)).astype(np.float32)
    v = rng.normal(0, 0.3, (4, 40)).astype(np.float32)
    d = {"net.0.weight": u @ v,
         "net.0.bias": rng.normal(0, 0.01, (48,)).astype(np.float32)}
    block_map = make_block_map(d)

    nnc_mdl = nnr_model.NNRModel(d)
    params = nnc_mdl.init_model_from_dict(d)
    model_info = nnc_mdl.model_info
    model_info["topology_storage_format"] = hls.TopologyStorageFormat.NNR_TPL_PYT
    nnr_model.set_block_id_and_param_type(model_info, block_map)
    approx_data = approximator.init_approx_data(params, model_info, 2,
                                                scan_order)
    approximator.decompose_params(model_info, approx_data, rank=4)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 1, -24, False, False, 10, 0.0)
    ad_enc = approximator.approx(ap_info.approx_info, model_info, approx_data,
                                 verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    bitstream = coder.encode(enc_info, model_info, ad_enc)

    dec_info, ad_dec = coder.decode(bitstream)
    approximator.rec(ad_dec)
    ad_final = approximator.recompose_params(dec_info, ad_dec)
    assert ad_final["parameters"]["net.0.weight"].shape == (48, 40)
    err = np.abs(ad_final["parameters"]["net.0.weight"] - d["net.0.weight"])
    assert err.max() < 0.1


def test_bnf_with_codebook_compresses():
    """fold_bn must assign qp/dq to its created delta/alpha tensors even with
    codebook_mode>0 (companions are always uniform-coded here)."""
    from nnc_tpu import compression
    rng = np.random.default_rng(10)
    d = {
        "conv.weight": rng.normal(0, 0.1, (8, 4, 3, 3)).astype(np.float32),
        "bn.weight": (1 + rng.normal(0, 0.05, (8,))).astype(np.float32),
        "bn.bias": rng.normal(0, 0.01, (8,)).astype(np.float32),
        "bn.running_mean": rng.normal(0, 0.01, (8,)).astype(np.float32),
        "bn.running_var": (1 + rng.normal(0, 0.05, (8,))).astype(np.float32),
    }
    block_map = {
        "block_identifier": {k: "conv" for k in d},
        "parameter_type": {
            "conv.weight": "weight", "bn.weight": "bn.gamma",
            "bn.bias": "bn.beta", "bn.running_mean": "bn.mean",
            "bn.running_var": "bn.var",
        },
    }
    bs = compression.compress(d, bitstream_path=None, qp=-24, bnf=True,
                              codebook_mode=1, block_id_and_param_type=block_map,
                              verbose=False, return_bitstream=True)
    rec, _ = compression.decompress(bs, verbose=False,
                                    return_model_information=True)
    # pure-bitstream decode of a BN-folded model yields the folded form
    # (BN restoration needs external model_info, matching the reference)
    assert "conv.weight" in rec
    ls = [n for n in rec if n.endswith("_scaling")]
    assert not ls  # apply_lsa folded the alpha scales into the weight
    for v in rec.values():
        assert np.isfinite(v).all()
    # folded conv output must approximate the original conv+BN affine
    g = d["bn.weight"] / np.sqrt(d["bn.running_var"] + 1e-5)
    expect_w = d["conv.weight"] * g[:, None, None, None]
    assert np.abs(rec["conv.weight"] - expect_w).max() < 0.05


def test_parallel_ndu_decode_matches_serial():
    rng = np.random.default_rng(9)
    d = make_mlp_dict(rng, layers=4, width=24, in_dim=12)
    bitstream, _, _ = compress_params(d, block_map=make_block_map(d))
    mi1, ad1 = coder.decode(bitstream)
    mi2, ad2 = coder.decode(bitstream, num_workers=4)
    assert mi1["parameter_index"] == mi2["parameter_index"]
    assert mi1["parameter_type"] == mi2["parameter_type"]
    for name in ad1["parameters"]:
        assert np.array_equal(ad1["parameters"][name],
                              ad2["parameters"][name]), name
        assert int(ad1["qp"].get(name, 0)) == int(ad2["qp"].get(name, 0))


def test_oob_ndu_headers_roundtrip():
    """Out-of-band NDU parameters: dims/unary-length omitted from the
    bitstream; decode requires (and uses) external model information.
    (reference: compile_ndu_oob, syntax_compiler.py:44-63)"""
    rng = np.random.default_rng(30)
    d = make_mlp_dict(rng, layers=2, width=24, in_dim=16)
    nnc_mdl = nnr_model.NNRModel(d)
    params = nnc_mdl.init_model_from_dict(d)
    model_info = nnc_mdl.model_info
    model_info["topology_storage_format"] = hls.TopologyStorageFormat.NNR_TPL_PYT

    approx_data = approximator.init_approx_data(params, model_info, 2, 0)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 0, -24, False, False, 10, 0.0)
    ad_enc = approximator.approx(ap_info.approx_info, model_info, approx_data,
                                 verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    bs_inband = coder.encode(enc_info, model_info, ad_enc)
    oob = coder.compile_ndu_oob(tensor_dims=True,
                                cabac_unary_length_minus1=10)
    bs_oob = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    assert len(bs_oob) < len(bs_inband)

    # decode without external info must fail loudly
    with pytest.raises(ValueError, match="out-of-band"):
        coder.decode(bs_oob)

    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    dec_info, ad_dec = coder.decode(bs_oob, model_info=ext)
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name


def test_oob_ndu_headers_block_units():
    """OOB dims with BLOCK NDUs: the weight's dims come from the FIRST
    topology element (companions follow it)."""
    rng = np.random.default_rng(31)
    d = make_mlp_dict(rng, layers=2, width=24, in_dim=16)
    block_map = make_block_map(d)
    nnc_mdl = nnr_model.NNRModel(d)
    params = nnc_mdl.init_model_from_dict(d)
    model_info = nnc_mdl.model_info
    model_info["topology_storage_format"] = hls.TopologyStorageFormat.NNR_TPL_PYT
    nnr_model.set_block_id_and_param_type(model_info, block_map)
    approx_data = approximator.init_approx_data(params, model_info, 2, 0)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 0, -24, False, False, 10, 0.0)
    ad_enc = approximator.approx(ap_info.approx_info, model_info, approx_data,
                                 verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(tensor_dims=True,
                                cabac_unary_length_minus1=10)
    bs = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    dec_info, ad_dec = coder.decode(bs, model_info=ext)
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name


def _approx_for(d, block_map=None, scan_order=0, decompose_rank=None,
                qp=-24):
    nnc_mdl = nnr_model.NNRModel(d)
    params = nnc_mdl.init_model_from_dict(d)
    model_info = nnc_mdl.model_info
    model_info["topology_storage_format"] = hls.TopologyStorageFormat.NNR_TPL_PYT
    if block_map:
        nnr_model.set_block_id_and_param_type(model_info, block_map)
    approx_data = approximator.init_approx_data(params, model_info, 2,
                                                scan_order)
    if decompose_rank:
        approximator.decompose_params(model_info, approx_data,
                                      rank=decompose_rank)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 0, qp, False, False, 10, 0.0)
    ad_enc = approximator.approx(ap_info.approx_info, model_info, approx_data,
                                 verbose=False)
    return model_info, ad_enc


def test_full_oob_ipp0_roundtrip():
    """Fully out-of-band NDU headers (input_parameters_present_flag = 0,
    reference: syntax_compiler.py:44-63 + the latent ipp=0 decode branch,
    hls/__init__.py:405-418): cpt/DC fields are externalized too; the
    decoder takes the same compile_ndu_oob dict."""
    rng = np.random.default_rng(32)
    d = make_mlp_dict(rng, layers=2, width=24, in_dim=16)
    model_info, ad_enc = _approx_for(d)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}

    bs_inband = coder.encode(enc_info, model_info, ad_enc)
    sub = coder.compile_ndu_oob(tensor_dims=True,
                                cabac_unary_length_minus1=10)
    bs_sub = coder.encode(enc_info, model_info, ad_enc, ndu_oob=sub)
    full = coder.compile_ndu_oob(tensor_dims=True,
                                 cabac_unary_length_minus1=10,
                                 compressed_parameter_types=0)
    assert full["input_parameters_present_flag"] == 0
    bs_full = coder.encode(enc_info, model_info, ad_enc, ndu_oob=full)
    assert len(bs_full) <= len(bs_sub) < len(bs_inband)

    # decode without the OOB dict must fail loudly
    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    with pytest.raises(ValueError, match="fully out-of-band"):
        coder.decode(bs_full, model_info=ext)

    dec_info, ad_dec = coder.decode(bs_full, model_info=ext, ndu_oob=full)
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name


def test_full_oob_ipp0_single_tensor_no_model_info():
    """With explicit tensor_dims in the OOB dict, a single-tensor stream
    decodes from the dict ALONE (no external parameter_dimensions)."""
    rng = np.random.default_rng(33)
    d = {"w": rng.normal(0, 0.05, (16, 12)).astype(np.float32)}
    model_info, ad_enc = _approx_for(d)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(tensor_dims=[16, 12],
                                cabac_unary_length_minus1=10,
                                compressed_parameter_types=0)
    bs = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    dec_info, ad_dec = coder.decode(bs, ndu_oob=oob)
    assert np.array_equal(ad_dec["parameters"]["w"], ad_enc["parameters"]["w"])


def test_full_oob_ipp0_block_units():
    """Block NDUs under full OOB: works when cpt is stream-global (every
    block here is weight+bias -> NNR_CPT_BI)."""
    rng = np.random.default_rng(34)
    d = make_mlp_dict(rng, layers=2, width=24, in_dim=16)
    model_info, ad_enc = _approx_for(d, block_map=make_block_map(d))
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(
        tensor_dims=True, cabac_unary_length_minus1=10,
        compressed_parameter_types=int(hls.BlockParameterTypes.NNR_CPT_BI))
    bs = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    dec_info, ad_dec = coder.decode(bs, model_info=ext, ndu_oob=oob)
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name


def test_full_oob_ipp0_dc_block():
    """Full OOB on a DC-decomposed block: decomposition_rank/g_number_of_rows
    ride in the OOB dict (the reference's only admitted ipp=0 shape)."""
    rng = np.random.default_rng(35)
    u = rng.normal(0, 0.3, (48, 4)).astype(np.float32)
    v = rng.normal(0, 0.3, (4, 40)).astype(np.float32)
    d = {"net.0.weight": u @ v,
         "net.0.bias": rng.normal(0, 0.01, (48,)).astype(np.float32)}
    model_info, ad_enc = _approx_for(d, block_map=make_block_map(d),
                                     decompose_rank=4)
    cpt = int(ad_enc["compressed_parameter_types"]["net.0"])
    assert cpt & hls.BlockParameterTypes.NNR_CPT_DC
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(
        tensor_dims=True, cabac_unary_length_minus1=10,
        compressed_parameter_types=cpt,
        decomposition_parameter_dict={
            "decomposition_rank": int(
                ad_enc["decomposition_rank"]["net.0"]),
            "g_number_of_rows": int(ad_enc["g_number_of_rows"]["net.0"])})
    assert oob["input_parameters_present_flag"] == 0
    bs = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    dec_info, ad_dec = coder.decode(bs, model_info=ext, ndu_oob=oob)
    approximator.rec(ad_dec)
    ad_final = approximator.recompose_params(dec_info, ad_dec)
    assert ad_final["parameters"]["net.0.weight"].shape == (48, 40)


def test_full_oob_ipp0_heterogeneous_cpt_raises():
    """One OOB dict describes every NDU: encoding a stream whose units
    disagree with it must fail loudly, not decode wrong."""
    rng = np.random.default_rng(36)
    d = make_mlp_dict(rng, layers=2, width=24, in_dim=16)
    model_info, ad_enc = _approx_for(d, block_map=make_block_map(d))
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(tensor_dims=True,
                                cabac_unary_length_minus1=10,
                                compressed_parameter_types=0)
    with pytest.raises(ValueError, match="stream-global"):
        coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)


def test_parallel_ndu_encode_matches_serial():
    rng = np.random.default_rng(14)
    d = make_mlp_dict(rng, layers=4, width=24, in_dim=12)
    from nnc_tpu import compression
    bs1 = compression.compress(dict(d), bitstream_path=None, qp=-24,
                               block_id_and_param_type=make_block_map(d),
                               verbose=False, return_bitstream=True)
    bs2 = compression.compress(dict(d), bitstream_path=None, qp=-24,
                               block_id_and_param_type=make_block_map(d),
                               verbose=False, return_bitstream=True,
                               num_workers=4)
    assert bs1 == bs2  # byte-identical regardless of worker count


def test_roundtrip_codebook_companions_partial_split():
    """Mode-1 codebook applies to companions too (reference codebook.py:
    205-208); un-groupable companions split into single-tensor NDUs while
    the block keeps its weight + remaining members (partial block split),
    and a split LSA scale still folds into its weight on decompress."""
    from nnc_tpu import compression
    rng = np.random.default_rng(77)
    d = make_mlp_dict(rng, layers=2, width=12, in_dim=6)
    d["net.0.weight_scaling"] = (
        1 + rng.normal(0, 0.02, (12,))).astype(np.float32)
    bs = compression.compress(
        dict(d), bitstream_path=None, verbose=False, return_bitstream=True,
        qp=-18, codebook_mode=1, block_id_and_param_type=make_block_map(d))
    _mi, ad = coder.decode(bytes(bs))
    # every to_approximate tensor (bias + LSA scale included) is codebook
    for name in d:
        assert ad["approx_method"][name] == "codebook", name
        assert name in ad["codebooks"], name
    # the partial split masked the companions' cpt bits off the block NDU
    for cpt in ad["compressed_parameter_types"].values():
        assert cpt & hls.BlockParameterTypes.NNR_CPT_BI == 0
        assert cpt & hls.BlockParameterTypes.NNR_CPT_LS == 0
    rec = compression.decompress(bytes(bs), verbose=False)
    assert "net.0.weight_scaling" not in rec  # folded, not surfaced
    step = common.get_stepsize_from_qp(-18, 2)
    expected = d["net.0.weight"] * d["net.0.weight_scaling"].reshape(-1, 1)
    assert np.abs(rec["net.0.weight"] - expected).max() < 2 * step
    for name in ("net.0.bias", "net.1.bias"):
        assert np.abs(rec[name] - d[name]).max() < 2 * step


def test_roundtrip_block_dq_mismatch_splits_member():
    """A companion with a dq_flag different from its block codes in its own
    NDU (the block header has one dq flag); values still round-trip."""
    rng = np.random.default_rng(78)
    d = make_mlp_dict(rng, layers=2, width=16, in_dim=8)
    nnc_mdl = nnr_model.NNRModel(d)
    params = nnc_mdl.init_model_from_dict(d)
    model_info = nnc_mdl.model_info
    nnr_model.set_block_id_and_param_type(model_info, make_block_map(d))
    approx_data = approximator.init_approx_data(params, model_info, 2, 0)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 0, -24, True, False, 10, 0.0)
    ap_info.approx_info["dq_flag"]["net.0.bias"] = 0  # mismatch vs dq=1
    ad_enc = approximator.approx(ap_info.approx_info, model_info,
                                 approx_data, verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    bs = coder.encode(enc_info, model_info, ad_enc)
    _mi, ad_dec = coder.decode(bs)
    assert int(ad_dec["dq_flag"]["net.0.bias"]) == 0
    assert int(ad_dec["dq_flag"]["net.0.weight"]) == 1
    for name in d:
        assert np.array_equal(ad_dec["parameters"][name],
                              ad_enc["parameters"][name]), name
