"""Golden-bitstream case registry (shared by test_golden_bitstreams.py and
tools/regen_golden.py).

The bitstream layout is this implementation's own (docs/BITSTREAM.md), so
self-consistency is the only compatibility contract. These cases pin it:
each case deterministically builds an input model + codec config; the
committed fixtures under tests/golden/ hold the encoded bytes and the
expected decoded tensors. Any layout change breaks byte identity and MUST
bump hls.FORMAT_VERSION and regenerate fixtures (tools/regen_golden.py).

Coverage (VERDICT r2 Missing #1): uniform +/- DQ, codebook modes 1 and 2,
DC (G/H) blocks, BN blocks (folded), LSA scale companions, scan_order>0
with entry points, integer skip, OOB headers, and an MPS/LPS unit stream
with all four performance-map families.
"""
from __future__ import annotations

import numpy as np

GOLDEN_DIR_NAME = "golden"


def _mlp_dict(seed, layers=3, width=16, in_dim=8):
    rng = np.random.default_rng(seed)
    d = {}
    last = in_dim
    for i in range(layers):
        d[f"net.{i}.weight"] = rng.normal(
            0, 0.05, (width, last)).astype(np.float32)
        d[f"net.{i}.bias"] = rng.normal(0, 0.01, (width,)).astype(np.float32)
        last = width
    return d


def _block_map(d):
    bid, ptype = {}, {}
    for name in d:
        base = name.rsplit(".", 1)[0]
        if name.endswith("weight_scaling"):
            bid[name] = name.rsplit("_scaling", 1)[0].rsplit(".", 1)[0]
            ptype[name] = "weight.ls"
        elif name.endswith(".weight"):
            bid[name] = base
            ptype[name] = "weight"
        elif name.endswith(".bias"):
            bid[name] = base
            ptype[name] = "bias"
    return {"block_identifier": bid, "parameter_type": ptype}


# --------------------------------------------------------------------------
# Codec-level cases: (input_dict, kwargs for compression.compress)
# --------------------------------------------------------------------------
def _case_uniform_dq():
    d = _mlp_dict(101)
    return d, dict(qp=-20, use_dq=True,
                   block_id_and_param_type=_block_map(d))


def _case_uniform_nodq():
    return _mlp_dict(102), dict(qp=-28, use_dq=False)


def _case_codebook_m1():
    d = _mlp_dict(103, layers=2, width=12, in_dim=6)
    return d, dict(qp=-18, codebook_mode=1,
                   block_id_and_param_type=_block_map(d))


def _case_codebook_m2():
    d = _mlp_dict(104, layers=2, width=24, in_dim=16)
    return d, dict(qp=-24, codebook_mode=2,
                   block_id_and_param_type=_block_map(d))


def _case_dc_block():
    rng = np.random.default_rng(105)
    u = rng.normal(0, 0.3, (48, 4)).astype(np.float32)
    v = rng.normal(0, 0.3, (4, 40)).astype(np.float32)
    d = {"net.0.weight": u @ v,
         "net.0.bias": rng.normal(0, 0.01, (48,)).astype(np.float32)}
    return d, dict(qp=-24, codebook_mode=1, scan_order=1, decompose_rank=4,
                   block_id_and_param_type=_block_map(d))


def _case_bn_block():
    rng = np.random.default_rng(106)
    d = {
        "conv.weight": rng.normal(0, 0.1, (8, 4, 3, 3)).astype(np.float32),
        "bn.weight": (1 + rng.normal(0, 0.05, (8,))).astype(np.float32),
        "bn.bias": rng.normal(0, 0.01, (8,)).astype(np.float32),
        "bn.running_mean": rng.normal(0, 0.01, (8,)).astype(np.float32),
        "bn.running_var": (1 + rng.normal(0, 0.05, (8,))).astype(np.float32),
    }
    bm = {
        "block_identifier": {k: "conv" for k in d},
        "parameter_type": {
            "conv.weight": "weight", "bn.weight": "bn.gamma",
            "bn.bias": "bn.beta", "bn.running_mean": "bn.mean",
            "bn.running_var": "bn.var",
        },
    }
    return d, dict(qp=-24, bnf=True, block_id_and_param_type=bm)


def _case_lsa_scales():
    d = _mlp_dict(107, layers=2, width=16, in_dim=8)
    rng = np.random.default_rng(1070)
    for i in range(2):
        d[f"net.{i}.weight_scaling"] = (
            1 + rng.normal(0, 0.02, (16,))).astype(np.float32)
    return d, dict(qp=-22, block_id_and_param_type=_block_map(d))


def _case_codebook_companions():
    """Codebook-coded bias + LSA scale companions: the block NDU keeps its
    weight, offenders split into single-tensor NDUs (partial block split)."""
    d = _mlp_dict(110, layers=2, width=12, in_dim=6)
    rng = np.random.default_rng(1100)
    d["net.0.weight_scaling"] = (
        1 + rng.normal(0, 0.02, (12,))).astype(np.float32)
    return d, dict(qp=-18, codebook_mode=1,
                   block_id_and_param_type=_block_map(d))


def _case_scan_order_eps():
    rng = np.random.default_rng(108)
    d = {"w": rng.normal(0, 0.05, (64, 32)).astype(np.float32)}
    return d, dict(qp=-26, scan_order=1, use_dq=True)


def _case_int_skip():
    rng = np.random.default_rng(109)
    d = {"counts": np.arange(-6, 6, dtype=np.int32),
         "w": rng.normal(0, 0.1, (8, 8)).astype(np.float32)}
    return d, dict(qp=-24)


CODEC_CASES = {
    "uniform_dq": _case_uniform_dq,
    "uniform_nodq": _case_uniform_nodq,
    "codebook_m1": _case_codebook_m1,
    "codebook_m2": _case_codebook_m2,
    "dc_block": _case_dc_block,
    "bn_block": _case_bn_block,
    "lsa_scales": _case_lsa_scales,
    "codebook_companions": _case_codebook_companions,
    "scan_order_eps": _case_scan_order_eps,
    "int_skip": _case_int_skip,
}


def encode_codec_case(name):
    """Returns (bitstream bytes, reconstructed-parameter dict)."""
    from nnc_tpu import compression
    d, kwargs = CODEC_CASES[name]()
    bs = compression.compress(dict(d), bitstream_path=None, verbose=False,
                              return_bitstream=True, **kwargs)
    rec = compression.decompress(bytes(bs), verbose=False)
    return bytes(bs), rec


# --------------------------------------------------------------------------
# Unit-level case: MPS + LPS performance maps (no NDUs); pins the map and
# LPS layouts that the codec path never emits but must keep decoding.
# --------------------------------------------------------------------------
def _perf_maps(prefix):
    spm = {
        "sparsification_threshold": [0.25, 0.5],
        "non_zero_ratio": [0.9, 0.75],
        "spm_nn_accuracy": [0.71, 0.69],
        "spm_class_bitmask": [3, 1],
        "spm_nn_class_accuracy": [[0.5, 0.25], [0.125]],
    }
    ppm = {
        "pruning_ratio": [0.3],
        "ppm_nn_accuracy": [0.68],
        "ppm_class_bitmask": [2],
        "ppm_nn_class_accuracy": [[0.5, 0.75]],
    }
    upm = {
        "reshaped_tensor_dimensions": [[4, 8]],
        "super_block_dimensions": [[2, 2]],
        "block_dimensions": [[1, 2]],
        "unification_threshold": [0.1],
        "upm_nn_accuracy": [0.66],
        "upm_count_classes": [4],
        "upm_class_bitmask": [2],
        "upm_nn_class_accuracy": [[0.5, 0.25]],
    }
    out = {
        f"{prefix}_sparsification_performance_map": spm,
        f"{prefix}_pruning_performance_map": ppm,
        f"{prefix}_unification_performance_map": upm,
    }
    if prefix == "mps":
        out["mps_decomposition_performance_map"] = {
            "mse_threshold": [0.01],
            "dpm_nn_accuracy": [0.64],
            "nn_reduction_ratio": [0.5],
            "dpm_nn_class_accuracy": [[0.5, 0.25, 0.125]],
        }
    return out


def encode_oob_case():
    """Fully out-of-band NDU headers (input_parameters_present_flag = 0):
    the whole input-params block (dims, unary length, cpt) lives in the
    compile_ndu_oob dict; the stream alone is not decodable. Returns
    (bitstream bytes, external model_info dict, oob dict, decoded int
    parameter dict) — the ext/oob dicts are deterministic and rebuilt at
    verification time."""
    from nnc_tpu import coder, hls
    from nnc_tpu.core import approximator, model as nnr_model

    d = _mlp_dict(909, layers=2, width=24, in_dim=16)
    mdl = nnr_model.NNRModel(d)
    params = mdl.init_model_from_dict(d)
    model_info = mdl.model_info
    model_info["topology_storage_format"] = \
        hls.TopologyStorageFormat.NNR_TPL_PYT
    approx_data = approximator.init_approx_data(params, model_info, 2, 0)
    ap_info = approximator.ApproxInfo(
        approx_data, model_info, "uniform", 0, -24, False, False, 10, 0.0)
    ad_enc = approximator.approx(ap_info.approx_info, model_info,
                                 approx_data, verbose=False)
    enc_info = {"cabac_unary_length_minus1": 10, "param_opt_flag": 0}
    oob = coder.compile_ndu_oob(tensor_dims=True,
                                cabac_unary_length_minus1=10,
                                compressed_parameter_types=0)
    bs = coder.encode(enc_info, model_info, ad_enc, ndu_oob=oob)
    ext = {"parameter_dimensions": dict(model_info["parameter_dimensions"]),
           "cabac_unary_length_minus1": 10}
    _info, ad_dec = coder.decode(bytes(bs), model_info=ext, ndu_oob=oob)
    return bytes(bs), ext, oob, dict(ad_dec["parameters"])


def encode_units_case():
    """Returns (bitstream bytes, surfaced model_info flags/maps)."""
    from nnc_tpu import coder, hls
    from nnc_tpu.hls import syntax

    bs = bytearray()
    bs += syntax.encode_unit(coder.compile_start_unit(0))
    mps = {
        "nnr_unit_type": hls.NnrUnitType.NNR_MPS,
        "partial_data_counter_present_flag": 0,
        "independently_decodable_flag": 1,
        "topology_carriage_flag": 0,
        "mps_sparsification_flag": 1,
        "mps_pruning_flag": 1,
        "mps_unification_flag": 1,
        "mps_decomposition_performance_map_flag": 1,
        "mps_quantization_method_flags": hls.QuantizationMethodFlags.NNR_QSU,
        "mps_topology_indexed_reference_flag": 0,
        "mps_qp_density": 2,
        "mps_quantization_parameter": 0,
    }
    mps.update(_perf_maps("mps"))
    bs += syntax.encode_unit(mps)
    lps = {
        "nnr_unit_type": hls.NnrUnitType.NNR_LPS,
        "partial_data_counter_present_flag": 0,
        "independently_decodable_flag": 1,
        "lps_self_contained_flag": 1,
        "lps_sparsification_flag": 1,
        "lps_pruning_flag": 1,
        "lps_unification_flag": 1,
        "lps_quantization_method_flags": 1,
        "lps_qp_density": 2,
        "lps_quantization_parameter": -14,
    }
    lps.update(_perf_maps("lps"))
    bs += syntax.encode_unit(lps)

    model_info, _ad = coder.decode(bytes(bs))
    surfaced = {"flags": model_info["performance_map_flags"],
                "maps": model_info["performance_maps"]}
    return bytes(bs), surfaced
