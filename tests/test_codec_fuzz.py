"""Property/fuzz tests: random parameter dicts must round-trip the codec."""
import numpy as np
import pytest

import nnc_tpu
from nnc_tpu import compression, hls
from nnc_tpu.core import common
from nnc_tpu.hls import syntax


def random_param_dict(rng, case):
    """Assorted shapes/dtypes/distributions."""
    d = {}
    n_tensors = int(rng.integers(1, 6))
    for t in range(n_tensors):
        kind = rng.integers(0, 5)
        name = f"m{case}.l{t}.weight" if kind != 3 else f"m{case}.l{t}.bias"
        if kind == 0:  # dense-ish gaussian matrix
            d[name] = rng.normal(0, 10 ** rng.uniform(-3, 0),
                                 (int(rng.integers(1, 40)),
                                  int(rng.integers(1, 40)))).astype(np.float32)
        elif kind == 1:  # sparse
            a = np.zeros((int(rng.integers(2, 30)), int(rng.integers(2, 30))),
                         np.float32)
            mask = rng.random(a.shape) < 0.1
            a[mask] = rng.normal(0, 1, mask.sum())
            d[name] = a
        elif kind == 2:  # constant / zeros
            d[name] = np.full((int(rng.integers(1, 20)),
                               int(rng.integers(1, 20))),
                              float(rng.choice([0.0, 1.0, -0.5])), np.float32)
        elif kind == 3:  # 1-D
            d[name] = rng.normal(0, 0.1,
                                 (int(rng.integers(1, 50)),)).astype(np.float32)
        else:  # 3-D conv-like
            d[name] = rng.normal(0, 0.05, (int(rng.integers(1, 8)),
                                           int(rng.integers(1, 8)),
                                           3)).astype(np.float32)
    return d


@pytest.mark.parametrize("case", range(8))
def test_fuzz_roundtrip(case, tmp_path):
    rng = np.random.default_rng(case)
    d = random_param_dict(rng, case)
    qp = int(rng.integers(-45, -10))
    use_dq = bool(rng.integers(0, 2))
    scan = int(rng.choice([0, 0, 1]))
    bs = str(tmp_path / "f.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=qp, use_dq=use_dq,
                     scan_order=scan, verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    assert set(rec.keys()) == set(d.keys())
    qpd = 2
    for name, orig in d.items():
        assert rec[name].shape == orig.shape
        # nonweight params use qp - (2<<qpd); weights use qp; error bounded
        # by the coarser of the two stepsizes (DQ Viterbi may exceed delta/2
        # locally, bounded by delta)
        bound = common.get_stepsize_from_qp(qp, qpd)
        assert np.abs(rec[name] - orig).max() <= bound + 1e-6, name


def test_fuzz_scalars_and_singletons(tmp_path):
    d = {"a": np.float32(3.25).reshape(()), "b": np.ones((1,), np.float32),
         "w": np.eye(3, dtype=np.float32)}
    bs = str(tmp_path / "s.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=-38, verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    assert abs(float(rec["a"][0]) - 3.25) < 1e-3
    assert rec["w"].shape == (3, 3)


def test_empty_like_values(tmp_path):
    d = {"w": np.zeros((4, 4), np.float32)}
    bs = str(tmp_path / "z.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=-38, verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    assert np.all(rec["w"] == 0)


def test_codebook_mode2_rd_choice(tmp_path):
    """mode 2 picks codebook vs uniform per tensor by coded size."""
    rng = np.random.default_rng(0)
    # few distinct values -> codebook wins for this tensor
    few = rng.choice([-0.3, 0.0, 0.4], size=(32, 32),
                     p=[0.2, 0.6, 0.2]).astype(np.float32)
    d = {"few.weight": few,
         "dense.weight": rng.normal(0, 0.1, (32, 32)).astype(np.float32)}
    bs = str(tmp_path / "cb2.nnc")
    nnc_tpu.compress(d, bitstream_path=bs, qp=-30, codebook_mode=2,
                     verbose=False)
    rec = nnc_tpu.decompress(bs, verbose=False)
    assert np.abs(rec["few.weight"] - few).max() < 0.01


def _spm(n=2):
    return {"sparsification_threshold": [0.1 * (i + 1) for i in range(n)],
            "non_zero_ratio": [0.5] * n,
            "spm_nn_accuracy": [0.9] * n,
            "spm_class_bitmask": [3] * n,
            "spm_nn_class_accuracy": [[0.8, 0.7]] * n}


def _make_lps_unit():
    return {
        "nnr_unit_type": hls.NnrUnitType.NNR_LPS,
        "partial_data_counter_present_flag": 0,
        "independently_decodable_flag": 1,
        "lps_self_contained_flag": 1,
        "lps_sparsification_flag": 1,
        "lps_pruning_flag": 0,
        "lps_unification_flag": 0,
        "lps_quantization_method_flags": 1,
        "lps_qp_density": 2,
        "lps_quantization_parameter": -20,
        "lps_sparsification_performance_map": _spm(),
    }


def test_lps_unit_roundtrip():
    buf = syntax.encode_unit(_make_lps_unit())
    h, payload_start, end = syntax.decode_unit_header(hls.BitReader(bytes(buf)))
    assert h["nnr_unit_type"] == hls.NnrUnitType.NNR_LPS
    assert h["lps_quantization_parameter"] == -20
    m = h["lps_sparsification_performance_map"]
    assert m["spm_class_bitmask"] == [3, 3]
    np.testing.assert_allclose(m["sparsification_threshold"], [0.1, 0.2],
                               rtol=1e-6)
    assert end == len(buf)


def test_mps_performance_maps_roundtrip():
    mps = {
        "nnr_unit_type": hls.NnrUnitType.NNR_MPS,
        "partial_data_counter_present_flag": 0,
        "independently_decodable_flag": 1,
        "topology_carriage_flag": 0,
        "mps_sparsification_flag": 1,
        "mps_pruning_flag": 1,
        "mps_unification_flag": 1,
        "mps_decomposition_performance_map_flag": 1,
        "mps_quantization_method_flags": 1,
        "mps_topology_indexed_reference_flag": 0,
        "mps_qp_density": 2,
        "mps_quantization_parameter": 0,
        "mps_sparsification_performance_map": _spm(),
        "mps_pruning_performance_map": {
            "pruning_ratio": [0.25], "ppm_nn_accuracy": [0.88],
            "ppm_class_bitmask": [1], "ppm_nn_class_accuracy": [[0.8]]},
        "mps_unification_performance_map": {
            "reshaped_tensor_dimensions": [[4, 4]],
            "super_block_dimensions": [[2]], "block_dimensions": [[2, 2]],
            "unification_threshold": [0.5], "upm_nn_accuracy": [0.9],
            "upm_count_classes": [5], "upm_class_bitmask": [2],
            "upm_nn_class_accuracy": [[0.7, 0.6]]},
        "mps_decomposition_performance_map": {
            "mse_threshold": [1e-3], "dpm_nn_accuracy": [0.91],
            "nn_reduction_ratio": [0.4], "dpm_nn_class_accuracy": [[0.5]]},
    }
    buf = syntax.encode_unit(mps)
    h, _, end = syntax.decode_unit_header(hls.BitReader(bytes(buf)))
    assert end == len(buf)
    assert h["mps_pruning_performance_map"]["ppm_nn_class_accuracy"] == \
        [[pytest.approx(0.8)]]
    upm = h["mps_unification_performance_map"]
    assert upm["reshaped_tensor_dimensions"] == [[4, 4]]
    assert upm["upm_nn_class_accuracy"][0] == [pytest.approx(0.7),
                                               pytest.approx(0.6)]
    dpm = h["mps_decomposition_performance_map"]
    assert dpm["nn_reduction_ratio"] == [pytest.approx(0.4)]


def _small_bitstream():
    rng = np.random.default_rng(21)
    d = {"a.weight": rng.normal(0, 0.05, (16, 8)).astype(np.float32),
         "a.bias": rng.normal(0, 0.01, (16,)).astype(np.float32)}
    bs = compression.compress(d, bitstream_path=None, qp=-24,
                              return_bitstream=True, verbose=False)
    return d, bytearray(bs)


def test_injected_lps_unit_is_parsed_and_stream_decodes():
    d, bs = _small_bitstream()
    lps = syntax.encode_unit(_make_lps_unit())
    # insert the LPS after the first unit (NNR_STR)
    first_size = int.from_bytes(bs[0:4], "big") + 4
    patched = bs[:first_size] + lps + bs[first_size:]
    rec, info = compression.decompress(bytes(patched), verbose=False,
                                       return_model_information=True)
    assert set(rec) == set(d)
    assert info["performance_map_flags"]["lps_sparsification_flag"] == 1
    m = info["performance_maps"]["lps"]["sparsification_performance_map"]
    np.testing.assert_allclose(m["sparsification_threshold"], [0.1, 0.2],
                               rtol=1e-6)


def test_unknown_unit_type_skipped_by_size():
    d, bs = _small_bitstream()
    # forge a unit with reserved/unknown type 100 and 3 payload bytes
    unknown = (7).to_bytes(4, "big") + bytes([100]) + b"\x80\xAA\xBB\xCC\xDD\xEE"
    first_size = int.from_bytes(bs[0:4], "big") + 4
    patched = bs[:first_size] + unknown + bs[first_size:]
    rec = compression.decompress(bytes(patched), verbose=False)
    assert set(rec) == set(d)


@pytest.mark.parametrize("cut", [1, 3, 7, 40])
def test_truncated_bitstream_raises(cut):
    _d, bs = _small_bitstream()
    with pytest.raises((ValueError, AssertionError)):
        compression.decompress(bytes(bs[:len(bs) - cut]), verbose=False)


def test_corrupted_bitstreams_fail_cleanly():
    """Bit flips, truncations, and spliced garbage must raise clean Python
    exceptions (or silently decode when padding is hit) — never hang,
    exhaust memory, or crash the native decoder (its byte reader is
    bounds-checked). 60 seeded corruptions of a DQ+scan_order+codebook
    stream."""
    rng = np.random.default_rng(0)
    d = {"layer.weight": (rng.standard_normal((32, 64)) * 0.1
                          ).astype(np.float32),
         "layer.bias": (rng.standard_normal(32) * 0.1).astype(np.float32)}
    bm = {"block_identifier": {k: "b0" for k in d},
          "parameter_type": {"layer.weight": "weight",
                             "layer.bias": "bias"}}
    bs = compression.compress(d, bitstream_path=None, qp=-24, use_dq=True,
                              scan_order=1, codebook_mode=2,
                              block_id_and_param_type=bm,
                              return_bitstream=True, verbose=False)
    for trial in range(60):
        b = bytearray(bs)
        mode = rng.integers(0, 3)
        if mode == 0:
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        elif mode == 1:
            b = b[:int(rng.integers(1, len(b)))]
        else:
            at = int(rng.integers(0, len(b)))
            b = b[:at] + bytes(rng.integers(0, 256, 16, dtype=np.uint8)) \
                + b[at:]
        try:
            rec = compression.decompress(bytes(b), verbose=False)
            for v in rec.values():
                np.asarray(v)
        except MemoryError:  # pragma: no cover
            raise AssertionError("unbounded allocation on corrupt stream")
        except Exception:
            pass  # clean failure
