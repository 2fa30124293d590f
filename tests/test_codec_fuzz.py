"""Property/fuzz tests: random parameter dicts must round-trip the codec."""
import numpy as np
import pytest

import nnc_tpu
from nnc_tpu.core import common


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
