import numpy as np
import pytest

from nnc_tpu.core import common


@pytest.mark.parametrize("qp_density", [0, 1, 2, 3, 4])
def test_stepsize_doubles_per_octave(qp_density):
    k = 1 << qp_density
    for qp in range(-60, 40):
        d = common.get_stepsize_from_qp(qp, qp_density)
        d2 = common.get_stepsize_from_qp(qp + k, qp_density)
        assert d2 == pytest.approx(2 * d)
        assert d > 0


def test_known_values():
    # qp_density=2: k=4. qp=0 -> mul=4, shift=0, delta = 4 * 2^-2 = 1.0
    assert common.get_stepsize_from_qp(0, 2) == 1.0
    # qp=-38: mul = 4 + (-38 & 3) = 6, shift = -38 >> 2 = -10 -> 6 * 2^-12
    assert common.get_stepsize_from_qp(-38, 2) == pytest.approx(6 * 2.0 ** -12)
    # qp=-20: mul = 4 + (-20 & 3) = 4, shift = -5 -> 4 * 2^-7
    assert common.get_stepsize_from_qp(-20, 2) == pytest.approx(2.0 ** -5)


@pytest.mark.parametrize("qp_density", [1, 2, 3])
def test_qp_stepsize_roundtrip(qp_density):
    for qp in range(-80, 33):
        d = common.get_stepsize_from_qp(qp, qp_density)
        qp_rec = common.get_qp_from_stepsize(d, qp_density)
        assert int(round(float(qp_rec))) == qp


def test_monotonic():
    deltas = [common.get_stepsize_from_qp(qp, 2) for qp in range(-100, 100)]
    assert all(a < b for a, b in zip(deltas, deltas[1:]))


def test_dq_offset():
    assert common.compute_qp_offset_to_dq_equivalent(2) == 4
