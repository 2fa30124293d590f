import numpy as np
import pytest

from nnc_tpu import hls


def roundtrip(write_fn, read_fn):
    buf = bytearray()
    w = hls.BitWriter(buf)
    write_fn(w)
    w.byte_alignment()
    r = hls.BitReader(bytes(buf))
    out = read_fn(r)
    r.byte_alignment()
    return out, r.byte_pos, len(buf)


@pytest.mark.parametrize("n,vals", [(1, [0, 1]), (7, [0, 5, 127]), (13, [0, 4097, 8191]), (32, [0, 2**32 - 1])])
def test_u_roundtrip(n, vals):
    for v in vals:
        out, pos, total = roundtrip(lambda w: w.u(n, v), lambda r: r.u(n))
        assert out == v
        assert pos == total


@pytest.mark.parametrize("k", [0, 2, 7, 11])
def test_ue_roundtrip(k):
    vals = [0, 1, 2, 3, 7, 8, 100, 1023, 54321]
    out, pos, total = roundtrip(
        lambda w: [w.ue(k, v) for v in vals],
        lambda r: [r.ue(k) for _ in vals],
    )
    assert out == vals
    assert pos == total


@pytest.mark.parametrize("k", [0, 2, 7])
def test_ie_roundtrip(k):
    vals = [0, 1, -1, 5, -5, 1000, -1000, 123456, -123456]
    out, _, _ = roundtrip(
        lambda w: [w.ie(k, v) for v in vals],
        lambda r: [r.ie(k) for _ in vals],
    )
    assert out == vals


def test_i_roundtrip():
    vals = [0, 1, -1, 127, -128]
    out, _, _ = roundtrip(
        lambda w: [w.i(8, v) for v in vals],
        lambda r: [r.i(8) for _ in vals],
    )
    assert out == vals


def test_mixed_sequence_bit_exact():
    rng = np.random.default_rng(0)
    ops = []
    for _ in range(300):
        kind = rng.integers(0, 4)
        if kind == 0:
            n = int(rng.integers(1, 25))
            ops.append(("u", n, int(rng.integers(0, 1 << n))))
        elif kind == 1:
            ops.append(("ue", int(rng.integers(0, 10)), int(rng.integers(0, 10000))))
        elif kind == 2:
            ops.append(("ie", int(rng.integers(0, 8)), int(rng.integers(-5000, 5000))))
        else:
            n = int(rng.integers(2, 20))
            ops.append(("i", n, int(rng.integers(-(1 << (n - 1)), 1 << (n - 1)))))

    def write(w):
        for op, a, b in ops:
            getattr(w, op)(a, b)

    def read(r):
        return [getattr(r, op)(a) for op, a, b in ops]

    out, pos, total = roundtrip(write, read)
    assert out == [b for _, _, b in ops]
    assert pos == total


def test_string_and_float():
    buf = bytearray()
    w = hls.BitWriter(buf)
    w.u(3, 5)
    w.byte_alignment()
    w.st("hello.weight")
    w.flt(32, np.float32(3.25))
    t = np.arange(6, dtype=np.float32).reshape(2, 3)
    w.flt_tensor(32, t)
    r = hls.BitReader(bytes(buf))
    assert r.u(3) == 5
    r.byte_alignment()
    assert r.st() == "hello.weight"
    assert r.flt(32) == np.float32(3.25)
    assert np.array_equal(r.flt_tensor(32, (2, 3)), t)


def test_codebook_roundtrip():
    cb = [-7, -3, -1, 0, 2, 5, 11]
    zero_off = 3
    buf = bytearray()
    w = hls.BitWriter(buf)
    w.cb_zero_offset(len(cb), zero_off)
    w.codebook(1, len(cb), zero_off, cb)
    w.byte_alignment()
    r = hls.BitReader(bytes(buf))
    off = r.cb_zero_offset(len(cb))
    assert off == zero_off
    assert r.codebook(1, len(cb), off) == cb


def test_entry_point_list_roundtrip():
    """EPs are offset-only on the wire (chunk segments restart the engine,
    contexts, and DQ state, so there are no mid-stream resume fields); the
    in-memory packing keeps the native codec's offset << 11 layout."""
    eps = [(100 << 11), (220 << 11), (221 << 11), (1500 << 11)]
    buf = bytearray()
    w = hls.BitWriter(buf)
    w.entry_point_list(len(eps), eps)
    w.byte_alignment()
    r = hls.BitReader(bytes(buf))
    assert r.entry_point_list(len(eps)) == eps
