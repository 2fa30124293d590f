import numpy as np
import pytest

from nnc_tpu.coder import cabac
from nnc_tpu.core import common


def test_stepsize_matches_python():
    for qp in range(-80, 40):
        for d in (1, 2, 3):
            assert cabac.stepsize_from_qp(qp, d) == pytest.approx(
                common.get_stepsize_from_qp(qp, d), rel=1e-12)


def encode_decode(values, dq_flag=0, scan_order=0, culm1=10):
    enc = cabac.Encoder()
    enc.initCtxModels(culm1, 0)
    enc.encodeLayer(values, dq_flag, scan_order)
    eps = enc.getEntryPoints()
    payload = enc.finish()

    dec = cabac.Decoder()
    dec.setStream(payload.tobytes())
    dec.initCtxModels(culm1)
    out = np.zeros(values.shape, dtype=np.int32)
    dec.decodeLayer(out, dq_flag, scan_order)
    consumed = dec.finish()
    return out, payload, eps, consumed


@pytest.mark.parametrize("dq_flag", [0, 1])
def test_encode_decode_roundtrip(dq_flag):
    rng = np.random.default_rng(42)
    values = rng.integers(-50, 50, size=(64, 32)).astype(np.int32)
    out, payload, eps, consumed = encode_decode(values, dq_flag=dq_flag)
    assert np.array_equal(out, values)
    assert consumed == payload.size
    assert eps.size == 0  # scan_order == 0 -> no entry points


def test_roundtrip_sparse_and_large_values():
    rng = np.random.default_rng(0)
    values = np.zeros((100, 40), dtype=np.int32)
    mask = rng.random(values.shape) < 0.05
    values[mask] = rng.integers(-100000, 100000, size=mask.sum()).astype(np.int32)
    out, payload, _, consumed = encode_decode(values)
    assert np.array_equal(out, values)
    assert consumed == payload.size


def test_roundtrip_1d():
    values = np.array([0, 1, -1, 5, -17, 0, 0, 123, -2], dtype=np.int32)
    out, _, _, _ = encode_decode(values)
    assert np.array_equal(out, values)


def test_compression_beats_raw():
    """Near-zero laplacian weights should compress well below 4 bytes/value."""
    rng = np.random.default_rng(1)
    values = np.round(rng.laplace(0, 2.0, size=(256, 256))).astype(np.int32)
    _, payload, _, _ = encode_decode(values)
    bpv = payload.size * 8 / values.size
    assert bpv < 6.0  # entropy of Laplace(b=2) integers is ~3.4 bits


def test_multiple_layers_one_stream():
    """Several tensors + iae_v QP deltas share one NDU payload stream."""
    rng = np.random.default_rng(7)
    tensors = [rng.integers(-9, 9, size=s).astype(np.int32)
               for s in [(16, 16), (32,), (8, 4, 4)]]
    qps = [-38, -20, 3]
    enc = cabac.Encoder()
    for t, qp in zip(tensors, qps):
        enc.initCtxModels(10, 0)
        enc.iae_v(8, qp)
        enc.encodeLayer(t, 1, 0)
        enc.terminate_segment()
    payload = enc.finish()

    dec = cabac.Decoder()
    dec.setStream(payload.tobytes())
    for t, qp in zip(tensors, qps):
        dec.initCtxModels(10)
        assert dec.iae_v(8) == qp
        out = np.zeros(t.shape, dtype=np.int32)
        dec.decodeLayer(out, 1, 0)
        dec.terminate_segment()
        assert np.array_equal(out, t)
    assert dec.finish() == payload.size


@pytest.mark.parametrize("dq_flag", [0, 1])
def test_quant_dequant_error_bound(dq_flag):
    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.05, size=(64, 48)).astype(np.float32)
    qp, qp_density = -30, 2
    delta = cabac.stepsize_from_qp(qp, qp_density)

    enc = cabac.Encoder()
    enc.initCtxModels(10, 0)
    q = np.zeros(x.shape, dtype=np.int32)
    qp_out = enc.quantLayer(x, q, dq_flag, qp_density, qp, 0.0, 10, 0)
    assert qp_out == qp

    dec = cabac.Decoder()
    rec = np.zeros(x.shape, dtype=np.float32)
    dec.dequantLayer(rec, q, qp_density, qp_out, 0, dq_flag)
    err = np.abs(rec - x)
    # uniform: error <= delta/2. dq: the Viterbi path may accept locally
    # larger error (up to ~delta) for globally lower distortion.
    bound = delta / 2 if dq_flag == 0 else delta
    assert err.max() <= bound + 1e-7


@pytest.mark.parametrize("scan_order", [0, 1])
def test_dequant_matches_double_precision_mirror(scan_order):
    """dequantLayer is a vectorized two-pass rewrite (state walk + branch-
    free math); it must match the scalar double-precision DQ recon
    ((2|q| - offset(state)) * delta/2, signed) EXACTLY, including +0.0
    (never -0.0) at zeros and the per-block-row state reset."""
    trans = np.array([[0, 2], [5, 7], [1, 3], [6, 4],
                      [2, 0], [7, 5], [3, 1], [4, 6]], dtype=np.int64)
    rng = np.random.default_rng(7)
    q = rng.integers(-9, 10, size=(33, 17)).astype(np.int32)
    q[0, :5] = 0  # leading zeros exercise the offset-zeroing path
    qp, qpd = -22, 3
    delta = cabac.stepsize_from_qp(qp, qpd)

    h, w = q.shape
    bh = (4 << scan_order) if scan_order else h
    expect = np.zeros(q.shape, dtype=np.float32)
    flat = q.reshape(-1)
    exp_flat = expect.reshape(-1)
    for r0 in range(0, h, bh):
        state = 0
        for i in range(r0 * w, min(h, r0 + bh) * w):
            lvl = int(flat[i])
            if lvl == 0:
                exp_flat[i] = 0.0
            else:
                m = float(abs(lvl))
                val = (2.0 * m - float((state >> 1) & 1)) * delta * 0.5
                exp_flat[i] = np.float32(val if lvl > 0 else -val)
            state = int(trans[state][abs(lvl) & 1])

    dec = cabac.Decoder()
    rec = np.zeros(q.shape, dtype=np.float32)
    dec.dequantLayer(rec, q, qpd, qp, scan_order, 1)
    assert np.array_equal(rec, expect)
    assert not np.signbit(rec[q == 0]).any()


def test_dq_beats_uniform_distortion():
    """The trellis should (weakly) reduce MSE vs plain rounding at same qp."""
    rng = np.random.default_rng(11)
    x = rng.normal(0, 0.1, size=(128, 64)).astype(np.float32)
    qp, qpd = -24, 2
    mses = {}
    for dq in (0, 1):
        enc = cabac.Encoder()
        enc.initCtxModels(10, 0)
        q = np.zeros(x.shape, dtype=np.int32)
        enc.quantLayer(x, q, dq, qpd, qp, 0.0, 10, 0)
        dec = cabac.Decoder()
        rec = np.zeros(x.shape, dtype=np.float32)
        dec.dequantLayer(rec, q, qpd, qp, 0, dq)
        mses[dq] = float(((rec - x) ** 2).mean())
    # dq quantizes on a half-step grid -> distortion should drop noticeably
    assert mses[1] < mses[0]


def test_rdoq_lambda_rate_distortion_tradeoff():
    """lambda_scale > 0 turns the DQ trellis into true RDOQ (lambda =
    lambda_scale * delta^2, rate from the bin estimator). Encoder-side
    only, so the stream stays format-compatible. The lambda-optimized
    path must (a) round-trip exactly, (b) spend fewer bits, and (c)
    improve the D + lambda*R objective it optimizes (measured with the
    REAL encoded bytes, not the estimator) vs the distortion-only path.
    Measured RD on NeRF weights is a rejection (BASELINE.md r4) — the
    knob stays default-off — but the branch must keep working."""
    rng = np.random.default_rng(19)
    x = rng.normal(0, 0.1, size=(128, 64)).astype(np.float32)
    qp, qpd = -24, 2
    delta = cabac.stepsize_from_qp(qp, qpd)
    stats = {}
    for lam_scale in (0.0, 1.0):
        enc = cabac.Encoder()
        enc.initCtxModels(10, 0)
        q = np.zeros(x.shape, dtype=np.int32)
        enc.quantLayer(x, q, 1, qpd, qp, lam_scale, 10, 0)
        enc.encodeLayer(q, 1, 0)
        payload = enc.finish()

        dec = cabac.Decoder()
        dec.setStream(payload.tobytes())
        dec.initCtxModels(10)
        out = np.zeros(x.shape, dtype=np.int32)
        dec.decodeLayer(out, 1, 0)
        assert np.array_equal(out, q)
        rec = np.zeros(x.shape, dtype=np.float32)
        dec.dequantLayer(rec, q, qpd, qp, 0, 1)
        stats[lam_scale] = (float(((rec - x) ** 2).sum()),
                            payload.size * 8)
    d0, r0 = stats[0.0]
    d1, r1 = stats[1.0]
    assert r1 < r0            # rate biasing must actually save bits
    assert d1 >= d0           # ... by accepting (weakly) more distortion
    lam = delta * delta
    # the optimized objective improves even under the true bit count
    assert d1 + lam * r1 < d0 + lam * r0


def test_qp_clipping_on_overflow():
    x = np.array([[1e9, -1e9], [0.5, 2.0]], dtype=np.float32)
    enc = cabac.Encoder()
    enc.initCtxModels(10, 0)
    q = np.zeros(x.shape, dtype=np.int32)
    qp_out = enc.quantLayer(x, q, 1, 2, -80, 0.0, 10, 0)
    assert qp_out > -80  # clipped up to avoid int32 overflow
    dec = cabac.Decoder()
    rec = np.zeros(x.shape, dtype=np.float32)
    dec.dequantLayer(rec, q, 2, qp_out, 0, 1)
    delta = cabac.stepsize_from_qp(qp_out, 2)
    assert np.abs(rec - x).max() <= delta  # coarse but faithful after clipping


def test_entry_points_scan_order():
    rng = np.random.default_rng(5)
    values = rng.integers(-20, 20, size=(64, 32)).astype(np.int32)
    scan_order = 1  # block-row height 8 -> 8 chunks -> 7 entry points
    out, payload, eps, consumed = encode_decode(values, dq_flag=1,
                                                scan_order=scan_order)
    assert np.array_equal(out, values)
    assert eps.size == 7
    assert consumed == payload.size
    # decode again collecting eps; they must match the encoder's
    dec = cabac.Decoder()
    dec.setStream(payload.tobytes())
    dec.initCtxModels(10)
    out2 = np.zeros(values.shape, dtype=np.int32)
    eps2 = dec.decodeLayerAndCreateEPs(out2, 1, scan_order)
    assert np.array_equal(out2, values)
    assert np.array_equal(eps, eps2)
    # entry points are byte offsets (<<11): chunk 3's segment can be decoded
    # independently by seeking
    offsets = [int(e) >> 11 for e in eps]
    assert all(a < b for a, b in zip(offsets, offsets[1:]))


def test_quant_dq_state_consistency_with_scan_order():
    """quantLayer and dequantLayer must reset trellis state at the same
    block-row boundaries when scan_order > 0."""
    rng = np.random.default_rng(9)
    x = rng.normal(0, 0.05, size=(40, 16)).astype(np.float32)
    qp, qpd, so = -28, 2, 1
    delta = cabac.stepsize_from_qp(qp, qpd)
    enc = cabac.Encoder()
    enc.initCtxModels(10, 0)
    q = np.zeros(x.shape, dtype=np.int32)
    enc.quantLayer(x, q, 1, qpd, qp, 0.0, 10, so)
    dec = cabac.Decoder()
    rec = np.zeros(x.shape, dtype=np.float32)
    dec.dequantLayer(rec, q, qpd, qp, so, 1)
    assert np.abs(rec - x).max() <= delta + 1e-7


def test_encoder_eps_match_decoder_created_eps():
    """The entry points the encoder records must equal the ones a decoder
    derives (guards the shared segment anchor before chunked layers)."""
    from nnc_tpu.coder import cabac
    rng = np.random.default_rng(11)
    v = (rng.normal(0, 2.0, (256, 16)) ** 3).astype(np.int32)
    enc = cabac.Encoder()
    enc.initCtxModels(10, 0)
    enc.iae_v(8, -12)  # qp delta ahead of the layer, like a real NDU
    enc.encodeLayer(v, 1, 1)
    enc_eps = enc.getEntryPoints()
    enc.terminate_segment()
    payload = enc.finish().tobytes()
    assert len(enc_eps) > 0

    dec = cabac.Decoder()
    dec.setStream(payload)
    dec.initCtxModels(10)
    assert dec.iae_v(8) == -12
    out = np.zeros_like(v)
    dec_eps = dec.decodeLayerAndCreateEPs(out, 1, 1)
    np.testing.assert_array_equal(out, v)
    np.testing.assert_array_equal(enc_eps, dec_eps)


def test_entry_point_seek_decodes_single_block_row():
    """decodeLayerRows(c, c+1) reproduces exactly that block-row without
    decoding the rest (random access / intra-tensor parallel decode)."""
    from nnc_tpu.coder import cabac
    from nnc_tpu.coder.cabac import _load
    rng = np.random.default_rng(12)
    v = (rng.normal(0, 2.0, (512, 8)) ** 3).astype(np.int32)
    enc = cabac.Encoder()
    enc.initCtxModels(10, 0)
    enc.iae_v(8, 3)
    enc.encodeLayer(v, 1, 1)
    eps = enc.getEntryPoints()
    enc.terminate_segment()
    payload = enc.finish().tobytes()
    n_chunks = len(eps) + 1
    assert n_chunks >= 3

    bh = (v.shape[0] + n_chunks - 1) // n_chunks
    for c in (0, 1, n_chunks - 1):
        dec = cabac.Decoder()
        dec.setStream(payload)
        dec.initCtxModels(10)
        assert dec.iae_v(8) == 3
        dec.setEntryPoints(eps)
        out = np.full_like(v, -999)
        dec.decodeLayerRows(out, 1, 1, c, c + 1)
        r0, r1 = c * bh, min(v.shape[0], (c + 1) * bh)
        np.testing.assert_array_equal(out[r0:r1], v[r0:r1])
        # untouched outside the requested rows
        assert (out[:r0] == -999).all() and (out[r1:] == -999).all()


def test_set_entry_points_full_decode_matches_sequential():
    from nnc_tpu.coder import cabac
    rng = np.random.default_rng(13)
    v = (rng.normal(0, 3.0, (300, 11)) ** 3).astype(np.int32)
    enc = cabac.Encoder()
    enc.initCtxModels(10, 1)
    enc.encodeLayer(v, 1, 2)
    eps = enc.getEntryPoints()
    enc.terminate_segment()
    payload = enc.finish().tobytes()

    d1 = cabac.Decoder()
    d1.setStream(payload)
    d1.initCtxModels(10)
    out1 = np.zeros_like(v)
    d1.decodeLayer(out1, 1, 2)
    consumed1 = d1.finish()

    d2 = cabac.Decoder()
    d2.setStream(payload)
    d2.initCtxModels(10)
    d2.setEntryPoints(eps)
    out2 = np.zeros_like(v)
    d2.decodeLayer(out2, 1, 2)
    consumed2 = d2.finish()
    np.testing.assert_array_equal(out1, v)
    np.testing.assert_array_equal(out2, v)
    assert consumed1 == consumed2 == len(payload)


def test_roundtrip_large_unary_length_spill():
    """cabac_unary_length_minus1 > 63 exercises the gt-context spill path
    (fixed 64-entry array + heap overflow storage)."""
    import numpy as np
    from nnc_tpu import compression
    rng = np.random.default_rng(5)
    d = {"w.weight": rng.normal(0, 2.0, (32, 32)).astype(np.float32)}
    bs = compression.compress(d, bitstream_path=None, qp=-30,
                              cabac_unary_length_minus1=90,
                              return_bitstream=True, verbose=False)
    rec = compression.decompress(bs, verbose=False)
    from nnc_tpu.core.common import get_stepsize_from_qp
    step = get_stepsize_from_qp(-30, 2)
    assert np.abs(rec["w.weight"] - d["w.weight"]).max() <= step + 1e-7
