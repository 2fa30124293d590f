"""Golden-bitstream format freeze (VERDICT r2 Missing #1).

The bitstream layout is self-defined (docs/BITSTREAM.md), so these fixtures
ARE the compatibility contract:

* byte identity — re-encoding each case's deterministic inputs must produce
  exactly the committed bytes, so any writer change fails here;
* decode stability — the committed bytes must decode to the committed
  tensors, so any reader change that orphans previously written bitstreams
  fails here.

On an INTENTIONAL layout change: bump ``nnc_tpu.hls.FORMAT_VERSION``, run
``python tools/regen_golden.py``, and commit the new fixtures.
"""
import json
import os

import numpy as np
import pytest

import golden_cases
from nnc_tpu import hls

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          golden_cases.GOLDEN_DIR_NAME)


def _read(name):
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def test_fixture_format_version_matches_code():
    """FORMAT_VERSION and the fixtures move together: a version bump without
    regenerated fixtures (or fixture regeneration without a bump) fails."""
    with open(os.path.join(GOLDEN_DIR, "FORMAT_VERSION")) as f:
        assert int(f.read().strip()) == hls.FORMAT_VERSION


@pytest.mark.parametrize("name", sorted(golden_cases.CODEC_CASES))
def test_codec_case_byte_identity_and_decode(name):
    bs, rec = golden_cases.encode_codec_case(name)
    golden = _read(f"{name}.nnc")
    assert bs == golden, (
        f"writer output changed for '{name}' ({len(bs)} vs {len(golden)} "
        f"bytes). If intentional: bump hls.FORMAT_VERSION and run "
        f"tools/regen_golden.py")

    # the committed bytes decode to the committed tensors (reader stability)
    from nnc_tpu import compression
    rec_golden = compression.decompress(golden, verbose=False)
    expected = np.load(os.path.join(GOLDEN_DIR, f"{name}.expected.npz"))
    assert set(rec_golden.keys()) == set(expected.files)
    for k in expected.files:
        assert np.array_equal(rec_golden[k], expected[k]), k
    # and the fresh encode's own reconstruction agrees (full loop closed)
    for k in expected.files:
        assert np.array_equal(rec[k], expected[k]), k


def test_units_case_byte_identity_and_decode():
    bs, surfaced = golden_cases.encode_units_case()
    golden = _read("mps_lps_perfmaps.nnc")
    assert bs == golden, (
        "MPS/LPS performance-map layout changed. If intentional: bump "
        "hls.FORMAT_VERSION and run tools/regen_golden.py")
    with open(os.path.join(GOLDEN_DIR,
                           "mps_lps_perfmaps.expected.json")) as f:
        expected = json.load(f)
    # JSON round-trip normalizes tuples/ints; compare through JSON
    assert json.loads(json.dumps(surfaced, sort_keys=True)) == \
        json.loads(json.dumps(expected, sort_keys=True))


def test_oob_case_byte_identity_and_decode():
    """ipp=0 (fully out-of-band headers) stream: byte identity + decode via
    the rebuilt external/oob dicts to the pinned int tensors."""
    bs, ext, oob, params = golden_cases.encode_oob_case()
    golden = _read("full_oob_ipp0.nnc")
    assert bs == golden, (
        "full-OOB stream layout changed. If intentional: bump "
        "hls.FORMAT_VERSION and run tools/regen_golden.py")
    from nnc_tpu import coder
    _info, ad = coder.decode(golden, model_info=ext, ndu_oob=oob)
    expected = np.load(os.path.join(GOLDEN_DIR,
                                    "full_oob_ipp0.expected.npz"))
    assert set(ad["parameters"].keys()) == set(expected.files)
    for k in expected.files:
        assert np.array_equal(ad["parameters"][k], expected[k]), k
        assert np.array_equal(params[k], expected[k]), k


def _archived_versions():
    return sorted(d for d in os.listdir(GOLDEN_DIR)
                  if d.startswith("v") and
                  os.path.isdir(os.path.join(GOLDEN_DIR, d)))


@pytest.mark.parametrize("version_dir", _archived_versions())
def test_archived_fixtures_still_decode(version_dir):
    """Previously shipped format versions must keep decoding bit-exactly:
    writer-behavior changes (which regenerate the live fixtures) must never
    orphan streams written by older releases."""
    from nnc_tpu import compression
    vdir = os.path.join(GOLDEN_DIR, version_dir)
    cases = [f[:-4] for f in os.listdir(vdir) if f.endswith(".nnc")
             and os.path.exists(os.path.join(vdir, f[:-4] + ".expected.npz"))]
    assert cases, f"no archived codec fixtures in {version_dir}"
    for name in sorted(cases):
        with open(os.path.join(vdir, f"{name}.nnc"), "rb") as f:
            golden = f.read()
        rec = compression.decompress(golden, verbose=False)
        expected = np.load(os.path.join(vdir, f"{name}.expected.npz"))
        assert set(rec.keys()) == set(expected.files), name
        for k in expected.files:
            assert np.array_equal(rec[k], expected[k]), (version_dir, name, k)


def test_future_format_version_rejected():
    """Streams from a newer layout must be rejected loudly, not misparsed."""
    from nnc_tpu import coder
    from nnc_tpu.hls import syntax
    h = coder.compile_start_unit(0)
    h["nnc_tpu_format_version"] = hls.FORMAT_VERSION + 1
    bs = bytes(syntax.encode_unit(h))
    with pytest.raises(ValueError, match="format version"):
        coder.decode(bs)
