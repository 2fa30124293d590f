"""Regenerate the golden bitstream fixtures under tests/golden/.

Run ONLY on an intentional bitstream-layout change, together with a bump of
``nnc_tpu.hls.FORMAT_VERSION`` (the fixtures are the frozen contract; see
tests/test_golden_bitstreams.py and docs/BITSTREAM.md)::

    python tools/regen_golden.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()

import numpy as np

import golden_cases
from nnc_tpu import hls


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", golden_cases.GOLDEN_DIR_NAME)
    os.makedirs(out_dir, exist_ok=True)

    for name in golden_cases.CODEC_CASES:
        bs, rec = golden_cases.encode_codec_case(name)
        with open(os.path.join(out_dir, f"{name}.nnc"), "wb") as f:
            f.write(bs)
        np.savez(os.path.join(out_dir, f"{name}.expected.npz"), **rec)
        print(f"{name}: {len(bs)} bytes, {len(rec)} tensors")

    bs, _ext, _oob, params = golden_cases.encode_oob_case()
    with open(os.path.join(out_dir, "full_oob_ipp0.nnc"), "wb") as f:
        f.write(bs)
    np.savez(os.path.join(out_dir, "full_oob_ipp0.expected.npz"), **params)
    print(f"full_oob_ipp0: {len(bs)} bytes, {len(params)} tensors")

    bs, surfaced = golden_cases.encode_units_case()
    with open(os.path.join(out_dir, "mps_lps_perfmaps.nnc"), "wb") as f:
        f.write(bs)
    with open(os.path.join(out_dir, "mps_lps_perfmaps.expected.json"),
              "w") as f:
        json.dump(surfaced, f, indent=1, sort_keys=True)
    print(f"mps_lps_perfmaps: {len(bs)} bytes")

    with open(os.path.join(out_dir, "FORMAT_VERSION"), "w") as f:
        f.write(f"{hls.FORMAT_VERSION}\n")
    print(f"format version {hls.FORMAT_VERSION}")


if __name__ == "__main__":
    main()
