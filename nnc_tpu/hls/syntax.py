"""NNR unit syntax: serialize/deserialize unit headers + payload framing.

Each NNR unit is laid out as::

    u(32) nnr_unit_size          # bytes following this field
    nnr_unit_header              # type + flags, byte-aligned
    nnr_unit_payload             # unit-specific header fields + byte payload

Field names match the reference syntax compiler
(reference: nnc_core/coder/syntax_compiler.py:5-199 and the hls.Coder syntax
tree at nnc_core/hls/__init__.py:260-704). The bit layout itself is this
implementation's own (self-consistent encode/decode; see README for format
notes).
"""
from __future__ import annotations

import numpy as np

from . import (BitReader, BitWriter, BlockParameterTypes,
               CompressedDataUnitPayloadType, NnrUnitType)

_PT = CompressedDataUnitPayloadType


# ---------------------------------------------------------------------------
# Shared unit header
# ---------------------------------------------------------------------------
def _write_unit_header(w: BitWriter, h: dict) -> None:
    w.u(8, int(h["nnr_unit_type"]))
    w.u(1, h.get("partial_data_counter_present_flag", 0))
    if h.get("partial_data_counter_present_flag", 0):
        w.u(15, h.get("partial_data_counter", 0))
    w.u(1, h.get("independently_decodable_flag", 1))
    w.byte_alignment()


def _read_unit_header(r: BitReader) -> dict:
    h = {}
    h["nnr_unit_type"] = NnrUnitType(r.u(8))
    h["partial_data_counter_present_flag"] = r.u(1)
    if h["partial_data_counter_present_flag"]:
        h["partial_data_counter"] = r.u(15)
    h["independently_decodable_flag"] = r.u(1)
    r.byte_alignment()
    return h


# ---------------------------------------------------------------------------
# Unit payloads
# ---------------------------------------------------------------------------
def _write_str(w: BitWriter, h: dict) -> None:
    w.u(8, h.get("general_profile_idc", 0))


def _read_str(r: BitReader, h: dict) -> None:
    h["general_profile_idc"] = r.u(8)


def _write_mps(w: BitWriter, h: dict) -> None:
    w.u(1, h.get("topology_carriage_flag", 0))
    w.u(1, h.get("mps_sparsification_flag", 0))
    w.u(1, h.get("mps_pruning_flag", 0))
    w.u(1, h.get("mps_unification_flag", 0))
    w.u(1, h.get("mps_decomposition_performance_map_flag", 0))
    w.u(2, h.get("mps_quantization_method_flags", 0))
    w.u(1, h.get("mps_topology_indexed_reference_flag", 0))
    if h.get("mps_quantization_method_flags", 0):
        w.u(4, int(h["mps_qp_density"]))
        w.i(16, int(h.get("mps_quantization_parameter", 0)))
    w.byte_alignment()


def _read_mps(r: BitReader, h: dict) -> None:
    h["topology_carriage_flag"] = r.u(1)
    h["mps_sparsification_flag"] = r.u(1)
    h["mps_pruning_flag"] = r.u(1)
    h["mps_unification_flag"] = r.u(1)
    h["mps_decomposition_performance_map_flag"] = r.u(1)
    h["mps_quantization_method_flags"] = r.u(2)
    h["mps_topology_indexed_reference_flag"] = r.u(1)
    if h["mps_quantization_method_flags"]:
        h["mps_qp_density"] = r.u(4)
        h["mps_quantization_parameter"] = r.i(16)
    r.byte_alignment()


def _write_tpl(w: BitWriter, h: dict) -> None:
    w.u(8, int(h["topology_storage_format"]))
    w.u(8, int(h.get("topology_compression_format", 0)))
    w.st(h.get("topology_data", ""))


def _read_tpl(r: BitReader, h: dict) -> None:
    h["topology_storage_format"] = r.u(8)
    h["topology_compression_format"] = r.u(8)
    h["topology_data"] = r.st()


def _write_codebook_fields(w: BitWriter, h: dict, suffix: str) -> None:
    egk = int(h["codebook_egk__" + suffix])
    size = int(h["codebook_size__" + suffix])
    off = int(h["CbZeroOffset__" + suffix])
    w.ue(2, egk)
    w.ue(8, size)
    w.cb_zero_offset(size, off)
    w.codebook(egk, size, off, h["codebook__" + suffix])


def _read_codebook_fields(r: BitReader, h: dict, suffix: str) -> None:
    egk = r.ue(2)
    size = r.ue(8)
    off = r.cb_zero_offset(size)
    h["codebook_egk__" + suffix] = egk
    h["codebook_size__" + suffix] = size
    h["CbZeroOffset__" + suffix] = off
    h["codebook__" + suffix] = np.array(r.codebook(egk, size, off),
                                        dtype=np.int32)


def _write_ndu(w: BitWriter, h: dict) -> None:
    pt = int(h["nnr_compressed_data_unit_payload_type"])
    w.u(2, pt)
    w.u(1, h["nnr_multiple_topology_elements_present_flag"])
    w.u(1, h.get("nnr_decompressed_data_format_present_flag", 0))
    w.u(1, h["input_parameters_present_flag"])
    w.byte_alignment()

    if h["nnr_multiple_topology_elements_present_flag"]:
        ids = h["topology_elem_id_list"]
        w.u(16, h["count_topology_elements_minus2"])
        for elem in ids:
            w.st(elem)
    else:
        w.st(h["topology_elem_id"])

    if h.get("nnr_decompressed_data_format_present_flag", 0):
        w.u(7, int(h.get("nnr_decompressed_data_format", 1)))
        w.byte_alignment()

    if h["input_parameters_present_flag"]:
        w.u(1, h.get("tensor_dimensions_flag", 1))
        w.u(1, h.get("cabac_unary_length_flag", 1))
        if h.get("tensor_dimensions_flag", 1):
            w.ue(2, h["count_tensor_dimensions"])
            for d in h["tensor_dimensions"]:
                w.ue(7, int(d))
        if h.get("cabac_unary_length_flag", 1):
            w.ue(2, int(h["cabac_unary_length_minus1"]))
        w.u(4, int(h.get("compressed_parameter_types", 0)))
        if int(h.get("compressed_parameter_types", 0)) & \
                BlockParameterTypes.NNR_CPT_DC:
            w.ue(7, int(h["decomposition_rank"]))
            w.ue(7, int(h["g_number_of_rows"]))

    if pt in (_PT.NNR_PT_BLOCK, _PT.NNR_PT_FLOAT, _PT.NNR_PT_INT):
        w.u(1, int(h["dq_flag"]))

    w.u(1, h.get("codebook_present_flag", 0))
    if h.get("codebook_present_flag", 0):
        _write_codebook_fields(w, h, "")
        if pt == _PT.NNR_PT_BLOCK and \
                (int(h.get("compressed_parameter_types", 0)) &
                 BlockParameterTypes.NNR_CPT_DC):
            _write_codebook_fields(w, h, "dc")

    if len(h.get("tensor_dimensions", ())) > 1 and \
            pt in (_PT.NNR_PT_BLOCK, _PT.NNR_PT_FLOAT, _PT.NNR_PT_INT):
        w.u(4, int(h.get("scan_order", 0)))
        if int(h.get("scan_order", 0)) > 0:
            # entry-point lists: one list per coded tensor that chunks, in
            # payload order; counts are derivable from dims + scan_order.
            for eps, dq in h.get("cabac_entry_point_lists", []):
                w.ue(5, len(eps))
                w.entry_point_list(len(eps), dq, eps)
    w.byte_alignment()

    if pt == _PT.NNR_PT_RAW_FLOAT:
        w.flt_tensor(32, np.ascontiguousarray(
            h["raw_float32_parameter"], dtype=np.float32))


def _read_ndu(r: BitReader, h: dict) -> None:
    pt = r.u(2)
    h["nnr_compressed_data_unit_payload_type"] = _PT(pt)
    h["nnr_multiple_topology_elements_present_flag"] = r.u(1)
    h["nnr_decompressed_data_format_present_flag"] = r.u(1)
    h["input_parameters_present_flag"] = r.u(1)
    r.byte_alignment()

    if h["nnr_multiple_topology_elements_present_flag"]:
        h["count_topology_elements_minus2"] = r.u(16)
        n = h["count_topology_elements_minus2"] + 2
        h["topology_elem_id_list"] = [r.st() for _ in range(n)]
    else:
        h["topology_elem_id"] = r.st()

    if h["nnr_decompressed_data_format_present_flag"]:
        h["nnr_decompressed_data_format"] = r.u(7)
        r.byte_alignment()

    if h["input_parameters_present_flag"]:
        h["tensor_dimensions_flag"] = r.u(1)
        h["cabac_unary_length_flag"] = r.u(1)
        if h["tensor_dimensions_flag"]:
            h["count_tensor_dimensions"] = r.ue(2)
            h["tensor_dimensions"] = [r.ue(7) for _ in
                                      range(h["count_tensor_dimensions"])]
        if h["cabac_unary_length_flag"]:
            h["cabac_unary_length_minus1"] = r.ue(2)
        h["compressed_parameter_types"] = r.u(4)
        if h["compressed_parameter_types"] & BlockParameterTypes.NNR_CPT_DC:
            h["decomposition_rank"] = r.ue(7)
            h["g_number_of_rows"] = r.ue(7)

    if pt in (_PT.NNR_PT_BLOCK, _PT.NNR_PT_FLOAT, _PT.NNR_PT_INT):
        h["dq_flag"] = r.u(1)

    h["codebook_present_flag"] = r.u(1)
    if h["codebook_present_flag"]:
        _read_codebook_fields(r, h, "")
        if pt == _PT.NNR_PT_BLOCK and \
                (h.get("compressed_parameter_types", 0) &
                 BlockParameterTypes.NNR_CPT_DC):
            _read_codebook_fields(r, h, "dc")

    if len(h.get("tensor_dimensions", ())) > 1 and \
            pt in (_PT.NNR_PT_BLOCK, _PT.NNR_PT_FLOAT, _PT.NNR_PT_INT):
        h["scan_order"] = r.u(4)
        if h["scan_order"] > 0:
            # Only the >=2-D tensors of the unit carry entry points (block
            # companions are 1-D): one list for the weight, or two when the
            # block carries G/H decomposition factors.
            n_lists = 2 if (pt == _PT.NNR_PT_BLOCK and
                            (h.get("compressed_parameter_types", 0) &
                             BlockParameterTypes.NNR_CPT_DC)) else 1
            # The weight/G/H lists describe the *tensor's* arithmetic-engine
            # state: codebook-indexed tensors always code with dq=0, so their
            # EP lists carry no dq_state field regardless of the unit header's
            # dq_flag (which describes the uniform-coded companions). Mirrors
            # the encoder (coder/__init__.py:_encode_ndu_payload).
            dq = 0 if h.get("codebook_present_flag") else int(h["dq_flag"])
            lists = []
            for _ in range(n_lists):
                n = r.ue(5)
                lists.append((r.entry_point_list(n, dq), dq))
            h["cabac_entry_point_lists"] = lists
    r.byte_alignment()

    if pt == _PT.NNR_PT_RAW_FLOAT:
        h["raw_float32_parameter"] = r.flt_tensor(
            32, tuple(h.get("tensor_dimensions", (1,))))


# ---------------------------------------------------------------------------
# Unit framing
# ---------------------------------------------------------------------------
_WRITERS = {
    NnrUnitType.NNR_STR: _write_str,
    NnrUnitType.NNR_MPS: _write_mps,
    NnrUnitType.NNR_TPL: _write_tpl,
    NnrUnitType.NNR_NDU: _write_ndu,
}
_READERS = {
    NnrUnitType.NNR_STR: _read_str,
    NnrUnitType.NNR_MPS: _read_mps,
    NnrUnitType.NNR_TPL: _read_tpl,
    NnrUnitType.NNR_NDU: _read_ndu,
}


def encode_unit(header: dict, payload: bytes = b"") -> bytearray:
    """Serialize one unit (with nnr_unit_size back-patched).
    (reference: hls encode_nnr_unit_with_size_dummy/update_nnr_unit_size,
    nnc_core/hls/__init__.py:664-704)"""
    buf = bytearray()
    w = BitWriter(buf)
    w.u(32, 0)  # size dummy
    _write_unit_header(w, header)
    _WRITERS[NnrUnitType(header["nnr_unit_type"])](w, header)
    if payload:
        w.bytes_payload(payload)
    size = len(buf) - 4
    buf[0:4] = size.to_bytes(4, "big")
    return buf


def decode_unit_header(r: BitReader):
    """Read size + generic + unit-specific header. Returns (header, payload
    start byte, unit end byte)."""
    start = r.byte_pos
    size = r.u(32)
    h = _read_unit_header(r)
    _READERS[h["nnr_unit_type"]](r, h)
    end = start + 4 + size
    return h, r.byte_pos, end
