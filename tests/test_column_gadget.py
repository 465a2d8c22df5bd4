"""In-circuit column extraction vs the host golden model
(values_extraction/gadgets/column_gadget.rs:301-368 counterpart)."""

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.circuit.gadgets.bytes import add_byte_inputs
from mp2_tpu.circuit.gadgets.curve import curve_to_pi_targets
from mp2_tpu.extraction.column_gadget import column_values_digest_circuit
from mp2_tpu.extraction.columns import (
    ColumnInfo,
    column_values_digest,
    extract_value,
)
from mp2_tpu.prover.config import test_config

WORD = bytes(
    [0xDE, 0xAD, 0xBE, 0xEF] + list(range(4, 32 - 4)) + [0xCA, 0xFE, 0x01, 0x7F]
)

COLUMNS = [
    # full word
    ColumnInfo(slot=1, identifier=11, byte_offset=0, bit_offset=0,
               length=256, evm_word=0),
    # byte-aligned u64 at the tail
    ColumnInfo(slot=1, identifier=12, byte_offset=24, bit_offset=0,
               length=64, evm_word=0),
    # sub-byte: 12 bits starting 3 bits into byte 5
    ColumnInfo(slot=1, identifier=13, byte_offset=5, bit_offset=3,
               length=12, evm_word=0),
    # single bit flag
    ColumnInfo(slot=1, identifier=14, byte_offset=31, bit_offset=7,
               length=1, evm_word=0),
]


@pytest.mark.parametrize("ids", [[11], [12], [13], [14], [11, 12, 13, 14]])
def test_column_digest_circuit_matches_host(ids):
    b = CircuitBuilder(test_config())
    word = add_byte_inputs(b, 32)
    d = column_values_digest_circuit(b, COLUMNS, ids, word)
    b.register_public_inputs(curve_to_pi_targets(b, d))
    data = b.build()

    inputs = {}
    for t, v in zip(word, WORD):
        inputs[t] = v
    want = column_values_digest(COLUMNS, ids, WORD).to_fields()
    w = data.generate_witness(inputs)
    data.check_witness(w, want)


def test_extract_value_host_reference_vectors():
    """Pin the host extract_value semantics the gadget mirrors."""
    # 12 bits at (5, 3): bits 3.. of byte 5 followed by top 7 bits of byte 6,
    # final byte keeps its top 4 bits (length 12 -> 8 + 4)
    info = COLUMNS[2]
    got = extract_value(WORD, info)
    assert len(got) == 32
    cur, nxt, nxt2 = WORD[5], WORD[6], WORD[7]
    b0 = (((cur & ((1 << 5) - 1)) << 3) + (nxt >> 5)) & 0xFF
    b1 = (((nxt & ((1 << 5) - 1)) << 3) + (nxt2 >> 5)) & 0xFF
    b1 = b1 >> 4
    assert got[-2:] == bytes([b0, b1])
