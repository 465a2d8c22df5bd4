"""Real extraction circuits: block-header extraction + storage-key
derivation in-circuit, cross-checked against the host extraction layer."""

import os

import pytest

from mp2_tpu.extraction.api import extract_block
from mp2_tpu.extraction.circuits import (
    build_block_extraction_circuit,
    build_mapping_location_circuit,
    fixture_header_offsets,
)
from mp2_tpu.extraction.storage_key import mapping_location
from mp2_tpu.models.pipeline import MappingTableConfig, make_chain
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.u256 import pack_bytes_be

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

ADDR = bytes(range(20))


@pytest.fixture(scope="module")
def header():
    cfg = MappingTableConfig(ADDR, 1, slot=3)
    chain = make_chain(cfg, [{b"\x01": 100}])
    return chain[0].header_rlp


def test_block_extraction_circuit_matches_host(header):
    offs = fixture_header_offsets(header)
    bc = build_block_extraction_circuit(**offs)
    expected = bc.expected_public_inputs(header)
    # PI structure mirrors the host extraction
    out = extract_block(header)
    assert expected[0:8] == pack_bytes_be(keccak256(header))
    assert expected[-1] == out.block_number

    inputs = {}
    from mp2_tpu.circuit.gadgets.keccak import set_bytes

    set_bytes(inputs, bc.header_targets, header)
    w = bc.data.generate_witness(inputs)
    bc.data.check_witness(w, expected)

    # a tampered state root in the claimed PIs must fail
    bad = list(expected)
    bad[16] = (bad[16] + 1) % ((1 << 64) - (1 << 32) + 1)
    with pytest.raises(AssertionError):
        bc.data.check_witness(w, bad)


def test_mapping_location_circuit_matches_host():
    mc = build_mapping_location_circuit()
    key, slot = b"\x07", 3
    from mp2_tpu.circuit.gadgets.keccak import set_bytes
    from mp2_tpu.utils.u256 import left_pad32

    inputs = {}
    set_bytes(inputs, mc.key_targets, left_pad32(key))
    inputs[mc.slot_target] = slot
    w = mc.data.generate_witness(inputs)
    pis = pack_bytes_be(mapping_location(slot, key))
    mc.data.check_witness(w, pis)
