"""Extraction pipeline: storage-slot map-reduce over a fixture trie,
contract/state binding, block header extraction, final-extraction join."""

import random

from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.extraction import values as V
from mp2_tpu.extraction.api import (
    SlotEntry,
    extract_block,
    extract_contract,
    extract_storage_slots,
    final_extraction,
)
from mp2_tpu.extraction.columns import ColumnInfo, extract_value, simple_column
from mp2_tpu.field.ecgfp5 import NEUTRAL
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import MPT
from mp2_tpu.utils.u256 import left_pad32

rng = random.Random(41)

ADDR = bytes(range(20))
CHAIN_ID = 1


def _storage_trie(slots):
    t = MPT(secure=True)
    for loc, value_int in slots:
        t.insert(loc, rlp.encode_int(value_int))
    # some noise entries
    for i in range(40):
        t.insert(keccak256(b"noise%d" % i), rlp.encode_int(i + 1))
    return t


def test_extract_value_bits():
    data = bytes(range(32))
    full = ColumnInfo(1, 9, 0, 0, 256, 0)
    assert extract_value(data, full) == data
    # a single byte at offset 5
    one = ColumnInfo(1, 9, 5, 0, 8, 0)
    assert extract_value(data, one) == left_pad32(bytes([data[5]]))
    # 4 bits at bit offset 2 of byte 3: bits are taken from the low end
    nib = ColumnInfo(1, 9, 3, 2, 4, 0)
    got = extract_value(data, nib)
    want = ((data[3] & 0x3F) >> 2) | ((data[4] & 0x3) << 6)
    want &= 0xF
    assert got == left_pad32(bytes([want]))


def test_single_slot_extraction():
    slot = 4
    value = 0xDEADBEEF
    loc = SK.simple_slot_location(slot)
    trie = _storage_trie([(loc, value)])
    col = simple_column(
        slot, V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    )
    out = extract_storage_slots(trie, [col], [SlotEntry(slot, loc)])
    assert out.node_hash == trie.root_hash()
    assert out.n_leaves == 1
    want_dv = V.compute_leaf_single_values_digest(
        [col], [col.identifier], left_pad32(value.to_bytes(4, "big"))
    )
    assert out.values_digest == want_dv
    assert out.metadata_digest == col.digest()


def test_mapping_extraction_multiset():
    slot = 7
    key_id = V.identifier_for_mapping_key_column(slot, ADDR, CHAIN_ID)
    val_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    col = simple_column(slot, val_id)
    entries = []
    slots = []
    for k in [b"\x01", b"\x02", b"\x03"]:
        loc = SK.mapping_location(slot, k)
        v = int.from_bytes(k, "big") * 1000
        slots.append((loc, v))
        entries.append(SlotEntry(slot, loc, mapping_key=k, key_id=key_id))
    trie = _storage_trie(slots)
    out = extract_storage_slots(trie, [col], entries)
    assert out.n_leaves == 3
    # aggregate digest = sum of leaf digests (order agnostic)
    want = NEUTRAL
    for (loc, v), e in zip(slots, entries):
        want = want + V.compute_leaf_mapping_values_digest(
            [col], [val_id], left_pad32(v.to_bytes(32, "big")), e.mapping_key,
            0, key_id,
        )
    assert out.values_digest == want
    # order of entries must not matter
    out2 = extract_storage_slots(trie, [col], list(reversed(entries)))
    assert out2.values_digest == out.values_digest


def _block_header(state_root: bytes, number: int, parent: bytes):
    # minimal 9-item RLP header [parent, uncles, coinbase, state_root, tx_root,
    # receipts_root, bloom, difficulty, number]
    return rlp.encode(
        [
            parent,
            keccak256(b"uncles"),
            bytes(20),
            state_root,
            keccak256(b"tx"),
            keccak256(b"rc"),
            b"\x00" * 32,
            b"\x01",
            number.to_bytes(4, "big"),
        ]
    )


def test_end_to_end_extraction_join():
    # storage trie with one slot
    slot, value = 1, 123456
    loc = SK.simple_slot_location(slot)
    storage = _storage_trie([(loc, value)])
    storage_root = storage.root_hash()

    # state trie with our contract's account
    state = MPT(secure=True)
    account = rlp.encode([b"\x01", b"\x00", storage_root, keccak256(b"code")])
    state.insert(ADDR, account)
    for i in range(10):
        state.insert(bytes([i]) * 20, rlp.encode([b"\x01", b"\x00", keccak256(b"x"), keccak256(b"y")]))

    header = _block_header(state.root_hash(), 777, keccak256(b"parent"))

    col = simple_column(
        slot, V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    )
    values_out = extract_storage_slots(storage, [col], [SlotEntry(slot, loc)])
    contract_out = extract_contract(state, ADDR)
    block_out = extract_block(header)
    assert block_out.block_number == 777
    assert contract_out.storage_root == storage_root

    final = final_extraction(
        block_out, contract_out, values_out, storage_root, state.root_hash()
    )
    assert final.block_number == 777
    assert final.values_digest == values_out.values_digest
    # metadata digest binds both contract and values schemas
    assert final.metadata_digest == (
        values_out.metadata_digest + contract_out.metadata_digest
    )

    # wrong storage root must fail the join
    other = _storage_trie([(loc, value + 1)])
    try:
        final_extraction(
            block_out, contract_out, values_out, other.root_hash(), state.root_hash()
        )
        assert False
    except AssertionError:
        pass


def test_lengthed_extraction_completeness():
    from mp2_tpu.extraction.api import extract_length, final_extraction_lengthed

    slot, length_slot = 7, 8
    key_id = V.identifier_for_mapping_key_column(slot, ADDR, CHAIN_ID)
    val_id = V.identifier_for_value_column(slot, 0, 256, 0, ADDR, CHAIN_ID)
    col = simple_column(slot, val_id)
    keys = [b"\x01", b"\x02", b"\x03"]
    slots = [(SK.mapping_location(slot, k), int.from_bytes(k, "big") * 10) for k in keys]
    len_loc = SK.simple_slot_location(length_slot)
    trie = _storage_trie(slots + [(len_loc, len(keys))])

    entries = [
        SlotEntry(slot, loc, mapping_key=k, key_id=key_id)
        for (loc, _), k in zip(slots, keys)
    ]
    values_out = extract_storage_slots(trie, [col], entries)
    length_out = extract_length(trie, length_slot, len_loc, variable_slot=slot)
    assert length_out.length == 3 == values_out.n_leaves

    state = MPT(secure=True)
    account = rlp.encode([b"\x01", b"\x00", trie.root_hash(), keccak256(b"c")])
    state.insert(ADDR, account)
    from mp2_tpu.extraction.api import extract_block, extract_contract

    header = _block_header(state.root_hash(), 5, keccak256(b"p"))
    final = final_extraction_lengthed(
        extract_block(header), extract_contract(state, ADDR), values_out,
        length_out, trie.root_hash(), state.root_hash(),
    )
    assert final.block_number == 5

    # incomplete extraction (one leaf missing) must be rejected
    partial = extract_storage_slots(trie, [col], entries[:2])
    try:
        final_extraction_lengthed(
            extract_block(header), extract_contract(state, ADDR), partial,
            length_out, trie.root_hash(), state.root_hash(),
        )
        assert False, "incomplete extraction accepted"
    except AssertionError as e:
        assert "incomplete" in str(e)
