"""Eth client layer: ProofQuery/BlockUtil API over pluggable transports
(reference: mp2-common/src/eth.rs:153-400) + the typed persistent proof
store (mp2-v1/tests/common/proof_storage.rs role)."""

import json
import os

import pytest

from mp2_tpu.eth import (
    EIP1186Response,
    EthClient,
    FixtureTransport,
    ProofQuery,
    StorageSlot,
    record_fixtures,
)
from mp2_tpu.eth.client import block_view_from_client
from mp2_tpu.extraction import storage_key as SK
from mp2_tpu.models.pipeline import MappingTableConfig, make_chain
from mp2_tpu.models.proof_store import (
    MemoryProofStore,
    ProofDict,
    ProofKey,
    SqliteProofKV,
)
from mp2_tpu.utils import rlp
from mp2_tpu.utils.keccak import keccak256
from mp2_tpu.utils.trie import to_nibbles

CFG = MappingTableConfig(
    contract_address=bytes.fromhex("363971ee2b96f360ec9d04b5809afd15c77b1af1"),
    chain_id=1,
    slot=8,
)
KEYS = [b"\x01", b"\x02\x02", b"\x7f" * 4]


def _chain():
    return make_chain(CFG, [{k: 100 + i for i, k in enumerate(KEYS)}])


def _client(blocks):
    t = FixtureTransport()
    for blk in blocks:
        locs = [SK.mapping_location(CFG.slot, k) for k in blk.entries]
        record_fixtures(t, blk.number, blk.header_rlp, blk.state, blk.storage,
                        CFG.contract_address, locs)
    return EthClient(t), t


def test_storage_slot_locations_match_host_helpers():
    assert StorageSlot.simple(8).location() == SK.simple_slot_location(8)
    assert StorageSlot.mapping(8, b"\x01").location() == SK.mapping_location(
        8, b"\x01")
    assert StorageSlot.mapping_of_mappings(3, b"a", b"b").location() == (
        SK.mapping_of_mappings_location(3, b"a", b"b"))
    s = StorageSlot.mapping(8, b"\x01")
    assert s.mpt_key() == keccak256(s.location())
    assert s.mpt_nibbles() == to_nibbles(s.mpt_key())
    assert StorageSlot.simple(8).is_simple_slot()
    assert not s.is_simple_slot()
    assert s.mapping_keys() == [b"\x01"]


def test_client_get_block_and_proof_roundtrip():
    blocks = _chain()
    client, transport = _client(blocks)
    blk = blocks[0]

    eb = client.get_block(blk.number)
    assert eb.rlp() == blk.header_rlp
    assert eb.hash() == keccak256(blk.header_rlp)
    assert eb.state_root == blk.state.root_hash()

    q = ProofQuery.new_mapping_slot(CFG.contract_address, CFG.slot, KEYS[0])
    resp = client.get_proof(q, blk.number)
    # account proof roots at the header's state root
    assert keccak256(resp.account_proof[0]) == eb.state_root
    q.verify_state_proof(resp)
    raw = ProofQuery.verify_storage_proof(resp)
    assert int.from_bytes(bytes(rlp.decode(raw)), "big") == blk.entries[KEYS[0]]

    # the transport replays canonical JSON: a serialize/load roundtrip of
    # the recorded fixture file keeps driving the client identically
    t2 = FixtureTransport.load(transport.dump())
    resp2 = EthClient(t2).get_proof(q, blk.number)
    assert resp2.to_json() == resp.to_json()


def test_verify_rejects_tampered_proofs():
    blocks = _chain()
    client, _ = _client(blocks)
    q = ProofQuery.new_mapping_slot(CFG.contract_address, CFG.slot, KEYS[0])
    resp = client.get_proof(q, blocks[0].number)

    bad = EIP1186Response.from_json(resp.to_json())
    bad.storage_proof[0].proof[-1] = b"\x00" + bad.storage_proof[0].proof[-1]
    with pytest.raises(Exception):
        ProofQuery.verify_storage_proof(bad)

    bad2 = EIP1186Response.from_json(resp.to_json())
    bad2.storage_hash = bytes(32)
    with pytest.raises(Exception):
        q.verify_state_proof(bad2)  # account leaf no longer matches


def test_block_view_feeds_extraction_inputs():
    """The client-derived view supplies EXACTLY the proof paths the
    extraction pipeline reads from fixture tries."""
    blocks = _chain()
    client, _ = _client(blocks)
    blk = blocks[0]
    view = block_view_from_client(
        client, CFG.contract_address, CFG.slot, blk.number, list(blk.entries))
    assert view.entries == blk.entries
    assert view.header_rlp == blk.header_rlp
    assert view.storage.root_hash() == blk.storage.root_hash()
    for k in blk.entries:
        loc = SK.mapping_location(CFG.slot, k)
        assert view.storage.get_proof(loc) == blk.storage.get_proof(loc)
    assert view.state.get_proof(CFG.contract_address) == (
        blk.state.get_proof(CFG.contract_address))


def test_missing_fixture_raises():
    client, _ = _client(_chain())
    with pytest.raises(KeyError):
        client.get_block(99999)


# ---------------------------------------------------------------------------
# proof store
# ---------------------------------------------------------------------------


def test_proof_store_typed_keys_roundtrip(tmp_path):
    kv = SqliteProofKV(str(tmp_path / "proofs.db"))
    k1 = ProofKey.cell("t1", 100, b"\x05", 3)
    k2 = ProofKey.row("t1", 100, (5, 0))
    kv.store_proof(k1, {"stage": "cell", "n": 1})
    kv.store_proof(k2, {"stage": "row"})
    assert kv.get_proof_exact(k1)["n"] == 1
    assert len(kv) == 2
    # typed keys with identical idents in different stages do not collide
    assert ProofKey.ivc(100).encode() != ProofKey.block_extraction(100).encode()

    # move_proof: re-key cells proofs when the secondary index changes
    k1b = ProofKey.cell("t1", 100, b"\x09", 3)
    kv.move_proof(k1, k1b)
    with pytest.raises(KeyError):
        kv.get_proof_exact(k1)
    assert kv.get_proof_exact(k1b)["n"] == 1
    kv.move_proof(ProofKey.cell("zz", 0, b"", 0), k1b)  # missing: no-op
    kv.close()

    # durable: a new handle over the same file sees the proofs
    kv2 = SqliteProofKV(str(tmp_path / "proofs.db"))
    assert kv2.get_proof_exact(k1b)["n"] == 1
    kv2.close()


def test_proof_dict_adapter_compat():
    store = MemoryProofStore()
    d = ProofDict(store)
    d[("final_extraction", 102)] = "env"
    assert d[("final_extraction", 102)] == "env"
    assert ("final_extraction", 102) in d
    assert ("final_extraction", 103) not in d
    assert d.get(("ivc", 1)) is None
    nd = ProofDict(store, "node")
    nd[("rows", (5, 0))] = "row-env"
    assert nd[("rows", (5, 0))] == "row-env"
    with pytest.raises(KeyError):
        nd[("rows", (6, 0))]
    assert len(store) == 2


def test_host_pipeline_persists_proofs(tmp_path):
    """TableIndexer routed through SqliteProofKV: stage proofs survive the
    process (reference proof_storage.rs ProofKV role)."""
    from mp2_tpu.models.pipeline import TableIndexer

    kv = SqliteProofKV(str(tmp_path / "pipe.db"))
    idx = TableIndexer(CFG, proof_store=kv)
    for blk in make_chain(CFG, [{b"\x01": 7}, {b"\x01": 8}]):
        idx.apply_block(blk)
    assert ("ivc", 101) in idx.proofs
    kv.close()

    kv2 = SqliteProofKV(str(tmp_path / "pipe.db"))
    d = ProofDict(kv2)
    p = d[("ivc", 101)]
    assert p is not None
    kv2.close()
