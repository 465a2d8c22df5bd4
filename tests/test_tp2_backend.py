"""Real TP2 proofs in the tree pipeline: every dirtied tree node of the
verifiable DB gets a genuine plonk proof of its Poseidon2 node-hash
computation, with parent/child hash linkage checked at verification."""

import pytest

from mp2_tpu.models.pipeline import MappingTableConfig, TableIndexer, make_chain
from mp2_tpu.recursion.tp2_backend import TP2Backend

ADDR = bytes(range(20))


@pytest.fixture(scope="module")
def indexed():
    cfg = MappingTableConfig(ADDR, 1, slot=3)
    chain = make_chain(cfg, [{b"\x01": 100, b"\x02": 200}, {b"\x01": 150, b"\x02": 200}])
    idx = TableIndexer(cfg, backend=TP2Backend())
    for blk in chain:
        idx.apply_block(blk)
    return cfg, idx


def test_real_tree_proofs_verify(indexed):
    cfg, idx = indexed
    # rows-tree root proof of the last block
    root_key = idx.rows_db.root()
    proof = idx.proofs[("rows", 101, root_key)]
    assert proof.payload["kind"] == "tp2"
    l, r = idx.rows_db.tree.children(root_key)
    children = [idx.node_proofs[("rows", c)] for c in (l, r) if c is not None]
    assert idx.framework.verify_proof(proof, children)
    # strict linkage: omitting a declared non-empty child must fail
    if children:
        assert not idx.framework.verify_proof(proof, children[:-1])
    # swapped positions must fail
    if len(children) == 2:
        assert not idx.framework.verify_proof(proof, children[::-1])
    # PIs carry the real node hash
    assert tuple(proof.public_inputs[0:4]) == idx.rows_db.payload(root_key).hash


def test_block_tree_proof_verifies(indexed):
    cfg, idx = indexed
    root_key = idx.block_db.root()
    proof = idx.proofs[("block", 101, root_key)]
    assert proof.payload["kind"] == "tp2"
    l, r = idx.block_db.tree.children(root_key)
    children = [idx.node_proofs[("block", c)] for c in (l, r) if c is not None]
    assert idx.framework.verify_proof(proof, children)
    assert tuple(proof.public_inputs[0:4]) == idx.block_db.payload(root_key).hash


def test_tampered_pi_rejected(indexed):
    cfg, idx = indexed
    root_key = idx.block_db.root()
    proof = idx.proofs[("block", 101, root_key)]
    import copy

    bad = copy.deepcopy(proof)
    bad.public_inputs[0] = (bad.public_inputs[0] + 1) % (2**64 - 2**32 + 1)
    l, r = idx.block_db.tree.children(root_key)
    children = [idx.node_proofs[("block", c)] for c in (l, r) if c is not None]
    assert not idx.framework.verify_proof(bad, children)


def test_child_linkage_enforced(indexed):
    cfg, idx = indexed
    root_key = idx.block_db.root()
    proof = idx.proofs[("block", 101, root_key)]
    # a proof whose hash is NOT among the declared child hashes must fail
    other = idx.proofs[("rows", 101, idx.rows_db.root())]
    assert not idx.framework.verify_proof(proof, [other])
