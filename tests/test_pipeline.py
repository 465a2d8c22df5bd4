"""End-to-end pipeline: extraction -> verifiable DB -> IVC -> SQL query.

The integration tier of the reference's test strategy (SURVEY.md §4 tier 4),
with fixture chains instead of Anvil and framework proof envelopes in place
of (not-yet-recursive) circuit proofs.  The cross-layer digest invariant
(extraction DV == rows-tree digest) is asserted inside the pipeline itself.
"""

import pytest

from mp2_tpu.models.pipeline import MappingTableConfig, TableIndexer, make_chain
from mp2_tpu.vdb.query.ops import Placeholders

ADDR = bytes(range(20))


def _pipeline(per_block):
    cfg = MappingTableConfig(ADDR, 1, slot=3)
    chain = make_chain(cfg, per_block)
    idx = TableIndexer(cfg)
    for blk in chain:
        idx.apply_block(blk)
    return cfg, chain, idx


def test_indexing_three_blocks():
    per_block = [
        {b"\x01": 100, b"\x02": 200},
        {b"\x01": 150, b"\x02": 200, b"\x03": 300},  # update + insert
        {b"\x02": 200, b"\x03": 350},  # deletion of key 1, update of 3
    ]
    cfg, chain, idx = _pipeline(per_block)
    assert idx.ivc.first_block == 100
    assert idx.ivc.latest_block == 102
    assert idx.block_db.size() == 3
    assert idx.rows_db.size() == 2  # keys 2, 3 at the end
    # headers chain
    from mp2_tpu.utils.keccak import keccak256

    assert idx.ivc.latest_block_hash == keccak256(chain[-1].header_rlp)
    # ivc proof verifies (with children available)
    p = idx.proofs[("ivc", 102)]
    assert idx.framework.verify_proof(
        p, [idx.proofs[("ivc", 101)], idx.proofs[("final_extraction", 102)]]
    )


def test_query_sum_over_chain():
    per_block = [
        {b"\x01": 100, b"\x02": 200},
        {b"\x01": 150, b"\x02": 200},
        {b"\x01": 170, b"\x02": 250},
    ]
    cfg, chain, idx = _pipeline(per_block)
    res, reveal = idx.run_query(
        "SELECT SUM(value), COUNT(*) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 102}),
    )
    assert res.rows[0][0] == 100 + 200 + 150 + 200 + 170 + 250
    assert res.rows[0][1] == 6
    # revelation binds the query commitments and the block tree root
    assert list(res.computational_hash) == reveal.public_inputs[0:4]
    assert list(res.placeholder_hash) == reveal.public_inputs[4:8]
    assert list(idx.ivc.block_tree_root) == reveal.public_inputs[8:12]


def test_query_with_key_filter_and_range():
    per_block = [
        {b"\x01": 10, b"\x02": 20},
        {b"\x01": 30, b"\x02": 40},
    ]
    cfg, chain, idx = _pipeline(per_block)
    res, _ = idx.run_query(
        "SELECT SUM(value) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND key = $1",
        Placeholders({"$MIN_BLOCK": 101, "$MAX_BLOCK": 101, "$1": 1}),
    )
    assert res.rows[0][0] == 30
    res2, _ = idx.run_query(
        "SELECT SUM(value) FROM t "
        "WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK AND key = $1",
        Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101, "$1": 2}),
    )
    assert res2.rows[0][0] == 60


def test_non_existence_empty_range():
    per_block = [{b"\x01": 10}]
    cfg, chain, idx = _pipeline(per_block)
    res, reveal = idx.run_query(
        "SELECT COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND block <= $MAX_BLOCK",
        Placeholders({"$MIN_BLOCK": 500, "$MAX_BLOCK": 600}),
    )
    assert res.num_matching_rows == 0
    assert res.rows[0][0] == 0


def test_epoch_views_stable():
    per_block = [
        {b"\x01": 100},
        {b"\x01": 999},
    ]
    cfg, chain, idx = _pipeline(per_block)
    # the rows tree at epoch 0 still shows the old value's digest
    v0 = idx.rows_db.view_at(0)
    v1 = idx.rows_db.view_at(1)
    assert v0.payload(v0.root()).hash != v1.payload(v1.root()).hash
