"""CircuitTableIndexer: the flagship pipeline driven by the REAL circuit
families end-to-end — extraction (values/contract/block/final) -> cells ->
rows -> block tree (bound leaves) -> IVC -> tree-bound query -> revelation.

Reference flow: mp2-v1/tests/common/cases/indexing.rs TableIndexing::run +
integrated_querying (every stage a real recursive proof)."""

import os

import pytest

from mp2_tpu.models.pipeline import MappingTableConfig, make_chain
from mp2_tpu.vdb.query.api import Placeholders

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

ADDR = bytes(range(10, 30))
SQL = (
    "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK "
    "AND block <= $MAX_BLOCK"
)


@slow
def test_circuit_pipeline_end_to_end():
    from mp2_tpu.models.circuit_pipeline import CircuitTableIndexer

    cfg = MappingTableConfig(contract_address=ADDR, chain_id=1, slot=4)
    k1, k2, k3 = b"\x11", b"\x22", b"\x33"
    chain = make_chain(
        cfg,
        [
            {k1: 100, k2: 200},          # block 100
            {k1: 150, k2: 200, k3: 50},  # block 101: update + insert
        ],
    )
    ix = CircuitTableIndexer(cfg, tabular_rows=2)
    for blk in chain:
        final_env = ix.apply_block(blk)
        assert ix.fx.verify(final_env)
    assert ix.vdb.ivc.verify(ix.ivc_env)

    # aggregated query over both blocks, bound to the committed trees
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    res, env, reveal = ix.run_query(SQL, ph)
    assert ix.verify(env)
    want_sum = 100 + 200 + 150 + 200 + 50
    assert res.rows[0][0] == want_sum and res.rows[0][1] == 5
    got_sum = 0
    for l in reveal[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == want_sum
    assert reveal[12 + 16] == 5  # COUNT
    # the revelation exposes the IVC's block-tree root
    assert list(reveal[8:12]) == [int(x) for x in ix.ivc.block_tree_root]

    # empty range: non-existence proof through the same circuits
    ph_e = Placeholders({"$MIN_BLOCK": 200, "$MAX_BLOCK": 210})
    res_e, env_e, reveal_e = ix.run_query(SQL, ph_e)
    assert ix.verify(env_e)
    assert res_e.num_matching_rows == 0
    assert reveal_e[12 + 16] == 0

    # tabular SELECT through the unproven-offset revelation: the two
    # largest values, revealed individually with membership proofs
    tab_sql = (
        "SELECT DISTINCT value FROM t WHERE block >= $MIN_BLOCK "
        "AND block <= $MAX_BLOCK AND value >= 150 LIMIT 2"
    )
    res_t, env_t, reveal_t = ix.run_query(tab_sql, ph)
    assert ix.verify(env_t)
    assert env_t.member == "revelation_tabular"
    assert [r[0] for r in res_t.rows] == [150, 200]
    assert reveal_t[12] == 2  # num_results
    got = []
    for i in range(2):
        v = 0
        for l in reveal_t[16 + 16 * i : 24 + 16 * i]:
            v = (v << 32) | l
        got.append(v)
    assert got == [150, 200]
