"""Merged tables: a mapping table (individual rows) joined with a
single-slot multiplier table (merge_circuit.rs + block_tree/mod.rs:69-95).

The fast test checks the cross-layer digest algebra host-side: the
final-extraction merge digest H2Int(fields(dv_mult)) * dv_ind equals the
rows tree's merged final digest H2Int(fields(r * mult_vd)) * ind_vd.  The
slow test drives MergedTableIndexer end-to-end with real proofs."""

import os

import pytest

from mp2_tpu.extraction import values as V
from mp2_tpu.extraction.columns import simple_column
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.models.pipeline import MergedTableConfig, make_chain
from mp2_tpu.utils.u256 import left_pad32
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.query.api import Placeholders
from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)

ADDR = bytes(range(40, 60))


def _pad_int(v: int) -> bytes:
    return left_pad32(v.to_bytes((max(v.bit_length(), 1) + 7) // 8, "big"))


def test_merge_digest_algebra_extraction_vs_rows_tree():
    """Extraction-side merge digest == rows-tree merged final digest."""
    cfg = MergedTableConfig(
        contract_address=ADDR, chain_id=1, slot=4, single_slot=9
    )
    entries = {b"\x11": 100, b"\x22": 250}
    supply = 350

    # extraction side: table A (mapping, individual) rows + table B
    # (single slot, multiplier)
    dv_a = None
    for k, v in entries.items():
        d = V.compute_leaf_mapping_values_digest(
            [cfg.column], [cfg.value_id], _pad_int(v), k, 0, cfg.key_id
        )
        dv_a = d if dv_a is None else dv_a + d
    dv_b = V.compute_leaf_single_values_digest(
        [cfg.single_column], [cfg.supply_id], _pad_int(supply)
    )
    # merge_circuit.rs: DV = H2Int(fields(dv_mult)) * dv_ind
    fh = p2h.hash_no_pad(dv_b.to_fields())
    dv_merged = dv_a.scalar_mul(p2h.hash_to_int(fh))

    # rows-tree side: every row carries the multiplier cell
    rows_db = new_row_tree()

    def tx(t):
        for k, v in entries.items():
            cells = build_cells_tree(
                [
                    Cell(cfg.value_id, v, False),
                    Cell(cfg.supply_id, supply, True),
                ]
            )
            t.store(
                (int.from_bytes(k, "big"), 0),
                RowPayload(
                    secondary=Cell(
                        cfg.key_id, int.from_bytes(k, "big"), False
                    ),
                    row_unique_data=V.row_unique_data_for_mapping_leaf(k),
                    cells=cells,
                ),
            )

    rows_db.in_transaction(tx)
    pl = rows_db.payload(rows_db.root())
    assert pl.multiplier_cnt == 1
    final = D.compute_final_digest(
        True, pl.individual_vd, pl.multiplier_vd, pl.multiplier_cnt
    )
    assert final == dv_merged
    # and without the merge flag the digests differ
    assert D.compute_final_digest(
        False, pl.individual_vd, pl.multiplier_vd, pl.multiplier_cnt
    ) != dv_merged


def test_rows_disagreeing_on_multiplier_rejected():
    """row_tree/full_node.rs:46-52: rows must agree on the multiplier."""
    cfg = MergedTableConfig(
        contract_address=ADDR, chain_id=1, slot=4, single_slot=9
    )
    rows_db = new_row_tree()

    def tx(t):
        for i, (k, s) in enumerate([(b"\x11", 350), (b"\x22", 999)]):
            cells = build_cells_tree(
                [
                    Cell(cfg.value_id, 100 + i, False),
                    Cell(cfg.supply_id, s, True),  # different multipliers
                ]
            )
            t.store(
                (int.from_bytes(k, "big"), 0),
                RowPayload(
                    secondary=Cell(
                        cfg.key_id, int.from_bytes(k, "big"), False
                    ),
                    row_unique_data=V.row_unique_data_for_mapping_leaf(k),
                    cells=cells,
                ),
            )

    with pytest.raises(AssertionError):
        rows_db.in_transaction(tx)


@slow
def test_merged_table_pipeline_end_to_end():
    """MergedTableIndexer: both storage walks proven, final_merge combines
    them, block_leaf_bound pins the merged digest with is_merge = 1, and a
    query over the merged schema (supply available as a column) proves."""
    from mp2_tpu.models.circuit_pipeline import MergedTableIndexer

    cfg = MergedTableConfig(
        contract_address=ADDR, chain_id=1, slot=4, single_slot=9
    )
    k1, k2 = b"\x11", b"\x22"
    chain = make_chain(
        cfg,
        [{k1: 100, k2: 250}, {k1: 120, k2: 250}],
        single_values=[350, 370],
    )
    ix = MergedTableIndexer(cfg)
    for blk in chain:
        final_env = ix.apply_block(blk)
        assert ix.fx.verify(final_env)
        assert final_env.member == "final_merge"
    assert ix.vdb.ivc.verify(ix.ivc_env)

    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    sql = (
        "SELECT SUM(value), MAX(supply) FROM t WHERE block >= $MIN_BLOCK "
        "AND block <= $MAX_BLOCK"
    )
    res, env, reveal = ix.run_query(sql, ph)
    assert ix.verify(env)
    assert res.rows[0][0] == 100 + 250 + 120 + 250
    assert res.rows[0][1] == 370
    got_sum = 0
    for l in reveal[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == 720
    got_max = 0
    for l in reveal[20:28]:
        got_max = (got_max << 32) | l
    assert got_max == 370
