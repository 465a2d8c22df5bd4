"""Umbrella metadata-hash API (mp2-v1/src/api.rs:289-486 mirrors): the
predicted commitment must equal what the REAL pipeline exposes at IVC."""

from mp2_tpu.extraction.metadata import (
    SlotInput,
    SlotInputs,
    compute_table_info,
    merge_metadata_hash,
    metadata_hash,
    no_provable_metadata_hash,
)
from mp2_tpu.models.pipeline import (
    MappingTableConfig,
    MergedTableConfig,
    TableIndexer,
    make_chain,
)

ADDR = bytes(range(20))


def test_metadata_hash_matches_pipeline():
    """metadata_hash(SlotInputs.mapping(slot)) == the hash the indexed
    pipeline carries into IVC — no extraction run needed to predict it."""
    cfg = MappingTableConfig(ADDR, 1, slot=3)
    chain = make_chain(cfg, [{b"\x01": 100, b"\x02": 200}])
    idx = TableIndexer(cfg)
    for blk in chain:
        idx.apply_block(blk)
    want = idx.metadata_hash
    got = metadata_hash(SlotInputs.mapping([SlotInput(3)]), ADDR, 1)
    assert tuple(got) == tuple(want)


def test_merge_metadata_hash_matches_merged_table_config():
    """merge_metadata_hash == the merged final-extraction DM the circuit
    pipeline exposes (final_circuits.final_merge_pi_values: DM_a + DM_b +
    contract_DM, then block-id combine) — derived here independently from
    the MergedTableConfig column identifiers."""
    from mp2_tpu.extraction import values as V
    from mp2_tpu.extraction.metadata import contract_metadata_digest
    from mp2_tpu.vdb import digests as D

    cfg = MergedTableConfig(ADDR, 1, slot=3, single_slot=5)
    dm_a = V.compute_leaf_mapping_metadata_digest(
        [cfg.column], cfg.slot, cfg.key_id
    )
    dm_b = V.compute_leaf_single_metadata_digest([cfg.single_column])
    want = D.block_metadata_hash(
        dm_a + dm_b + contract_metadata_digest(ADDR), cfg.block_id
    )
    got = merge_metadata_hash(
        ADDR, 1, b"",
        SlotInputs.mapping([SlotInput(3)]),
        SlotInputs.simple([SlotInput(5)]),
    )
    assert tuple(got) == tuple(want)


def test_table_info_identifiers_deterministic():
    ti = compute_table_info([SlotInput(3), SlotInput(4, 0, 128, 1)], ADDR, 1)
    ti2 = compute_table_info([SlotInput(3), SlotInput(4, 0, 128, 1)], ADDR, 1)
    assert [c.identifier for c in ti] == [c.identifier for c in ti2]
    assert len({c.identifier for c in ti}) == 2


def test_no_provable_hash_order_independent():
    a = no_provable_metadata_hash([5, 2, 9])
    b = no_provable_metadata_hash([9, 5, 2, 2])
    assert a == b
    assert a != no_provable_metadata_hash([5, 2, 8])
