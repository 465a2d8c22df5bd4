"""Verifiable-DB tree construction: cells/rows/block trees with digest
aggregation, epoch evolution, and order-agnostic multiset digests."""

import random

from mp2_tpu.field.ecgfp5 import NEUTRAL
from mp2_tpu.hash import poseidon2_host as p2h
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.trees import (
    BlockPayload,
    Cell,
    RowPayload,
    build_cells_tree,
    new_block_tree,
    new_row_tree,
)

rng = random.Random(23)


def rand_cell(mult=False):
    return Cell(rng.randrange(1 << 32), rng.randrange(1 << 64), mult)


def test_cells_tree_empty_and_single():
    r0 = build_cells_tree([])
    assert r0.root_hash == D.EMPTY_HASH
    assert r0.split.individual == NEUTRAL

    c = rand_cell()
    r1 = build_cells_tree([c])
    want_hash = D.cells_node_hash(None, None, c.identifier, c.value)
    assert r1.root_hash == want_hash
    assert r1.individual_cnt == 1 and r1.multiplier_cnt == 0
    assert r1.split.individual == D.cell_values_digest(c.identifier, c.value)


def test_cells_tree_digest_is_multiset():
    cells = [rand_cell() for _ in range(5)]
    r = build_cells_tree(cells)
    # digest must equal the plain sum of the cell digests (order-agnostic)
    want = NEUTRAL
    for c in cells:
        want = want + D.cell_values_digest(c.identifier, c.value)
    assert r.split.individual == want
    assert r.individual_cnt == 5

    # multiplier cells go to the other half
    cells2 = cells + [rand_cell(mult=True)]
    r2 = build_cells_tree(cells2)
    assert r2.split.individual == want
    assert r2.multiplier_cnt == 1
    assert r2.split.multiplier != NEUTRAL


def _mk_row(sec_value, cells=None):
    sec = Cell(7, sec_value)
    cells = cells if cells is not None else [rand_cell() for _ in range(3)]
    return RowPayload(
        secondary=sec,
        row_unique_data=p2h.hash_no_pad([sec_value]),
        cells=build_cells_tree(cells),
    )


def test_row_tree_min_max_and_hash():
    db = new_row_tree()

    def tx(t):
        for v in [50, 20, 80]:
            t.store((v, 0), _mk_row(v))

    db.in_transaction(tx)
    root = db.root()
    rp = db.payload(root)
    assert rp.min_value == 20 and rp.max_value == 80
    # root digest = sum of row digests
    want_ind = NEUTRAL
    for v in [50, 20, 80]:
        want_ind = want_ind + db.payload((v, 0)).own_digest().individual_vd
    assert rp.individual_vd == want_ind
    # hash binds children hashes
    l, r = db.tree.children(root)
    lh = db.payload(l).hash if l is not None else None
    rh = db.payload(r).hash if r is not None else None
    assert rp.hash == D.row_node_hash(
        lh, rh, rp.min_value, rp.max_value,
        rp.secondary.identifier, rp.secondary.value, rp.cells.root_hash,
    )


def test_row_tree_update_changes_root():
    db = new_row_tree()
    db.in_transaction(lambda t: [t.store((v, 0), _mk_row(v)) for v in [1, 2, 3]])
    h0 = db.payload(db.root()).hash
    db.in_transaction(lambda t: t.store((2, 0), _mk_row(2, [rand_cell()])))
    h1 = db.payload(db.root()).hash
    assert h0 != h1
    # epoch 0 unchanged
    v0 = db.view_at(0)
    assert v0.payload(v0.root()).hash == h0


def test_block_tree_append_epochs():
    db = new_block_tree()
    index_id = 42
    digests = []
    for blk in [100, 101, 102, 103]:
        rows_digest = D.cell_values_digest(1, blk)  # stand-in rows digest
        digests.append(rows_digest)
        payload = BlockPayload(
            index_id=index_id,
            block_number=blk,
            rows_hash=p2h.hash_no_pad([blk]),
            rows_digest=rows_digest,
        )
        ut = db.in_transaction(lambda t, p=payload, b=blk: t.store(b, p))
        # appending block touches only the ascendance path
        assert len(ut) <= db.size().bit_length() + 1
    root = db.payload(db.root())
    assert root.min_value == 100 and root.max_value == 103
    # accumulated digest = sum over nodes of indexed digests
    want = NEUTRAL
    for blk, dg in zip([100, 101, 102, 103], digests):
        want = want + D.compute_index_digest(
            [index_id] + __import__("mp2_tpu.utils.u256", fromlist=["u256_to_fields"]).u256_to_fields(blk),
            dg,
        )
    assert root.digest == want


def test_final_digest_merge_semantics():
    """block_tree/mod.rs:69-95: final = H2Int(fields(r * mult)) * ind with
    r = H2Int(H("") || cnt) — equal to the final-extraction merge digest
    H2Int(fields(dv_mult)) * dv_ind when the multiplier table's extraction
    digest is row_id * sum(columns) with row_id = H2Int(H("") || cnt)."""
    ind = D.cell_values_digest(1, 2)
    mult = D.cell_values_digest(3, 4)
    assert D.compute_final_digest(False, ind, mult, 5) == ind
    merged = D.compute_final_digest(True, ind, mult, 5)
    assert merged != ind
    h = p2h.hash_no_pad(list(D.EMPTY_HASH) + [5])
    md = mult.scalar_mul(p2h.hash_to_int(h))
    fh = p2h.hash_no_pad(md.to_fields())
    assert merged == ind.scalar_mul(p2h.hash_to_int(fh))
    # the extraction-side combine (merge_circuit.rs): same value when
    # dv_mult == r * mult
    assert merged == ind.scalar_mul(p2h.hash_to_int(p2h.hash_no_pad(md.to_fields())))
