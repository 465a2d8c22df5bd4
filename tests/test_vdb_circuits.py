"""Verifiable-DB node circuits: in-circuit hash + digest accumulation must
reproduce the host tree aggregation (vdb.trees / vdb.digests) bit-for-bit.

Fast tier feeds child public inputs as raw witness targets (the recursion
layer's universal verifiers are tested separately in test_recursion.py);
the MP2_SLOW tier proves the full chained sets cells -> rows -> block -> ivc.
"""

import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb import circuits as C
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.trees import (
    BlockPayload,
    Cell,
    RowPayload,
    build_cells_tree,
    new_block_tree,
    new_row_tree,
)

slow = pytest.mark.skipif(
    not os.environ.get("MP2_SLOW"), reason="set MP2_SLOW=1 for prove-heavy tests"
)


class _StubChild:
    """Stands in for a UniversalVerifierTargets: PI values arrive as plain
    witness inputs instead of a verified child proof."""

    def __init__(self, b):
        self.targets = b.add_inputs(C.NUM_USER_PIS)

    def public_inputs(self):
        return list(self.targets)

    def assign(self, inputs, values):
        for t, v in zip(self.targets, values):
            inputs[t] = int(v)


def _run(b, inputs, pis):
    data = b.build()
    w = data.generate_witness(inputs)
    data.check_witness(w, pis)


def test_cells_leaf_circuit_matches_host():
    cell = Cell(identifier=42, value=123456789, is_multiplier=False)
    res = build_cells_tree([cell])
    b = CircuitBuilder(test_config())
    assign = C._build_cells_leaf(b)
    inputs = {}
    assign(inputs, cell)
    pis = C.cells_pi_values(res.root_hash, res.split, 1, 0)
    _run(b, inputs, pis)


def test_cells_full_circuit_matches_host():
    cells = [
        Cell(1, 100, False),
        Cell(2, 200, True),
        Cell(3, 300, False),
    ]
    res = build_cells_tree(cells)
    tree, nodes = res.tree, res.nodes
    root = tree.root_inner()
    l, r = tree.children_inner(root)
    assert l is not None and r is not None

    b = CircuitBuilder(test_config())
    sl, sr = _StubChild(b), _StubChild(b)
    assign = C._build_cells_full(b, [sl, sr])
    inputs = {}
    assign(inputs, nodes[root].cell)
    for stub, k in ((sl, l), (sr, r)):
        n = nodes[k]
        stub.assign(
            inputs,
            C.cells_pi_values(
                n.hash, n.split, n.individual_cnt, n.multiplier_cnt
            ),
        )
    pis = C.cells_pi_values(
        nodes[root].hash, nodes[root].split,
        nodes[root].individual_cnt, nodes[root].multiplier_cnt,
    )
    _run(b, inputs, pis)


@pytest.fixture(scope="module")
def row_fixture():
    cells = build_cells_tree([Cell(7, 700, False)])
    rows_db = new_row_tree()
    rud = (9, 8, 7, 6)
    rows_db.in_transaction(
        lambda t: t.store(
            (55, 0),
            RowPayload(
                secondary=Cell(5, 55, False), row_unique_data=rud, cells=cells
            ),
        )
    )
    payload = rows_db.payload((55, 0))
    return cells, rud, payload


def test_rows_leaf_circuit_matches_host(row_fixture):
    cells, rud, payload = row_fixture
    b = CircuitBuilder(test_config())
    sc = _StubChild(b)
    assign = C._build_rows_leaf(b, [], [sc])
    inputs = {}
    assign(inputs, payload.secondary, rud)
    sc.assign(
        inputs,
        C.cells_pi_values(
            cells.root_hash, cells.split,
            cells.individual_cnt, cells.multiplier_cnt,
        ),
    )
    _run(b, inputs, C.rows_pi_values(payload))


def test_block_leaf_circuit_matches_host(row_fixture):
    cells, rud, payload = row_fixture
    rows_digest = D.compute_final_digest(
        False, payload.individual_vd, payload.multiplier_vd,
        payload.multiplier_cnt,
    )
    block_db = new_block_tree()
    bp = BlockPayload(
        index_id=99, block_number=1234, rows_hash=payload.hash,
        rows_digest=rows_digest,
    )
    block_db.in_transaction(lambda t: t.store(1234, bp))
    blk = block_db.payload(1234)

    b = CircuitBuilder(test_config())
    sr = _StubChild(b)
    assign = C._build_block_leaf(b, [], [sr])
    inputs = {}
    assign(inputs, 99, 1234, False)
    sr.assign(inputs, C.rows_pi_values(payload))
    _run(b, inputs, C.block_pi_values(blk))


@slow
def test_chained_sets_prove_end_to_end():
    """cells tree (2 cells) -> row -> block leaf -> IVC first, every layer
    verified in-circuit against the lower layer's circuit set (the chained
    fixed-VK stack of verifiable-db/src/api.rs)."""
    from mp2_tpu.hash import poseidon2_host as p2h

    vdb = C.VerifiableDbCircuits(test_config())

    cells = build_cells_tree([Cell(7, 700, False), Cell(8, 800, False)])
    cells_env = vdb.prove_cells_tree(cells)
    assert vdb.cells.verify(cells_env)

    rows_db = new_row_tree()
    rud = (9, 8, 7, 6)
    rows_db.in_transaction(
        lambda t: t.store(
            (55, 0),
            RowPayload(
                secondary=Cell(5, 55, False), row_unique_data=rud, cells=cells
            ),
        )
    )
    payload = rows_db.payload((55, 0))
    row_env = vdb.rows.prove_aggregation(
        "rows_leaf", [], (payload.secondary, rud),
        C.rows_pi_values(payload), foreign_children=[cells_env],
    )
    assert vdb.rows.verify(row_env)

    rows_digest = D.compute_final_digest(
        False, payload.individual_vd, payload.multiplier_vd,
        payload.multiplier_cnt,
    )
    block_db = new_block_tree()
    bp = BlockPayload(
        index_id=99, block_number=1234, rows_hash=payload.hash,
        rows_digest=rows_digest,
    )
    block_db.in_transaction(lambda t: t.store(1234, bp))
    blk = block_db.payload(1234)
    blk_env = vdb.block.prove_aggregation(
        "block_leaf", [], (99, 1234, False),
        C.block_pi_values(blk), foreign_children=[row_env],
    )
    assert vdb.block.verify(blk_env)

    md = p2h.hash_no_pad([1, 2, 3])
    ivc_env = vdb.ivc.prove_aggregation(
        "ivc_first", [], (md, 1234),
        C.ivc_pi_values(blk.hash, md, 1234), foreign_children=[blk_env],
    )
    assert vdb.ivc.verify(ivc_env)


def test_rows_full_multiplier_equality_and_merged_block_leaf():
    """Merged-table circuits: a full rows node accepts children that agree
    on the multiplier digest/counter and rejects disagreeing ones
    (row_tree/full_node.rs:46-52); block_leaf with is_merge=1 exposes the
    merged final digest (block_tree/mod.rs:69-95)."""
    sup = 350

    def mk_cells():
        return build_cells_tree(
            [Cell(7, 700, False), Cell(9, sup, True)]
        )

    rows_db = new_row_tree()

    def tx(t):
        for k in (20, 10, 30):  # balanced: 20 at the root
            t.store(
                (k, 0),
                RowPayload(
                    secondary=Cell(5, k, False), row_unique_data=(k, 0, 0, 0),
                    cells=mk_cells(),
                ),
            )

    rows_db.in_transaction(tx)
    root_key = rows_db.root()
    l, r = rows_db.tree.children(root_key)
    assert l is not None and r is not None
    root_pl = rows_db.payload(root_key)
    lp, rp = rows_db.payload(l), rows_db.payload(r)
    assert root_pl.multiplier_cnt == 1

    b = CircuitBuilder(test_config())
    sl, sr_, sc = _StubChild(b), _StubChild(b), _StubChild(b)
    assign = C._build_rows_full(b, [sl, sr_], [sc])
    cells = root_pl.cells
    inputs = {}
    assign(inputs, root_pl.secondary, root_pl.row_unique_data)
    sc.assign(
        inputs,
        C.cells_pi_values(
            cells.root_hash, cells.split,
            cells.individual_cnt, cells.multiplier_cnt,
        ),
    )
    sl.assign(inputs, C.rows_pi_values(lp))
    sr_.assign(inputs, C.rows_pi_values(rp))
    data = b.build()
    w = data.generate_witness(inputs)
    data.check_witness(w, C.rows_pi_values(root_pl))

    # a child claiming a DIFFERENT multiplier digest must be rejected
    bad = list(C.rows_pi_values(lp))
    bad[15] = (bad[15] + 1) % ((1 << 64) - (1 << 32) + 1)
    inputs2 = {}
    assign(inputs2, root_pl.secondary, root_pl.row_unique_data)
    sc.assign(
        inputs2,
        C.cells_pi_values(
            cells.root_hash, cells.split,
            cells.individual_cnt, cells.multiplier_cnt,
        ),
    )
    sl.assign(inputs2, bad)
    sr_.assign(inputs2, C.rows_pi_values(rp))
    with pytest.raises((ValueError, AssertionError)):
        w2 = data.generate_witness(inputs2)
        data.check_witness(w2, C.rows_pi_values(root_pl))

    # merged block leaf: is_merge = 1 switches to the merged final digest
    merged = D.compute_final_digest(
        True, root_pl.individual_vd, root_pl.multiplier_vd,
        root_pl.multiplier_cnt,
    )
    assert merged != root_pl.individual_vd
    block_db = new_block_tree()
    bp = BlockPayload(
        index_id=99, block_number=1234, rows_hash=root_pl.hash,
        rows_digest=merged,
    )
    block_db.in_transaction(lambda t: t.store(1234, bp))
    blk = block_db.payload(1234)

    b2 = CircuitBuilder(test_config())
    sr2 = _StubChild(b2)
    assign2 = C._build_block_leaf(b2, [], [sr2])
    inputs3 = {}
    assign2(inputs3, 99, 1234, True)
    sr2.assign(inputs3, C.rows_pi_values(root_pl))
    _run(b2, inputs3, C.block_pi_values(blk))
