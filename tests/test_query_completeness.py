"""Tree-bound query stack: rows path-verified into the committed rows/index
trees with the consecutive-rows completeness argument (reference:
verifiable-db/src/query/{row_chunk_processing.rs, chunk_aggregation.rs,
row_chunk_gadgets/consecutive_rows.rs})."""

import os

import pytest

from mp2_tpu.circuit.builder import CircuitBuilder
from mp2_tpu.field.ecgfp5 import NEUTRAL
from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.prover.config import test_config
from mp2_tpu.vdb import digests as D
from mp2_tpu.vdb.query.chunks import (
    RowBinding,
    build_tree_bound_row,
    make_row_binding,
)
from mp2_tpu.vdb.query.ops import Placeholders, QueryBounds
from mp2_tpu.vdb.query.universal import (
    UniversalQueryCircuit,
    UniversalQueryParams,
)
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

BLOCK_ID, KEY_ID, VALUE_ID = 1, 2, 3
COLUMN_IDS = [BLOCK_ID, KEY_ID, VALUE_ID]
TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", BLOCK_ID, "primary_index"),
        ZkColumn("key", KEY_ID, "secondary_index"),
        ZkColumn("value", VALUE_ID),
    ],
)
PARAMS = UniversalQueryParams(
    num_columns=3, num_placeholders=4, num_predicate_ops=4,
    num_result_ops=2, num_outputs=2,
)
SQL = (
    "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK "
    "AND block <= $MAX_BLOCK"
)


def make_db(blocks):
    """blocks: {block_number: {key: value}} -> (rows_db, block_db,
    epoch_of_block)."""
    rows_db = new_row_tree()
    block_db = new_block_tree()
    epoch_of = {}
    for blk in sorted(blocks):
        entries = blocks[blk]

        def tx(t, entries=entries):
            for k, v in entries.items():
                cells = build_cells_tree([Cell(VALUE_ID, v, False)])
                t.store(
                    (k, 0),
                    RowPayload(
                        secondary=Cell(KEY_ID, k, False),
                        row_unique_data=(k, k, k, k),
                        cells=cells,
                    ),
                )
            for key in list(rows_db.payloads):
                if key[0] not in entries:
                    t.remove(key)

        rows_db.in_transaction(tx)
        epoch_of[blk] = rows_db.epoch
        root_pl = rows_db.payload(rows_db.root())
        digest = D.compute_final_digest(
            False, root_pl.individual_vd, root_pl.multiplier_vd,
            root_pl.multiplier_cnt,
        )
        block_db.in_transaction(
            lambda t, blk=blk, h=root_pl.hash, d=digest: t.store(
                blk,
                BlockPayload(
                    index_id=BLOCK_ID, block_number=blk,
                    rows_hash=h, rows_digest=d,
                ),
            )
        )
    return rows_db, block_db, epoch_of


def all_rows_in_order(blocks, rows_db, block_db, epoch_of):
    """(row_values, RowBinding) for every row in every block, index order."""
    out = []
    for blk in sorted(blocks):
        view = rows_db.view_at(epoch_of[blk])
        for k in sorted(blocks[blk]):
            out.append(
                (
                    [blk, k, blocks[blk][k]],
                    make_row_binding(view, (k, 0), block_db, blk),
                )
            )
    return out


BLOCKS = {100: {7: 10, 8: 99}, 101: {7: 10, 9: 30}}


def test_bound_row_circuit_matches_host():
    """The row member recomputes cells root + both tree paths; its PIs are
    the universal-circuit PIs + index root + boundary info."""
    rows_db, block_db, epoch_of = make_db(BLOCKS)
    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    b = CircuitBuilder(test_config())
    assign = build_tree_bound_row(b, PARAMS, 4, 4)
    data = b.build()
    host = UniversalQueryCircuit(params=PARAMS, data=None, assign=None)

    from mp2_tpu.utils.u256 import u256_to_fields

    for row, binding in all_rows_in_order(BLOCKS, rows_db, block_db, epoch_of):
        inputs = {}
        assign(inputs, pis, COLUMN_IDS, row, ph, bounds, binding)
        expected = (
            list(host.expected_public_inputs(pis, COLUMN_IDS, row, ph, bounds))
            + [int(v) for v in binding.index_w["root"]]
            + binding.boundary_fields()
            + u256_to_fields(row[0])
            + u256_to_fields(row[1])
        )
        w = data.generate_witness(inputs)
        data.check_witness(w, expected)


def test_bound_row_circuit_rejects_forged_value():
    """Claiming a different column value than the committed row breaks the
    cells-root binding."""
    rows_db, block_db, epoch_of = make_db(BLOCKS)
    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    b = CircuitBuilder(test_config())
    assign = build_tree_bound_row(b, PARAMS, 4, 4)
    data = b.build()
    host = UniversalQueryCircuit(params=PARAMS, data=None, assign=None)

    from mp2_tpu.utils.u256 import u256_to_fields

    (row, binding) = all_rows_in_order(BLOCKS, rows_db, block_db, epoch_of)[0]
    forged = [row[0], row[1], row[2] + 5]
    inputs = {}
    assign(inputs, pis, COLUMN_IDS, forged, ph, bounds, binding)
    expected = (
        list(host.expected_public_inputs(pis, COLUMN_IDS, forged, ph, bounds))
        + [int(v) for v in binding.index_w["root"]]
        + binding.boundary_fields()
        + u256_to_fields(forged[0])
        + u256_to_fields(forged[1])
    )
    w = data.generate_witness(inputs)
    with pytest.raises(AssertionError):
        data.check_witness(w, expected)


class _Stub:
    def __init__(self, b, n):
        self.ts = b.add_inputs(n)

    def public_inputs(self):
        return list(self.ts)

    def assign(self, inputs, vals):
        for t, v in zip(self.ts, vals):
            inputs[t] = int(v)


def _fixture(sql=SQL):
    from mp2_tpu.vdb.query.chunks import _pi_width

    rows_db, block_db, epoch_of = make_db(BLOCKS)
    pis = parse_and_assemble(sql, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)
    pairs = all_rows_in_order(BLOCKS, rows_db, block_db, epoch_of)
    W = _pi_width(PARAMS, True)
    host = UniversalQueryCircuit(params=PARAMS, data=None, assign=None)

    def row_piv(row, bi):
        from mp2_tpu.utils.u256 import u256_to_fields

        vals = list(
            host.expected_public_inputs(pis, COLUMN_IDS, row, ph, bounds)
        )
        vals += [int(v) for v in bi.index_w["root"]] + bi.boundary_fields()
        vals += u256_to_fields(row[0]) + u256_to_fields(row[1])
        return vals + [0] * (W - len(vals))

    return pis, ph, bounds, pairs, W, row_piv


QB4 = (100, 101, 0, (1 << 256) - 1)


def _chunk_piv(row_pivs, W):
    """Host mirror of the chunk aggregation for the SUM/COUNT query."""
    from mp2_tpu.utils.u256 import u256_to_fields
    from mp2_tpu.vdb.query.chunks import BOUNDARY_ROW_LEN, _row_base_width

    base = _row_base_width(PARAMS)
    comp_ph = list(row_pivs[0][0:8])
    aggs = list(row_pivs[0][14:16])
    s = sum(
        int.from_bytes(
            b"".join(int(x).to_bytes(4, "big") for x in pv[16:24]), "big"
        )
        for pv in row_pivs
        if pv[12]
    )
    count = sum(pv[12] for pv in row_pivs)
    vals = (
        comp_ph + aggs + u256_to_fields(s) + [0] * 7 + [count] + [count]
        + list(row_pivs[0][base : base + 4])
        + [f for v in QB4 for f in u256_to_fields(v)]
        + list(row_pivs[0][base + 4 : base + 4 + BOUNDARY_ROW_LEN])
        + list(row_pivs[-1][base + 4 : base + 4 + BOUNDARY_ROW_LEN])
    )
    return vals + [0] * (W - len(vals))


def test_chunk_pair_body():
    """Chunk body over two verified rows: aggregation + consecutiveness,
    via stub children (fast path for the recursion member's logic)."""
    from mp2_tpu.vdb.query.chunks import build_chunk_from_rows

    pis, ph, bounds, pairs, W, row_piv = _fixture()
    b = CircuitBuilder(test_config())
    s1, s2 = _Stub(b, W), _Stub(b, W)
    assign = build_chunk_from_rows(b, PARAMS, W, True, [s1, s2])
    data = b.build()

    for k in (0, 2):
        (r1, b1), (r2, b2) = pairs[k], pairs[k + 1]
        inputs = {}
        pv1, pv2 = row_piv(r1, b1), row_piv(r2, b2)
        s1.assign(inputs, pv1)
        s2.assign(inputs, pv2)
        assign(inputs, QB4)
        w = data.generate_witness(inputs)
        data.check_witness(w, _chunk_piv([pv1, pv2], W))

    # NON-consecutive rows (skipping one) must be rejected
    (r1, b1), (r2, b2) = pairs[0], pairs[2]
    inputs = {}
    s1.assign(inputs, row_piv(r1, b1))
    s2.assign(inputs, row_piv(r2, b2))
    assign(inputs, QB4)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, _chunk_piv([row_piv(r1, b1), row_piv(r2, b2)], W))


def test_chunk_merge_body():
    """Merge body: boundary consecutiveness across chunks + output fold."""
    from mp2_tpu.vdb.query.chunks import build_chunk_merge

    pis, ph, bounds, pairs, W, row_piv = _fixture()
    pv = [row_piv(r, bi) for r, bi in pairs]
    c1 = _chunk_piv(pv[0:2], W)
    c2 = _chunk_piv(pv[2:4], W)

    b = CircuitBuilder(test_config())
    s1, s2 = _Stub(b, W), _Stub(b, W)
    assign_nd = build_chunk_merge(b, PARAMS, W, True, [s1, s2])
    data = b.build()

    inputs = {}
    s1.assign(inputs, c1)
    s2.assign(inputs, c2)
    assign_nd(inputs)
    merged = _chunk_piv(pv, W)
    w = data.generate_witness(inputs)
    data.check_witness(w, merged)

    # wrong order (right chunk first) -> boundary check fails
    inputs = {}
    s1.assign(inputs, c2)
    s2.assign(inputs, c1)
    assign_nd(inputs)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, merged)


def test_revelation_body():
    """Revelation body: placeholder-hash recomputation, bounds pinning,
    extreme boundaries, IVC root binding."""
    from mp2_tpu.vdb.query.chunks import build_revelation
    from mp2_tpu.utils.u256 import u256_to_fields

    pis, ph, bounds, pairs, W, row_piv = _fixture()
    pv = [row_piv(r, bi) for r, bi in pairs]
    root_chunk = _chunk_piv(pv, W)
    from mp2_tpu.vdb.query.chunks import _chunk_base_width

    base = _chunk_base_width(PARAMS)
    ivc_piv = list(root_chunk[base : base + 4]) + [0] * 5  # block root + pad

    b = CircuitBuilder(test_config())
    sc, si = _Stub(b, W), _Stub(b, len(ivc_piv))
    assign = build_revelation(b, PARAMS, W, True, sc, si)
    data = b.build()

    inputs = {}
    sc.assign(inputs, root_chunk)
    si.assign(inputs, ivc_piv)
    assign(inputs, pis.placeholder_names, ph, bounds)
    count = root_chunk[8 + 2 + 16]
    s = 0
    for l in root_chunk[10:18]:
        s = (s << 32) | int(l)
    reveal = (
        list(root_chunk[0:8]) + list(ivc_piv[0:4])
        + u256_to_fields(s) + [0] * 7 + [count] + [count]
    )
    reveal += [0] * (W - len(reveal))
    w = data.generate_witness(inputs)
    data.check_witness(w, reveal)

    # a chunk claiming a different index root than the IVC's block root
    # must be rejected
    bad_ivc = [x + 1 for x in ivc_piv[0:4]] + [0] * 5
    inputs = {}
    sc.assign(inputs, root_chunk)
    si.assign(inputs, bad_ivc)
    assign(inputs, pis.placeholder_names, ph, bounds)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        bad = list(reveal)
        bad[8:12] = bad_ivc[0:4]
        data.check_witness(w, bad)


@slow
def test_tree_bound_query_stack_end_to_end():
    """Full tree-bound stack: every committed row proven with its Merkle
    paths, chunks enforce consecutiveness, revelation pins placeholder
    hash + bounds + extreme boundaries."""
    from mp2_tpu.vdb.query.chunks import QueryCircuits

    rows_db, block_db, epoch_of = make_db(BLOCKS)
    qc = QueryCircuits(
        test_config(), PARAMS, row_tree_depth=4, index_tree_depth=4
    )
    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    pairs = all_rows_in_order(BLOCKS, rows_db, block_db, epoch_of)
    rows = [r for r, _ in pairs]
    bindings = [bi for _, bi in pairs]
    env, reveal_pis = qc.prove_query(
        pis, COLUMN_IDS, rows, ph, bounds, bindings=bindings
    )
    assert qc.verify(env)
    # SUM(value) over all 4 rows = 10+99+10+30 = 149; COUNT = 4
    got_sum = 0
    for l in reveal_pis[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == 149
    got_count = reveal_pis[12 + 16]
    assert got_count == 4

    # --- empty primary range through the SAME circuits: a non-existence
    # chunk replaces the row proofs (query/circuits/non_existence.rs)
    from mp2_tpu.vdb.query.merkle_path import host_neighbor_path_from_tree
    from mp2_tpu.vdb.query.planner import find_node_for_non_existence

    ph_e = Placeholders({"$MIN_BLOCK": 105, "$MAX_BLOCK": 110})
    bounds_e = QueryBounds(105, 110)
    ne = find_node_for_non_existence(block_db, 105, 110)
    index_w = host_neighbor_path_from_tree(block_db, ne.node_key)
    env_e, reveal_e = qc.prove_query(
        pis, COLUMN_IDS, [], ph_e, bounds_e,
        non_existence_witness=(BLOCK_ID, index_w),
    )
    assert qc.verify(env_e)
    assert reveal_e[12 + 16] == 0  # COUNT == 0
    got_sum = 0
    for l in reveal_e[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == 0  # SUM identity

    # --- RESTRICTED secondary range through the SAME circuits: every
    # committed row is still proven (secondary gating is soft,
    # universal_query_gadget.rs:1336-1342) but only keys 8..9 match
    bounds_s = QueryBounds(100, 101, min_secondary=8, max_secondary=9)
    env_s, reveal_s = qc.prove_query(
        pis, COLUMN_IDS, rows, ph, bounds_s, bindings=bindings
    )
    assert qc.verify(env_s)
    got_sum = 0
    for l in reveal_s[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == 99 + 30 and reveal_s[12 + 16] == 2

    # --- EMPTY secondary range: same rows proven, nothing matches
    bounds_0 = QueryBounds(100, 101, min_secondary=50, max_secondary=60)
    env_0, reveal_0 = qc.prove_query(
        pis, COLUMN_IDS, rows, ph, bounds_0, bindings=bindings
    )
    assert qc.verify(env_0)
    assert reveal_0[12 + 16] == 0  # COUNT == 0 over a non-empty block range


def test_non_existence_body():
    """Non-existence chunk: an out-of-range bracketing index node with
    straddling neighbors proves the primary range empty (count 0)."""
    from mp2_tpu.utils.u256 import U256_MAX, u256_to_fields
    from mp2_tpu.vdb.query.chunks import (
        _pi_width,
        build_non_existence,
        non_existence_boundary_fields,
    )
    from mp2_tpu.vdb.query.merkle_path import host_neighbor_path_from_tree
    from mp2_tpu.vdb.query.ops import AggregationOperation
    from mp2_tpu.vdb.query.planner import find_node_for_non_existence

    _, block_db, _ = make_db({100: {7: 1}, 101: {7: 2}, 102: {7: 3}})
    # query [105, 110] is empty; bracketing node = 102 (largest below)
    ne = find_node_for_non_existence(block_db, 105, 110)
    assert ne is not None and ne.node_key == 102
    index_w = host_neighbor_path_from_tree(block_db, ne.node_key)

    W = _pi_width(PARAMS, True)
    b = CircuitBuilder(test_config())
    assign = build_non_existence(b, PARAMS, W, index_tree_depth=4)
    data = b.build()

    comp, ph = [1, 2, 3, 4], [5, 6, 7, 8]
    aggs = [int(AggregationOperation.SUM), int(AggregationOperation.MIN)]
    qb4 = (105, 110, 0, U256_MAX)
    inputs = {}
    assign(inputs, comp, ph, aggs, qb4, BLOCK_ID, index_w)
    piv = (
        comp + ph + aggs
        + u256_to_fields(0) + u256_to_fields(U256_MAX) + [0]
        + [int(v) for v in index_w["root"]]
        + [f for v in qb4 for f in u256_to_fields(v)]
        + non_existence_boundary_fields(index_w)
        + non_existence_boundary_fields(index_w)
    )
    piv += [0] * (W - len(piv))
    w = data.generate_witness(inputs)
    data.check_witness(w, piv)

    # a NON-empty range must be rejected: node 102 inside [102, 110]
    qb4_bad = (102, 110, 0, U256_MAX)
    inputs = {}
    assign(inputs, comp, ph, aggs, qb4_bad, BLOCK_ID, index_w)
    bad = list(piv)
    off = 8 + 2 + 16 + 1 + 4
    bad[off : off + 32] = [f for v in qb4_bad for f in u256_to_fields(v)]
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, bad)


# ------------------------------------------------------- tabular revelation

TAB_SQL = (
    "SELECT DISTINCT value, key FROM t WHERE block >= $MIN_BLOCK "
    "AND block <= $MAX_BLOCK LIMIT 3"
)


def _tabular_setup():
    from mp2_tpu.vdb.query.chunks import build_revelation_tabular

    pis, ph, bounds, pairs, W, row_piv = _fixture(TAB_SQL)
    b = CircuitBuilder(test_config())
    stubs = [_Stub(b, W) for _ in range(3)]
    sivc = _Stub(b, 9)
    assign = build_revelation_tabular(b, PARAMS, W, stubs, sivc)
    data = b.build()
    return pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data


def _reveal_tab_piv(pvs, n, W, block_root, limit=3, offset=0, distinct=1):
    vals = (
        list(pvs[0][0:8]) + list(block_root)
        + [n, limit, offset, distinct]
    )
    for pv in pvs:
        vals += list(pv[16:32])
    return vals + [0] * (W - len(vals))


def test_revelation_tabular_body():
    """Tabular revelation: per-row membership + bounds + DISTINCT ordering
    + LIMIT, results exposed (revelation_unproven_offset.rs)."""
    from mp2_tpu.vdb.query.chunks import _row_base_width

    pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data = (
        _tabular_setup()
    )
    base = _row_base_width(PARAMS)
    # revealed rows in ascending (value, key) order: (10,7) (30,9) (99,8)
    sel = [pairs[0], pairs[3], pairs[1]]
    pvs = [row_piv(r, bi) for r, bi in sel]
    assert all(pv[12] == 1 for pv in pvs)
    root = list(pvs[0][base : base + 4])
    ivc_piv = root + [0] * 5

    inputs = {}
    for s, pv in zip(stubs, pvs):
        s.assign(inputs, pv)
    sivc.assign(inputs, ivc_piv)
    assign(inputs, pis.placeholder_names, ph, bounds, True, 3, 0)
    w = data.generate_witness(inputs)
    data.check_witness(w, _reveal_tab_piv(pvs, 3, W, root))


def test_revelation_tabular_rejects_unordered_distinct():
    """DISTINCT results out of ascending order must be rejected."""
    from mp2_tpu.vdb.query.chunks import _row_base_width

    pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data = (
        _tabular_setup()
    )
    base = _row_base_width(PARAMS)
    sel = [pairs[1], pairs[0], pairs[3]]  # (99,8) before (10,7): unordered
    pvs = [row_piv(r, bi) for r, bi in sel]
    root = list(pvs[0][base : base + 4])
    inputs = {}
    for s, pv in zip(stubs, pvs):
        s.assign(inputs, pv)
    sivc.assign(inputs, root + [0] * 5)
    assign(inputs, pis.placeholder_names, ph, bounds, True, 3, 0)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, _reveal_tab_piv(pvs, 3, W, root))


def test_revelation_tabular_rejects_out_of_bounds_primary():
    """A matching row whose primary index lies outside the recomputed
    query bounds must be rejected."""
    from mp2_tpu.utils.u256 import u256_to_fields
    from mp2_tpu.vdb.query.chunks import BOUNDARY_ROW_LEN, _row_base_width

    pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data = (
        _tabular_setup()
    )
    base = _row_base_width(PARAMS)
    sel = [pairs[0], pairs[3], pairs[1]]
    pvs = [row_piv(r, bi) for r, bi in sel]
    root = list(pvs[0][base : base + 4])
    # tamper the second row's exposed primary-index value to 999
    off = base + 4 + BOUNDARY_ROW_LEN
    pvs[1] = list(pvs[1])
    pvs[1][off : off + 8] = u256_to_fields(999)
    inputs = {}
    for s, pv in zip(stubs, pvs):
        s.assign(inputs, pv)
    sivc.assign(inputs, root + [0] * 5)
    assign(inputs, pis.placeholder_names, ph, bounds, True, 3, 0)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, _reveal_tab_piv(pvs, 3, W, root))


def test_revelation_tabular_rejects_matching_after_dummy():
    """Monotone flag chain: a matching row after a non-matching slot is
    rejected (required for DISTINCT soundness)."""
    from mp2_tpu.vdb.query.chunks import _row_base_width

    pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data = (
        _tabular_setup()
    )
    base = _row_base_width(PARAMS)
    pvs = [row_piv(r, bi) for r, bi in [pairs[0], pairs[3], pairs[1]]]
    root = list(pvs[0][base : base + 4])
    dummy = list(pvs[0][0:8]) + [0] * (W - 8)
    seq = [pvs[0], dummy, pvs[1]]  # dummy in the middle
    inputs = {}
    for s, pv in zip(stubs, seq):
        s.assign(inputs, pv)
    sivc.assign(inputs, root + [0] * 5)
    assign(inputs, pis.placeholder_names, ph, bounds, True, 3, 0)
    with pytest.raises((ValueError, AssertionError)):
        w = data.generate_witness(inputs)
        data.check_witness(w, _reveal_tab_piv(seq, 2, W, root))


def test_revelation_tabular_with_dummy_padding():
    """Fewer results than slots: trailing dummy (pred=0) slots accepted,
    num_results counts only the real ones."""
    from mp2_tpu.vdb.query.chunks import _row_base_width

    pis, ph, bounds, pairs, W, row_piv, stubs, sivc, assign, data = (
        _tabular_setup()
    )
    base = _row_base_width(PARAMS)
    pvs = [row_piv(r, bi) for r, bi in [pairs[0], pairs[3]]]
    root = list(pvs[0][base : base + 4])
    dummy = list(pvs[0][0:8]) + [0] * (W - 8)
    seq = pvs + [dummy]
    inputs = {}
    for s, pv in zip(stubs, seq):
        s.assign(inputs, pv)
    sivc.assign(inputs, root + [0] * 5)
    assign(inputs, pis.placeholder_names, ph, bounds, True, 3, 0)
    w = data.generate_witness(inputs)
    data.check_witness(w, _reveal_tab_piv(seq, 2, W, root))


@slow
def test_tabular_query_stack_end_to_end():
    """Tabular SELECT through the unproven-offset revelation: each revealed
    row proven individually over the committed trees, DISTINCT ordering
    enforced, dummy padding for unused slots."""
    from mp2_tpu.vdb.query.chunks import QueryCircuits

    rows_db, block_db, epoch_of = make_db(BLOCKS)
    qc = QueryCircuits(
        test_config(), PARAMS, row_tree_depth=4, index_tree_depth=4,
        tabular_rows=3,
    )
    pis = parse_and_assemble(TAB_SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    pairs = all_rows_in_order(BLOCKS, rows_db, block_db, epoch_of)
    # DISTINCT (value, key) ascending: (10,7) (30,9) (99,8)
    sel = [pairs[0], pairs[3], pairs[1]]
    env, reveal = qc.prove_query_tabular(
        pis, COLUMN_IDS, [r for r, _ in sel], ph, bounds,
        bindings=[bi for _, bi in sel],
    )
    assert qc.verify(env)
    assert reveal[12] == 3  # num_results
    assert reveal[15] == 1  # distinct flag

    def u256_of(limbs):
        v = 0
        for l in limbs:
            v = (v << 32) | int(l)
        return v

    got = [
        (u256_of(reveal[16 + 16 * i : 24 + 16 * i]),
         u256_of(reveal[24 + 16 * i : 32 + 16 * i]))
        for i in range(3)
    ]
    assert got == [(10, 7), (30, 9), (99, 8)]

    # fewer results than slots: dummy padding
    env2, reveal2 = qc.prove_query_tabular(
        pis, COLUMN_IDS, [sel[0][0]], ph, bounds, bindings=[sel[0][1]],
    )
    assert qc.verify(env2)
    assert reveal2[12] == 1

    # an unordered revealed set must not prove under DISTINCT
    bad = [pairs[1], pairs[0]]
    with pytest.raises((ValueError, AssertionError)):
        qc.prove_query_tabular(
            pis, COLUMN_IDS, [r for r, _ in bad], ph, bounds,
            bindings=[bi for _, bi in bad],
        )


@slow
def test_sixty_four_row_batched_chunks():
    """BASELINE-shape batching (VERDICT r2 item 4 'done' criterion): a
    64-row table proven with ceil(64/NUM_ROWS) row-chunk proofs (NUM_ROWS
    rows per LEAF circuit, row_chunk_processing.rs) and fan-in-4 chunk
    aggregation (chunk_aggregation.rs NUM_CHUNKS) — far fewer proofs than
    one per row."""
    from mp2_tpu.vdb.query.chunks import QueryCircuits

    blocks = {
        100 + b: {k: (b + 1) * 100 + k for k in range(1, 17)}
        for b in range(4)
    }  # 4 blocks x 16 rows = 64 rows
    rows_db, block_db, epoch_of = make_db(blocks)
    qc = QueryCircuits(
        test_config(), PARAMS, row_tree_depth=12, index_tree_depth=4,
        num_rows_per_chunk=4, chunk_fanin=4,
    )
    pis = parse_and_assemble(SQL, TABLE)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 103})
    bounds = QueryBounds(100, 103)

    pairs = all_rows_in_order(blocks, rows_db, block_db, epoch_of)
    assert len(pairs) == 64
    rows = [r for r, _ in pairs]
    bindings = [bi for _, bi in pairs]

    leaf_calls = []
    orig_leaf = qc.chunk.prove_leaf

    def counting_leaf(name, *a, **kw):
        leaf_calls.append(name)
        return orig_leaf(name, *a, **kw)

    qc.chunk.prove_leaf = counting_leaf
    env, reveal_pis = qc.prove_query(
        pis, COLUMN_IDS, rows, ph, bounds, bindings=bindings
    )
    assert qc.verify(env)
    assert leaf_calls.count("row_chunk") == 16  # ceil(64/4), not 64
    want_sum = sum(v for entries in blocks.values() for v in entries.values())
    got_sum = 0
    for l in reveal_pis[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == want_sum
    assert reveal_pis[12 + 16] == 64


@slow
def test_reference_scale_query_bounds():
    """VERDICT r3 item 7: instantiate the REFERENCE-SCALE circuit bounds
    once (mp2-v1/tests/common/cases/query/mod.rs:39-48): 20 columns, 20
    predicate ops, 20 result ops, rows-tree depth 10, index-tree depth 15
    — and prove a query end-to-end over the tree-bound stack."""
    from mp2_tpu.vdb.query.chunks import QueryCircuits

    ncols = 20
    ids = list(range(1, ncols + 1))
    cols = [ZkColumn("block", ids[0], "primary_index"),
            ZkColumn("key", ids[1], "secondary_index")]
    cols += [ZkColumn(f"c{j}", ids[j], None) for j in range(2, ncols)]
    table20 = ZkTable("t", cols)
    params20 = UniversalQueryParams(
        num_columns=ncols, num_placeholders=4, num_predicate_ops=20,
        num_result_ops=20, num_outputs=2,
    )
    blocks = {100: {7: 10, 8: 99}, 101: {7: 10}}

    # build trees with 18 non-indexed cells per row (c2..c19); c2 = value
    rows_db = new_row_tree()
    block_db = new_block_tree()
    epoch_of = {}
    for blk in sorted(blocks):
        entries = blocks[blk]

        def tx(t, entries=entries):
            for k, v in entries.items():
                cells = build_cells_tree(
                    [Cell(ids[2], v, False)]
                    + [Cell(ids[j], 1000 * j + k, False)
                       for j in range(3, ncols)]
                )
                t.store(
                    (k, 0),
                    RowPayload(
                        secondary=Cell(ids[1], k, False),
                        row_unique_data=(k, k, k, k),
                        cells=cells,
                    ),
                )
            for key in list(rows_db.payloads):
                if key[0] not in entries:
                    t.remove(key)

        rows_db.in_transaction(tx)
        epoch_of[blk] = rows_db.epoch
        root_pl = rows_db.payload(rows_db.root())
        digest = D.compute_final_digest(
            False, root_pl.individual_vd, root_pl.multiplier_vd,
            root_pl.multiplier_cnt,
        )
        block_db.in_transaction(
            lambda t, blk=blk, h=root_pl.hash, d=digest: t.store(
                blk,
                BlockPayload(
                    index_id=ids[0], block_number=blk,
                    rows_hash=h, rows_digest=d,
                ),
            )
        )

    qc = QueryCircuits(
        test_config(), params20, row_tree_depth=10, index_tree_depth=15,
        num_rows_per_chunk=2, chunk_fanin=2,
    )
    sql = (
        "SELECT SUM(c2), COUNT(*) FROM t WHERE block >= $MIN_BLOCK "
        "AND block <= $MAX_BLOCK AND key >= 7"
    )
    pis = parse_and_assemble(sql, table20)
    ph = Placeholders({"$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)

    rows, bindings = [], []
    for blk in sorted(blocks):
        view = rows_db.view_at(epoch_of[blk])
        for k in sorted(blocks[blk]):
            row = [blk, k, blocks[blk][k]] + [
                1000 * j + k for j in range(3, ncols)
            ]
            rows.append(row)
            bindings.append(make_row_binding(view, (k, 0), block_db, blk))

    env, reveal_pis = qc.prove_query(
        pis, ids, rows, ph, bounds, bindings=bindings
    )
    assert qc.verify(env)
    got_sum = 0
    for l in reveal_pis[12:20]:
        got_sum = (got_sum << 32) | l
    assert got_sum == 10 + 99 + 10
    assert reveal_pis[12 + 16] == 3
