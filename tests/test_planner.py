"""Query planner: non-existence bracketing, wide lineage, PI layouts."""

from mp2_tpu.circuit.public_inputs import TREE_NODE_LAYOUT, PublicInputLayout
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.kvdb import MerkleTreeKvDb
from mp2_tpu.vdb.query.planner import find_node_for_non_existence, fetch_row_paths


def _db():
    db = MerkleTreeKvDb(Sbbst(), lambda k, p, c: p)
    db.in_transaction(lambda t: [t.store(k, ("payload", k)) for k in range(100, 106)])
    return db


def test_non_existence_below_and_above():
    db = _db()
    # empty range above all keys -> predecessor = 105
    ne = find_node_for_non_existence(db, 200, 300)
    assert ne is not None and ne.node_key == 105 and ne.is_below
    assert ne.lineage[0] == 105 and ne.lineage[-1] == db.root()
    # empty range below all keys -> successor = 100
    ne2 = find_node_for_non_existence(db, 1, 50)
    assert ne2.node_key == 100 and not ne2.is_below
    # non-empty range -> None
    assert find_node_for_non_existence(db, 101, 104) is None


def test_wide_lineage_and_paths():
    db = _db()
    wl = db.wide_lineage_between(db.epoch, [100, 105])
    assert 100 in wl and 105 in wl and db.root() in wl
    paths = fetch_row_paths(db, [101, 999])
    assert 101 in paths and 999 not in paths
    assert paths[101][-1] == db.root()


def test_pi_layout():
    lay = PublicInputLayout([("a", 2), ("b", 3)])
    pis = lay.build(a=[1, 2], b=[3, 4, 5])
    assert pis == [1, 2, 3, 4, 5]
    assert lay.slice(pis, "b") == [3, 4, 5]
    assert TREE_NODE_LAYOUT.total_len == 41


# ---------------------------------------------------------- SQL push-down


def _pg_block_db(n_rows: int):
    """Block-tree-shaped store: payloads carry the primary index under
    the 'f' map (the BlockPayload JSON layout) without the hashing
    aggregate, so scale tests stay fast."""
    from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql

    db = MerkleTreeKvDb(Sbbst(), lambda k, p, c: p)
    conn = MockPg()
    store = attach_pgsql(db, conn, "blocks")
    db.in_transaction(
        lambda t: [
            t.store(k, {"f": {"block_number": k}})
            for k in range(100, 100 + n_rows)
        ]
    )
    return db, store, conn


def test_non_existence_sql_pushdown_matches_host():
    from mp2_tpu.vdb.query.planner import find_node_for_non_existence_sql

    db, store, conn = _pg_block_db(300)
    view = db.current_view()
    for lo, hi in [(500, 900), (1, 50), (150, 250), (100, 399), (400, 401)]:
        host = find_node_for_non_existence(db, lo, hi)
        sql = find_node_for_non_existence_sql(store, view, lo, hi)
        if host is None:
            assert sql is None
        else:
            assert sql is not None
            assert sql.node_key == host.node_key
            assert sql.is_below == host.is_below
            assert sql.lineage == host.lineage


def test_non_existence_sql_pushdown_scale_no_enumeration():
    """10k-row table: the probes are ORDER BY ... LIMIT 1 statements —
    the host never receives more than one row per probe (VERDICT r3
    item 6 'done' criterion)."""
    from mp2_tpu.vdb.query.planner import find_node_for_non_existence_sql

    db, store, conn = _pg_block_db(10_000)
    view = db.current_view()
    conn.statements.clear()
    ne = find_node_for_non_existence_sql(store, view, 20_000, 30_000)
    assert ne is not None and ne.node_key == 10_099 and ne.is_below
    assert ne.lineage[-1] == db.root()
    probes = [s for s in conn.statements if s.startswith("SELECT")]
    assert 1 <= len(probes) <= 3
    assert all("LIMIT 1" in s for s in probes)
    # empty-range precondition: occupied range -> None via ONE probe
    conn.statements.clear()
    assert find_node_for_non_existence_sql(store, view, 5_000, 11_000) is None
    assert len([s for s in conn.statements if s.startswith("SELECT")]) == 1


def test_wide_lineage_sql_batch_fetch():
    """One ANY() round trip covers every lineage payload (TreeFetcher
    role, planner.rs:39-80)."""
    from mp2_tpu.vdb.query.planner import fetch_wide_lineage

    db, store, conn = _pg_block_db(1_000)
    view = db.current_view()
    conn.statements.clear()
    wl = fetch_wide_lineage(store, view, [100, 550, 1_099, 77])
    assert set(wl.lineages) == {100, 550, 1_099}
    fetches = [s for s in conn.statements if "ANY" in s]
    assert len(fetches) == 1
    for key, lin in wl.lineages.items():
        assert lin[-1] == db.root()
        for node in lin:
            assert wl.payloads[node]["f"]["block_number"] == node


def test_secondary_index_bracketer_sql():
    """Row-tree secondary-index bracketing over the cells accessor."""
    from mp2_tpu.parsil.bracketer import (
        bracket_secondary_index,
        secondary_index_accessor,
    )
    from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql
    from mp2_tpu.vdb.query.planner import find_node_for_non_existence_sql
    from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree

    db = new_row_tree()
    conn = MockPg()
    store = attach_pgsql(db, conn, "rows_tree")

    def payload(i):
        return RowPayload(
            secondary=Cell(5, 10 * i, False),
            row_unique_data=(i, i, i, i),
            cells=build_cells_tree([Cell(7, 100 + i, False)]),
        )

    db.in_transaction(
        lambda t: [t.store((10 * i, 0), payload(i)) for i in (1, 2, 4)]
    )
    view = db.current_view()
    acc = secondary_index_accessor(5)
    ne = find_node_for_non_existence_sql(store, view, 41, 90, accessor=acc)
    assert ne is not None and ne.node_key == (40, 0) and ne.is_below
    assert find_node_for_non_existence_sql(
        store, view, 15, 25, accessor=acc
    ) is None  # secondary value 20 occupies the range
    pre, below, above = bracket_secondary_index("rows_tree", 5, 11, 39)
    assert "ORDER BY" in below and "DESC LIMIT 1" in below
    assert "ASC LIMIT 1" in above
    assert "_mapper" in pre
