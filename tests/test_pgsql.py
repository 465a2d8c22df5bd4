"""ryhope Postgres backend: COW row-versioned SQL storage, epoch mapper,
wide-lineage push-down, rollback — against the MockPg connection that
executes the exact emitted statement shapes (storage/pgsql role)."""

import pytest

from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql, load_view
from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree


def _payload(i):
    return RowPayload(
        secondary=Cell(5, 10 * i, False),
        row_unique_data=(i, i, i, i),
        cells=build_cells_tree([Cell(7, 100 + i, False)]),
    )


@pytest.fixture()
def db_and_store():
    db = new_row_tree()
    conn = MockPg()
    store = attach_pgsql(db, conn, "rows_tree")
    db.in_transaction(lambda t: [t.store((10, 0), _payload(1)),
                                 t.store((20, 0), _payload(2))])
    db.in_transaction(lambda t: t.store((30, 0), _payload(3)))
    db.in_transaction(lambda t: t.remove((20, 0)))
    return db, store, conn


def test_sql_state_matches_memory_at_every_epoch(db_and_store):
    db, store, conn = db_and_store
    for e in range(db.epoch + 1):
        mem = db.view_at(e)
        sql = load_view(store, e)
        assert set(sql.payloads) == set(mem.payloads)
        for k in mem.payloads:
            assert sql.payloads[k].hash == mem.payloads[k].hash
        assert sql.root() == mem.root()


def test_epoch_mapper_and_latest(db_and_store):
    db, store, conn = db_and_store
    assert store.latest_epoch() == db.epoch
    assert store.internal_epoch(1) == 1


def test_wide_lineage_sql_pushdown(db_and_store):
    db, store, conn = db_and_store
    keys = list(db.payloads)
    got = store.wide_lineage_between(db.epoch, keys)
    assert set(got) == set(keys)
    for k in keys:
        assert got[k].hash == db.payload(k).hash


def test_rollback(db_and_store):
    db, store, conn = db_and_store
    target = 0
    store.rollback_to(target)
    sql = load_view(store, target)
    mem = db.view_at(target)
    assert set(sql.payloads) == set(mem.payloads)
    assert store.latest_epoch() == target


def test_emitted_sql_is_parameterized(db_and_store):
    db, store, conn = db_and_store
    joined = "\n".join(conn.statements)
    assert "__valid_from" in joined and "__valid_until" in joined
    assert "%s" in joined  # psycopg2 parameter style, no literal injection
    assert "rows_tree_mapper" in joined and "rows_tree_meta" in joined
