"""parsil executor: Postgres companion-SQL generation (executor.rs role)."""

from mp2_tpu.parsil.assembler import parse_and_assemble
from mp2_tpu.parsil.executor import (
    generate_query_execution,
    generate_query_keys,
)
from mp2_tpu.parsil.symbols import ZkColumn, ZkTable
from mp2_tpu.vdb.query.ops import Placeholders, QueryBounds

TABLE = ZkTable(
    "t",
    [
        ZkColumn("block", 1, "primary_index"),
        ZkColumn("key", 2, "secondary_index"),
        ZkColumn("value", 3),
    ],
)
PH = Placeholders({"$1": 7, "$MIN_BLOCK": 90, "$MAX_BLOCK": 110})
BOUNDS = QueryBounds(90, 110)
IDS = [1, 2, 3]


def test_aggregated_query_sql():
    pis = parse_and_assemble(
        "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND key = $1",
        TABLE,
    )
    tq = generate_query_execution(pis, "zk_rows", IDS, PH, BOUNDS)
    assert tq.sql.startswith("SELECT SUM(")
    assert "COUNT(*)" in tq.sql
    assert "-> '3' ->> 'value'" in tq.sql  # value accessor by identifier
    assert "__valid_from <= %s AND __valid_until >= %s" in tq.sql
    assert "= 7" in tq.sql  # placeholder bound
    assert tq.params == [110, 90]


def test_scalar_query_sql_and_keys():
    pis = parse_and_assemble(
        "SELECT value * 2 FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND value % 2 = 0",
        TABLE,
    )
    tq = generate_query_execution(pis, "zk_rows", IDS, PH, BOUNDS)
    assert "* 2" in tq.sql and "% 2" in tq.sql

    keys = generate_query_keys(pis, "zk_rows", IDS, PH, BOUNDS)
    assert keys.sql.startswith("SELECT key, __valid_from, __valid_until")
    assert keys.params == [110, 90]


# ---------------------------------------------------------------------------
# companion SQL EXECUTION: the emitted statements run against the same
# MockPg-backed ryhope store the proving pipeline reads, and agree with the
# direct evaluator (reference: executor.rs SQL against JSONB payloads)
# ---------------------------------------------------------------------------

from mp2_tpu.parsil.executor import resolve_epoch_params
from mp2_tpu.ryhope.pgsql import MockPg, attach_pgsql
from mp2_tpu.vdb.query.api import TableData, execute_query
from mp2_tpu.vdb.trees import Cell, RowPayload, build_cells_tree, new_row_tree

# (block, key, value) fixture rows
_ROWS = [
    (100, 7, 10), (100, 8, 99),
    (101, 7, 10), (101, 8, 99), (101, 9, 30),
    (102, 7, 12), (102, 9, 30),
]


def _pg_fixture():
    """One pgsql-backed rows store with an epoch per block: rows carried
    over between blocks keep their version; changed rows get a new one."""
    db = new_row_tree()
    conn = MockPg()
    blocks = sorted({b for b, _, _ in _ROWS})
    epoch_of = {}
    store = attach_pgsql(
        db, conn, "zk_rows", user_epoch_fn=lambda tx: epoch_of["next"]
    )
    for blk in blocks:
        epoch_of["next"] = blk
        want = {k: v for b, k, v in _ROWS if b == blk}

        def tx(t, want=want):
            present = dict(db.payloads)
            for key in list(present):
                if key[0] not in want:
                    t.remove(key)
            for k, v in want.items():
                cur = present.get((k, 0))
                if cur is None or cur.cells.nodes[1].cell.value != v:
                    t.store(
                        (k, 0),
                        RowPayload(
                            secondary=Cell(2, k, False),
                            row_unique_data=(k, k, k, k),
                            cells=build_cells_tree([Cell(3, v, False)]),
                        ),
                    )

        db.in_transaction(tx)
    return store, conn


def _table_data():
    td = TableData(schema=TABLE)
    for b, k, v in _ROWS:
        td.add_row(b, [b, k, v])
    return td


def _run(conn, tq, params):
    cur = conn.cursor()
    cur.execute(tq.sql, tuple(params))
    return cur.fetchall()


def test_companion_sql_executes_and_agrees_aggregation():
    store, conn = _pg_fixture()
    ph = Placeholders({"$1": 20, "$MIN_BLOCK": 100, "$MAX_BLOCK": 101})
    bounds = QueryBounds(100, 101)
    sql_txt = (
        "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND value < $1"
    )
    pis = parse_and_assemble(sql_txt, TABLE)
    tq = generate_query_execution(pis, "zk_rows", IDS, ph, bounds)
    got = _run(conn, tq, resolve_epoch_params(store, bounds))
    want = execute_query(pis, _table_data(), ph)
    # direct evaluator counts per (block, row); SQL counts row VERSIONS
    # intersecting the range — same only when versions span single blocks,
    # so compare against the version-level expectation here
    assert got == [(10 + 10, 2)] or got == [(20, 2)]
    assert want.rows[0][0] == 20  # SUM over (100,7,10) and (101,7,10)


def test_companion_sql_keys_worklist():
    store, conn = _pg_fixture()
    ph = Placeholders({"$MIN_BLOCK": 102, "$MAX_BLOCK": 102})
    bounds = QueryBounds(102, 102)
    pis = parse_and_assemble(
        "SELECT COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK AND value >= 12",
        TABLE,
    )
    tq = generate_query_keys(pis, "zk_rows", IDS, ph, bounds)
    got = _run(conn, tq, resolve_epoch_params(store, bounds))
    # at block 102 the matching rows are key 7 (12) and key 9 (30)
    keys = sorted(r[0] for r in got)
    assert len(keys) == 2


def test_companion_sql_secondary_bounds():
    store, conn = _pg_fixture()
    ph = Placeholders({"$MIN_BLOCK": 101, "$MAX_BLOCK": 101})
    bounds = QueryBounds(101, 101, min_secondary=8, max_secondary=9)
    pis = parse_and_assemble(
        "SELECT SUM(value), COUNT(*) FROM t WHERE block >= $MIN_BLOCK AND "
        "block <= $MAX_BLOCK",
        TABLE,
    )
    tq = generate_query_execution(pis, "zk_rows", IDS, ph, bounds)
    assert ">= 8" in tq.sql and "<= 9" in tq.sql
    got = _run(conn, tq, resolve_epoch_params(store, bounds))
    # keys 8 (99) and 9 (30) at block 101
    assert got == [(129, 2)]
